from webaudio_modem_tpu.ops import filters  # noqa: F401
