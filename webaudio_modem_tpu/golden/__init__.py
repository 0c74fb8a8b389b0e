from webaudio_modem_tpu.golden.fsk_golden import GoldenFSK  # noqa: F401
