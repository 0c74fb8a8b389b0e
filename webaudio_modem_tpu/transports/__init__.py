from webaudio_modem_tpu.transports.xmodem import (  # noqa: F401
    ControlType,
    XModemConfig,
    XModemPacket,
    XModemTransport,
)
