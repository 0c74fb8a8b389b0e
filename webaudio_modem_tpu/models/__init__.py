from webaudio_modem_tpu.models.config import (  # noqa: F401
    DEFAULT_FSK_CONFIG,
    FSKConfig,
    FSKParams,
)
from webaudio_modem_tpu.models.fsk import FSKCore  # noqa: F401
from webaudio_modem_tpu.models.soft_modem import SoftModemCore  # noqa: F401
from webaudio_modem_tpu.models.farm import ModemFarm  # noqa: F401
from webaudio_modem_tpu.models.psk import (  # noqa: F401
    DEFAULT_PSK_CONFIG,
    PSKConfig,
    PSKCore,
)
