from webaudio_modem_tpu.runtime.chunked_modulator import (  # noqa: F401
    ChunkedModulator,
    ChunkResult,
)
from webaudio_modem_tpu.runtime.processor import FSKProcessor  # noqa: F401
from webaudio_modem_tpu.runtime.audio_graph import AudioGraph  # noqa: F401
from webaudio_modem_tpu.runtime.data_channel import (  # noqa: F401
    LoopbackDataChannel,
    QueueDataChannel,
)
from webaudio_modem_tpu.runtime.farm_channel import (  # noqa: F401
    FarmDataChannel,
    FarmLoopbackHub,
)
from webaudio_modem_tpu.runtime.device_hub import DeviceFarmHub  # noqa: F401
from webaudio_modem_tpu.runtime.soft_hub import (  # noqa: F401
    BlindSoftFarmHub, SoftFarmHub)
