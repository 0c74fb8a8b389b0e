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
