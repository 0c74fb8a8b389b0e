from webaudio_modem_tpu.parallel.sharding import (  # noqa: F401
    channel_sharding,
    make_mesh,
    shard_state,
)
