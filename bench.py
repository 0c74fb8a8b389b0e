"""Headline benchmark: concurrent 300-baud FSK channels demodulated
faster than realtime on one chip.

BASELINE.md target: >= 4096 concurrent 300-baud channels realtime on a
v5e (the reference's implicit budget is ONE channel per JS audio thread,
src/webaudio/processors/fsk-processor.ts:152-167).  vs_baseline is the
achieved channel count over the 4096-channel target.

Prints exactly one JSON line on stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax

    try:  # persistent compile cache: repeat runs skip remote recompiles
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/wam_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp

    from webaudio_modem_tpu.models.config import FSKConfig, FSKParams
    from webaudio_modem_tpu.ops import fsk_demod, fsk_mod

    B = int(sys.argv[sys.argv.index("--batch") + 1]) \
        if "--batch" in sys.argv else 4096
    chunk_t = 4800          # 0.1 s of 48 kHz audio per step
    timed_chunks = 20       # 2 s of audio timed
    config = FSKConfig(baud_rate=300, mark_frequency=1270,
                       space_frequency=1070)
    params = FSKParams.from_config(config)
    message = b"Hello, World!"

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    # one message signal, tiled across channels ON DEVICE (uploading
    # [B, T] chunks over the wire would dominate setup time) and
    # streamed cyclically
    sig = np.asarray(fsk_mod.modulate(params, message))
    reps = int(np.ceil(chunk_t * 2 / len(sig))) + 1
    loop = np.tile(sig, reps)
    n_chunks_cycle = len(loop) // chunk_t
    tile = jax.jit(lambda v: jnp.tile(v[None, :], (B, 1)))
    chunks = [tile(jnp.asarray(loop[i * chunk_t:(i + 1) * chunk_t]))
              for i in range(n_chunks_cycle)]
    jax.block_until_ready(chunks)

    state = fsk_demod.init_state(params, batch=B)
    step = fsk_demod.make_demod_chunk(params, 0, donate=True)

    # warmup / compile + correctness check
    decoded = bytearray()
    state, out = step(state, chunks[0])
    decoded += bytes(np.asarray(out.bytes_out[0][:int(out.byte_count[0])]))
    state, out = step(state, chunks[1 % n_chunks_cycle])
    decoded += bytes(np.asarray(out.bytes_out[0][:int(out.byte_count[0])]))
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for i in range(timed_chunks):
        state, out = step(state, chunks[(i + 2) % n_chunks_cycle])
    jax.block_until_ready(state)
    wall = time.perf_counter() - t0

    # correctness sanity on the stream
    syncs = int(np.asarray(state.sync_count)[0])
    assert message in bytes(decoded) or syncs > 0, \
        "bench stream failed to decode"

    audio_seconds = timed_chunks * chunk_t / config.sample_rate
    channels_realtime = B * audio_seconds / wall
    print(f"B={B} wall={wall:.3f}s audio={audio_seconds:.1f}s "
          f"throughput={B * timed_chunks * chunk_t / wall / 1e6:.0f} "
          f"Msamples/s syncs(ch0)={syncs}", file=sys.stderr)

    print(json.dumps({
        "metric": "concurrent_300baud_channels_realtime",
        "value": round(channels_realtime, 1),
        "unit": "channels",
        "vs_baseline": round(channels_realtime / 4096.0, 3),
    }))


if __name__ == "__main__":
    main()
