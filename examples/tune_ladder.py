"""Sweep the Pallas kernels' VMEM block ladders at a given batch.

The seq and framing kernels trade block size (pipeline amortization)
against VMEM double-buffering headroom; the sweet spot moves with the
batch (docs/PERFORMANCE.md "Measured dead ends").  This sweeps the two
knobs through the REAL pipeline (`demod_chunk` chained in one jit,
slope-timed — same methodology as bench.py) so retuning after a kernel
change is one command:

    python examples/tune_ladder.py --batch 4096
    python examples/tune_ladder.py --batch 4096 --seq 128 192 256 --gpb 48 64 96

Prints ms/chunk per configuration and the best pair as JSON.
"""

from __future__ import annotations

import argparse
import functools
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=4800)
    ap.add_argument("--seq", type=int, nargs="*", default=None,
                    help="seq kernel T_blk candidates (samples)")
    ap.add_argument("--gpb", type=int, nargs="*", default=None,
                    help="framing kernel block-group candidates")
    ap.add_argument("--n-hi", type=int, default=60)
    ap.add_argument("--n-lo", type=int, default=12)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/wam_jax_cache")
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass
    import jax.numpy as jnp

    from webaudio_modem_tpu.models.config import FSKConfig, FSKParams
    from webaudio_modem_tpu.ops import fsk_demod, fsk_mod
    from webaudio_modem_tpu.ops.pallas import fsk_framing, fsk_seq

    B, T = args.batch, args.chunk
    K = 8
    config = FSKConfig(baud_rate=300, mark_frequency=1270,
                       space_frequency=1070)
    params = FSKParams.from_config(config)
    print(f"device={jax.devices()[0]} B={B} T={T}", file=sys.stderr)

    sig = np.asarray(fsk_mod.modulate(params, b"Hello, World!"))
    loop = np.tile(sig, int(np.ceil(T * K / len(sig))) + 1)
    xs = jnp.asarray(np.stack(
        [np.tile(loop[i * T:(i + 1) * T], (B, 1)) for i in range(K)]))
    st0 = fsk_demod.init_state(params, batch=B)
    step0 = fsk_demod.make_demod_chunk(params, 0, donate=False)
    for i in range(3):
        st0, _ = step0(st0, xs[i % K])
    st0 = jax.block_until_ready(st0)

    def fresh():
        return jax.tree.map(jnp.copy, st0)

    def measure():
        # fresh jit per ladder point: the overrides are read at trace
        # time, so each configuration is its own executable
        @functools.partial(jax.jit, static_argnums=2, donate_argnums=0)
        def body(carry, stk, n):
            def f(c, i):
                c2, out = fsk_demod.demod_chunk(params, 0, c, stk[i % K])
                return c2, out.byte_count[0]
            return jax.lax.scan(f, carry, jnp.arange(n))

        walls = {}
        for n in (args.n_lo, args.n_hi):
            best = float("inf")
            body(fresh(), xs, n)
            for _ in range(args.reps):
                c = fresh()
                jax.block_until_ready(c)
                t0 = time.perf_counter()
                out = body(c, xs, n)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            walls[n] = best
        return (walls[args.n_hi] - walls[args.n_lo]) / \
            (args.n_hi - args.n_lo)

    ratio = params.downsample_ratio
    seq_cands = args.seq or ([0] + [96, 128, 160, 192, 224, 256])
    gpb_cands = args.gpb or ([0] + [32, 48, 64, 96, 128])

    results = {}

    def point(t_blk, gpb):
        fsk_seq.T_BLK_OVERRIDE = t_blk
        fsk_framing.BLOCK_GROUPS_OVERRIDE = gpb
        try:
            ms = measure() * 1e3
        except Exception as e:   # e.g. VMEM OOM at too-large blocks
            print(f"seq T_blk={t_blk or 'default':>8}  "
                  f"gpb={gpb or 'default':>7}  FAILED "
                  f"({type(e).__name__}: {str(e)[:90]}...)",
                  file=sys.stderr)
            return
        results[(t_blk, gpb)] = ms
        print(f"seq T_blk={t_blk or 'default':>8}  "
              f"gpb={gpb or 'default':>7}  {ms:7.3f} ms/chunk",
              file=sys.stderr)

    # stage 1: sweep seq T_blk with the default framing ladder
    for t_blk in seq_cands:
        point(t_blk, 0)
    best_seq = min(((v, k[0]) for k, v in results.items()))[1]
    # stage 2: sweep framing blocks at the best seq block
    for gpb in gpb_cands:
        if (best_seq, gpb) not in results:
            point(best_seq, gpb)
    fsk_seq.T_BLK_OVERRIDE = 0
    fsk_framing.BLOCK_GROUPS_OVERRIDE = 0

    import json
    best = min(((v, k) for k, v in results.items()))
    audio_s = T / config.sample_rate
    print(json.dumps({
        "batch": B,
        "best_ms": round(best[0], 4),
        "best_seq_T_blk": best[1][0],
        "best_framing_gpb": best[1][1],
        "channels_realtime": round(B * audio_s / (best[0] / 1e3), 1),
        "all": {f"{k[0]}/{k[1]}": round(v, 4)
                for k, v in results.items()},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
