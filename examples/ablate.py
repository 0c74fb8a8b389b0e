"""Slope-calibrated per-stage ablation of the FSK demod pipeline.

Times each pipeline stage STANDALONE on the current backend with the
same methodology as bench.py (docs/PERFORMANCE.md "Measure through a
tunnel correctly"): N steps chained inside ONE jit via ``lax.scan``
with donated carry, cost = (wall(N_hi) - wall(N_lo)) / (N_hi - N_lo),
which cancels the per-dispatch tunnel RTT exactly.

Stages:
  full     demod_chunk (the bench step)
  seq      _sequential_stage (stage A+B Pallas kernel)
  seq_r    same with the fused R emission (what the pipeline runs)
  sync     _sync_ratios over ext_bits (--sync-impl picks the
           band/mxu/cumsum/conv variant)
  fromr    _sync_ratios_from_r over carried block sums (the fused
           pipeline's stage C)
  framing  stage_d_compact (stage D Pallas kernel incl. compaction)

Each standalone stage consumes its outputs through the scan carry (or
a cheap reduction folded into the carry) so XLA cannot dead-code or
hoist it; the reductions add <10 us and are the same for every
variant.  Usage:

    python examples/ablate.py --batch 2048
    python examples/ablate.py --batch 2048 --stages sync --sync-impl mxu
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=4800)
    ap.add_argument("--stages", nargs="*", default=None,
                    help="subset: full seq sync framing")
    ap.add_argument("--sync-impl", default="band",
                    choices=["band", "mxu", "cumsum", "conv", "dispatch"])
    ap.add_argument("--n-hi", type=int, default=60)
    ap.add_argument("--n-lo", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        try:  # persistent compile cache (TPU remote compiles only)
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/wam_jax_cache")
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass
    import jax.numpy as jnp

    from webaudio_modem_tpu.models.config import FSKConfig, FSKParams
    from webaudio_modem_tpu.ops import fsk_demod, fsk_mod
    from webaudio_modem_tpu.ops.pallas import fsk_framing

    B, T = args.batch, args.chunk
    K = 8                      # distinct preloaded inputs per scan
    config = FSKConfig(baud_rate=300, mark_frequency=1270,
                       space_frequency=1070)
    params = FSKParams.from_config(config)
    ratio = params.downsample_ratio
    n_ds = T // ratio
    W = params.sync_window
    maxb = fsk_demod.max_bytes(params, n_ds)
    print(f"device={jax.devices()[0]} B={B} T={T} n_ds={n_ds} W={W} "
          f"maxb={maxb}", file=sys.stderr)

    sync_fn = {
        "band": fsk_demod._sync_ratios_band,
        "mxu": fsk_demod._sync_ratios_mxu,
        "cumsum": fsk_demod._sync_ratios_cumsum,
        "conv": fsk_demod._sync_ratios_conv,
        "dispatch": fsk_demod._sync_ratios,
    }[args.sync_impl]

    # real modulated audio tiled across channels (values do not affect
    # branchless timing, but keep the pipeline in its decoded regime)
    sig = np.asarray(fsk_mod.modulate(params, b"Hello, World!"))
    loop = np.tile(sig, int(np.ceil(T * K / len(sig))) + 1)
    xs = jnp.asarray(np.stack(
        [np.tile(loop[i * T:(i + 1) * T], (B, 1)) for i in range(K)]))
    state0 = fsk_demod.init_state(params, batch=B)
    # prime a realistic state (post-sync, mid-stream)
    st = state0
    step0 = fsk_demod.make_demod_chunk(params, 0, donate=False)
    for i in range(3):
        st, _ = step0(st, xs[i % K])
    st = jax.block_until_ready(st)
    bits_k, amps_k, ratios_k = [], [], []
    for i in range(K):
        fr, dsc, ia, qa, bits, amps, softs = fsk_demod._sequential_stage(
            params, 0, st, xs[i])
        ext = jnp.concatenate([st.bit_tail, bits], 0)
        bits_k.append(bits)
        amps_k.append(amps)
        ratios_k.append(fsk_demod._sync_ratios(params, ext))
    bits_s = jax.block_until_ready(jnp.stack(bits_k))
    amps_s = jax.block_until_ready(jnp.stack(amps_k))
    ratios_s = jax.block_until_ready(jnp.stack(ratios_k))

    def fresh(tree):
        # donated carries are invalidated per run — hand out copies
        return jax.tree.map(jnp.copy, tree)

    def run_full():
        # big operands ride as ARGUMENTS: closed-over device arrays are
        # inlined as HLO literals, which blows the remote-compile
        # request size limit (HTTP 413) through the axon tunnel
        @functools.partial(jax.jit, static_argnums=2, donate_argnums=0)
        def body(carry, stk, n):
            def f(c, i):
                c2, out = fsk_demod.demod_chunk(params, 0, c, stk[i % K])
                return c2, out.byte_count[0]
            return jax.lax.scan(f, carry, jnp.arange(n))
        return (lambda c, n: body(c, xs, n)), lambda: fresh(st)

    def run_seq():
        @functools.partial(jax.jit, static_argnums=2, donate_argnums=0)
        def body(carry, stk, n):
            def f(c, i):
                (fr, dsc, ia, qa, bits, amps,
                 softs) = fsk_demod._sequential_stage(params, 0, c,
                                                      stk[i % K])
                agc, pre, phi, iq_i, iq_q = fr
                lp, post = dsc
                ext_b = jnp.concatenate([c.bit_tail, bits], 0)
                ext_a = jnp.concatenate([c.amp_tail, amps], 0)
                c2 = c._replace(
                    agc_gain=agc, pre=pre, phi=phi, iq_i=iq_i,
                    iq_q=iq_q, ds_iacc=ia, ds_qacc=qa, last_phase=lp,
                    post=post, bit_tail=ext_b[-W:],
                    amp_tail=ext_a[-params.amp_window:])
                return c2, softs[0, 0]
            return jax.lax.scan(f, carry, jnp.arange(n))
        return (lambda c, n: body(c, xs, n)), lambda: fresh(st)

    def run_sync():
        @functools.partial(jax.jit, static_argnums=2, donate_argnums=0)
        def body(carry, bstk, n):
            def f(c, i):
                tail, acc = c
                ext = jnp.concatenate([tail, bstk[i % K]], 0)
                ratios = sync_fn(params, ext)
                return (ext[-W:], acc + ratios.sum()), ratios[0, 0]
            return jax.lax.scan(f, carry, jnp.arange(n))
        return (lambda c, n: body(c, bits_s, n)), \
            lambda: (fresh(st.bit_tail), jnp.float32(0))

    def run_framing():
        @functools.partial(jax.jit, static_argnums=4, donate_argnums=0)
        def body(carry, bstk, astk, rstk, n):
            def f(c, i):
                ext_amps = jnp.concatenate(
                    [c.amp_tail, astk[i % K]], 0)
                d_carry, (bv, bc, eod, sf, ft) = \
                    fsk_framing.stage_d_compact(
                        params, c, bstk[i % K], astk[i % K],
                        rstk[i % K], ext_amps, maxb)
                (st_i, counter, sil, thr, accum, count, bsc, nxt,
                 byte_cur, pos) = d_carry[:10]
                c2 = c._replace(
                    started=st_i > 0, counter=counter, sil=sil,
                    threshold=thr, accum=accum, count=count, bsc=bsc,
                    next_idx=nxt, byte_cur=byte_cur, pos=pos,
                    amp_tail=ext_amps[-params.amp_window:],
                    bit_fill=jnp.minimum(c.bit_fill + n_ds,
                                         jnp.int32(2 ** 30)))
                return c2, bc.sum()
            return jax.lax.scan(f, carry, jnp.arange(n))
        return (lambda c, n: body(c, bits_s, amps_s, ratios_s, n)), \
            lambda: fresh(st)

    def run_seq_r():
        # the R-emitting kernel variant the fused pipeline actually runs
        @functools.partial(jax.jit, static_argnums=2, donate_argnums=0)
        def body(carry, stk, n):
            def f(c, i):
                (fr, dsc, ia, qa, bits, amps, softs,
                 rsum) = fsk_demod._sequential_stage(
                    params, 0, c, stk[i % K], with_rsum=True)
                agc, pre, phi, iq_i, iq_q = fr
                lp, post = dsc
                c2 = c._replace(
                    agc_gain=agc, pre=pre, phi=phi, iq_i=iq_i,
                    iq_q=iq_q, ds_iacc=ia, ds_qacc=qa, last_phase=lp,
                    post=post, bit_tail=bits[-W:],
                    r_tail=rsum[-(W - params.ds_samples_per_bit):],
                    amp_tail=jnp.concatenate(
                        [c.amp_tail, amps], 0)[-params.amp_window:])
                return c2, softs[0, 0]
            return jax.lax.scan(f, carry, jnp.arange(n))
        return (lambda c, n: body(c, xs, n)), lambda: fresh(st)

    def run_fromr():
        # stage C over carried block sums (the fused pipeline's form)
        ds = params.ds_samples_per_bit
        rsum_k = []
        for i in range(K):
            ext = jnp.concatenate([st.bit_tail[-ds:], bits_k[i]],
                                  0).astype(jnp.float32)
            cs = jnp.cumsum(ext, 0)
            rsum_k.append((cs[ds:] - cs[:-ds]).astype(jnp.bfloat16))
        rsum_s = jax.block_until_ready(jnp.stack(rsum_k))

        @functools.partial(jax.jit, static_argnums=2, donate_argnums=0)
        def body(carry, rstk, n):
            def f(c, i):
                tail, acc = c
                ratios = fsk_demod._sync_ratios_from_r(
                    params, tail, rstk[i % K])
                return ((rstk[i % K][-(W - ds):], acc + ratios.sum()),
                        ratios[0, 0])
            return jax.lax.scan(f, carry, jnp.arange(n))
        return (lambda c, n: body(c, rsum_s, n)), \
            lambda: (fresh(st.r_tail), jnp.float32(0))

    builders = {"full": run_full, "seq": run_seq, "seq_r": run_seq_r,
                "sync": run_sync, "fromr": run_fromr,
                "framing": run_framing}
    stages = args.stages or list(builders)
    if not fsk_framing.compact_available(B, maxb) and "framing" in stages:
        print("NOTE: compact framing kernel unavailable at this shape; "
              "skipping 'framing'", file=sys.stderr)
        stages = [s for s in stages if s != "framing"]

    results = {}
    for name in stages:
        body, init = builders[name]()
        walls = {}
        for n in (args.n_lo, args.n_hi):
            best = float("inf")
            body(init(), n)  # compile + warm (donates a fresh carry)
            for _ in range(args.reps):
                c = init()
                jax.block_until_ready(c)
                t0 = time.perf_counter()
                out = body(c, n)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            walls[n] = best
        per_step = (walls[args.n_hi] - walls[args.n_lo]) / \
            (args.n_hi - args.n_lo)
        results[name] = per_step
        print(f"{name:8s} {per_step * 1e3:8.3f} ms/chunk   "
              f"(wall {walls[args.n_lo] * 1e3:.1f} -> "
              f"{walls[args.n_hi] * 1e3:.1f} ms)", file=sys.stderr)

    import json
    print(json.dumps({k: round(v * 1e3, 4) for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
