"""Per-stage slope ablation for the fused farm soft decode.

Mirrors examples/ablate.py's methodology ("measure through the tunnel
correctly", docs/PERFORMANCE.md): each stage is chained N times inside
ONE jit via ``lax.scan`` (inputs cycle through K preloaded variants so
nothing is loop-invariant; outputs feed the scan carry so nothing is
dead), and the reported cost is ``(wall(N_hi) - wall(N_lo)) / dN`` —
the steady-state per-call cost with every dispatch/transfer artifact
cancelled.

Stages (the sub-programs of ``soft_fsk._decode_frames_fused`` at the
bench shape, B=2048 / payload 16 / T=16720):

  full     the whole fused decode (one device program)
  full_soft  the pre-csum-fusion composition (streams="soft" + the
           downstream cumsum0 pass) — the A/B baseline for emit_csum
  seq      sequential demod (Pallas kernel path)
  seq_r    sequential demod, R-variant, all four streams emitted
  seq_soft sequential demod, R-variant with bit/amp streams dropped
           at the kernel level
  seq_csum sequential demod as the fused decode calls it: streams
           dropped AND the inclusive soft cumsum fused into the softs
           slot (no separate cumsum0 pass downstream)
  sync     sync correlation + peak argmax over the full stream
  cumsum   soft-LLR cumulative sum
  hdr      _batch_header_stage (align + score/prune + top-k Viterbi)
  hdr_full _batch_header_stage with pruning off (all n_off candidates)
  hwin     header candidate-window build alone (wsum + barrel align +
           n_off strided slices + moveaxis -> [B, n_off, h])
  hscore   alignment-coherence score alone (sum |llr| + mask)
  hsel     top-k selection alone (score + iterative argmax -> one-hot)
  hcontr   one-hot candidate contraction alone (einsum + starts/valid)
  body     _batch_body_stage (align + body Viterbi)
  align_h  _aligned_rows alone at the header window shape
  align_b  _aligned_rows alone at the body window shape
  vit_h    header Viterbi alone (B x HEADER_TOP_K candidates)
  vit_h_full  header Viterbi alone (B x n_off candidates)
  vit_b    body Viterbi alone
  crc      device CRC16 scans (header grid + body gate)

Usage:  python examples/soft_ablate.py [--batch 2048] [--stages hdr body]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from webaudio_modem_tpu.utils.platform import ensure_env_platform  # noqa: E402

ensure_env_platform()


def _slope(fn, make_carry, n_lo, n_hi, reps):
    walls = {}
    for n in (n_lo, n_hi):
        best = float("inf")
        for _ in range(reps):
            import jax
            c = make_carry()
            t0 = time.perf_counter()
            out = fn(c, n)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        walls[n] = best
    return (walls[n_hi] - walls[n_lo]) / (n_hi - n_lo)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--payload", type=int, default=16)
    ap.add_argument("--stages", nargs="*", default=None)
    ap.add_argument("--n-lo", type=int, default=4)
    ap.add_argument("--n-hi", type=int, default=24)
    ap.add_argument("--reps", type=int, default=2)
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

    from webaudio_modem_tpu.models.config import (DEFAULT_FSK_CONFIG,
                                                  FSKParams)
    from webaudio_modem_tpu.ops import fec, fsk_demod, soft_fsk

    B, payload = args.batch, args.payload
    K = 4
    params = FSKParams.from_config(DEFAULT_FSK_CONFIG)
    ds = params.ds_samples_per_bit
    h_bits = soft_fsk.HEADER_CODED_BITS
    offsets = soft_fsk._grid_offsets(params)
    n_off = len(offsets)
    pad_lo = -int(offsets[0])
    body_bits = soft_fsk._body_coded_bits(payload)

    payloads = [bytes((i * 13 + k) & 0xFF for k in range(payload))
                for i in range(B)]
    sigs = soft_fsk.encode_frames_batch(params, payloads)
    T = sigs.shape[1]
    n_ds = T // params.downsample_ratio
    power = float(jnp.mean(sigs[0].astype(jnp.float32) ** 2))
    amp = np.sqrt(power / (10 ** (8.0 / 10)))
    xs = jnp.stack([
        (sigs + jnp.float32(amp)
         * jax.random.normal(jax.random.PRNGKey(7 + i), sigs.shape,
                             jnp.float32)).astype(jnp.float32)
        for i in range(K)])
    xs = jax.block_until_ready(xs)
    print(f"device={jax.devices()[0]} B={B} T={T} n_ds={n_ds} "
          f"n_off={n_off} h_bits={h_bits} body_bits={body_bits}",
          file=sys.stderr)

    state0 = fsk_demod.init_state(params, batch=B)

    # preload per-stage inputs (device-resident, K variants each)
    bits_k, softs_k, csum_k = [], [], []
    for i in range(K):
        _, _, _, _, bits, _, softs = fsk_demod._sequential_stage(
            params, 0, state0, xs[i])
        csum = jnp.concatenate(
            [jnp.zeros((1, B), jnp.float32),
             jnp.cumsum(softs.astype(jnp.float32), axis=0)], 0)
        bits_k.append(bits)
        softs_k.append(softs)
        csum_k.append(csum)
    bits_s = jax.block_until_ready(jnp.stack(bits_k))
    softs_s = jax.block_until_ready(jnp.stack(softs_k))
    csum_s = jax.block_until_ready(jnp.stack(csum_k))

    rng = np.random.RandomState(0)
    U_h = n_off + (h_bits - 1) * ds + 1
    U_b = (body_bits - 1) * ds + 1
    base_h = jnp.asarray(rng.randint(0, n_ds - U_h, (K, B)), jnp.int32)
    base_b = jnp.asarray(rng.randint(0, n_ds - U_b, (K, B)), jnp.int32)
    bstarts = jnp.asarray(
        rng.randint(0, n_ds - (body_bits + 1) * ds, (K, B)), jnp.int32)
    k_sel = soft_fsk.HEADER_TOP_K or n_off
    hllr = jnp.asarray(rng.randn(K, B * k_sel, h_bits // 2, 2)
                       .astype(np.float32))
    hllr_full = jnp.asarray(rng.randn(K, B * n_off, h_bits // 2, 2)
                            .astype(np.float32))
    bllr = jnp.asarray(rng.randn(K, B, body_bits // 2, 2)
                       .astype(np.float32))
    hbits16 = jnp.asarray(rng.randint(0, 2, (K, B, n_off, 16)),
                          jnp.uint8)
    bbits = jnp.asarray(rng.randint(0, 2, (K, B, 8 * payload)),
                        jnp.uint8)
    # header-internals operands: [B, n_off, h_bits] candidate planes,
    # [B, n_off] starts, [B, k, n_off] one-hots (as produced in
    # soft_fsk._candidate_headers)
    hplane = jnp.asarray(rng.randn(K, B, n_off, h_bits)
                         .astype(np.float32))
    hstarts = jnp.asarray(rng.randint(0, n_ds, (K, B, n_off)),
                          jnp.int32)
    oh_np = np.zeros((K, B, k_sel, n_off), np.float32)
    for kk in range(K):
        for j in range(k_sel):
            oh_np[kk, np.arange(B), j, rng.randint(0, n_off, B)] = 1.0
    honehot = jnp.asarray(oh_np)

    def jit_scan(step):
        @functools.partial(jax.jit, static_argnums=1)
        def body(carry, n, *stk):
            def f(c, i):
                return c + step(i % K, *stk), None
            c, _ = jax.lax.scan(f, carry, jnp.arange(n))
            return c
        return body

    zero = lambda: jnp.float32(0)  # noqa: E731

    stages = {}

    def full_step(i, stk):
        out = soft_fsk._decode_frames_fused(params, stk[i], payload)
        return out.astype(jnp.float32).sum()
    stages["full"] = (jit_scan(full_step), (xs,))

    def full_soft_step(i, stk, st0):
        # the PRE-csum-fusion composition of the fused decode
        # (streams="soft" + downstream cumsum0 in the header stage) —
        # kept as the reproducible A/B baseline for the emit_csum row
        # in docs/PERFORMANCE.md; decoded bytes are identical
        # (tests/transports/test_soft_batch_internals.py)
        _, _, _, _, bits, _, softs, rsum = fsk_demod._sequential_stage(
            params, 0, st0, stk[i], with_rsum=True, streams="soft")
        t_peak, peak_ok, csum, starts, headers, valid = \
            soft_fsk._batch_header_stage(params, bits, softs,
                                         soft_fsk._body_coded_bits(
                                             payload),
                                         soft_fsk.HEADER_TOP_K, rsum)
        found, _, st = soft_fsk._select_candidate(
            headers, starts, valid, payload_len=payload)
        b_starts = jnp.where(found, st + h_bits * ds,
                             0).astype(jnp.int32)
        bodies = soft_fsk._batch_body_stage(params, csum, b_starts,
                                            payload)
        out = soft_fsk._pack_bodies(bodies, payload, found)
        return out.astype(jnp.float32).sum()
    stages["full_soft"] = (jit_scan(full_soft_step), (xs, state0))

    def seq_step(i, stk, st0):
        # st0 rides as an operand: closed-over device arrays inline as
        # HLO literals, which blows the remote-compile request size
        _, _, _, _, bits, _, softs = fsk_demod._sequential_stage(
            params, 0, st0, stk[i])
        return bits.astype(jnp.float32).sum() + softs.sum()
    stages["seq"] = (jit_scan(seq_step), (xs, state0))

    def seq_r_step(i, stk, st0):
        # the fused decode's actual call shape: R-variant, all streams
        _, _, _, _, bits, amps, softs, rsum = \
            fsk_demod._sequential_stage(params, 0, st0, stk[i],
                                        with_rsum=True)
        return (bits.astype(jnp.float32).sum() + amps.sum()
                + softs.sum() + rsum.astype(jnp.float32).sum())
    stages["seq_r"] = (jit_scan(seq_r_step), (xs, state0))

    def seq_soft_step(i, stk, st0):
        # streams="soft": bit/amp stores (and the amp sqrt chain)
        # dropped at the kernel level
        _, _, _, _, _, _, softs, rsum = \
            fsk_demod._sequential_stage(params, 0, st0, stk[i],
                                        with_rsum=True, streams="soft")
        return softs.sum() + rsum.astype(jnp.float32).sum()
    stages["seq_soft"] = (jit_scan(seq_soft_step), (xs, state0))

    def seq_csum_step(i, stk, st0):
        # streams="csum": bit/amp streams dropped AND the softs slot
        # carries the fused inclusive cumsum — what the fused decode
        # now runs (the separate cumsum0 pass is gone)
        _, _, _, _, _, _, softs, rsum = \
            fsk_demod._sequential_stage(params, 0, st0, stk[i],
                                        with_rsum=True, streams="csum")
        plane = softs.inc if isinstance(softs, fsk_demod.CsumPlane) \
            else softs
        return plane.sum() + rsum.astype(jnp.float32).sum()
    stages["seq_csum"] = (jit_scan(seq_csum_step), (xs, state0))

    def sync_step(i, bstk):
        W = params.sync_window
        ext = jnp.concatenate(
            [jnp.zeros((W, B), bstk[i].dtype), bstk[i]], 0)
        ratios = fsk_demod._sync_ratios(params, ext)
        return ratios.max(0).sum() + \
            jnp.argmax(ratios, 0).astype(jnp.float32).sum()
    stages["sync"] = (jit_scan(sync_step), (bits_s,))

    def cumsum_step(i, sstk):
        return jnp.cumsum(sstk[i].astype(jnp.float32), 0)[-1].sum()
    stages["cumsum"] = (jit_scan(cumsum_step), (softs_s,))

    def csum0_step(i, sstk):
        # the production helper (Pallas single-pass kernel on TPU farm
        # shapes, lax fallback elsewhere)
        return soft_fsk._csum0(sstk[i])[-1].sum()
    stages["csum0"] = (jit_scan(csum0_step), (softs_s,))

    def hdr_step(i, bstk, sstk):
        t_peak, peak_ok, csum, starts, headers, valid = \
            soft_fsk._batch_header_stage(params, bstk[i], sstk[i],
                                         body_bits,
                                         soft_fsk.HEADER_TOP_K)
        return (t_peak.sum() + csum[-1].sum()
                + headers.astype(jnp.int32).sum()).astype(jnp.float32)
    stages["hdr"] = (jit_scan(hdr_step), (bits_s, softs_s))

    def hdr_full_step(i, bstk, sstk):
        t_peak, peak_ok, csum, starts, headers, valid = \
            soft_fsk._batch_header_stage(params, bstk[i], sstk[i],
                                         body_bits, 0)
        return (t_peak.sum() + csum[-1].sum()
                + headers.astype(jnp.int32).sum()).astype(jnp.float32)
    stages["hdr_full"] = (jit_scan(hdr_full_step), (bits_s, softs_s))

    def body_step(i, cstk, bstk):
        bodies = soft_fsk._batch_body_stage(params, cstk[i], bstk[i],
                                            payload)
        return bodies.astype(jnp.float32).sum()
    stages["body"] = (jit_scan(body_step), (csum_s, bstarts))

    def align_h_step(i, cstk, bstk):
        plane = cstk[i][:n_ds]
        return soft_fsk._aligned_rows(plane, bstk[i], U_h).sum()
    stages["align_h"] = (jit_scan(align_h_step), (csum_s, base_h))

    def align_b_step(i, cstk, bstk):
        plane = cstk[i][:n_ds]
        return soft_fsk._aligned_rows(plane, bstk[i], U_b).sum()
    stages["align_b"] = (jit_scan(align_b_step), (csum_s, base_b))

    def palign_h_step(i, cstk, bstk):
        # the VMEM-barrel kernel at the header-window shape (the live
        # dispatch in _candidate_headers on TPU farm batches)
        from webaudio_modem_tpu.ops.pallas import align as palign
        return palign.aligned_wsum(
            cstk[i], bstk[i], U_h, ds, stride=1, pad_lo=ds + ds // 4,
            polarity=float(params.polarity)).sum()
    stages["palign_h"] = (jit_scan(palign_h_step), (csum_s, base_h))

    def palign_b_step(i, cstk, bstk):
        from webaudio_modem_tpu.ops.pallas import align as palign
        return palign.aligned_wsum(
            cstk[i], bstk[i], body_bits, ds, stride=ds,
            polarity=float(params.polarity)).sum()
    stages["palign_b"] = (jit_scan(palign_b_step), (csum_s, bstarts))

    def vit_h_step(i, stk):
        return fec._viterbi_core(
            stk[i], 8 * soft_fsk.HEADER_PLAIN).astype(jnp.float32).sum()
    stages["vit_h"] = (jit_scan(vit_h_step), (hllr,))
    stages["vit_h_full"] = (jit_scan(vit_h_step), (hllr_full,))

    def vit_b_step(i, stk):
        return fec._viterbi_core(
            stk[i], 8 * (payload + 2)).astype(jnp.float32).sum()
    stages["vit_b"] = (jit_scan(vit_b_step), (bllr,))

    def hwin_step(i, cstk, bstk):
        # the candidate-window build of _candidate_headers: windowed
        # bit sums from csum, pad, barrel align, n_off strided slices,
        # moveaxis to [B, n_off, h]
        csum = cstk[i]
        wsum = jnp.float32(params.polarity) * (csum[ds:] - csum[:-ds])
        wsum = jnp.concatenate(
            [jnp.zeros((pad_lo, B), jnp.float32), wsum], 0)
        base = jnp.clip(bstk[i], 0, max(wsum.shape[0] - U_h, 0))
        al = soft_fsk._aligned_rows(wsum, base, U_h)
        h_llr = jnp.stack(
            [jax.lax.slice(al, (o, 0),
                           (o + (h_bits - 1) * ds + 1, B), (ds, 1))
             for o in range(n_off)], axis=0)
        return jnp.moveaxis(h_llr, -1, 0).sum()
    stages["hwin"] = (jit_scan(hwin_step), (csum_s, base_h))

    def hscore_step(i, pstk):
        score = jnp.sum(jnp.abs(pstk[i]), axis=-1)
        return score.sum()
    stages["hscore"] = (jit_scan(hscore_step), (hplane,))

    def hsel_step(i, pstk):
        # score + the iterative top-k argmax loop -> [B, k, n_off]
        sc = jnp.sum(jnp.abs(pstk[i]), axis=-1)
        iota_off = jnp.arange(n_off)
        ohs = []
        for _ in range(k_sel):
            idx = jnp.argmax(sc, axis=-1)
            oh = iota_off[None, :] == idx[:, None]
            ohs.append(oh)
            sc = jnp.where(oh, -jnp.inf, sc)
        return jnp.stack(ohs, 1).astype(jnp.float32).sum()
    stages["hsel"] = (jit_scan(hsel_step), (hplane,))

    def hcontr_step(i, pstk, ostk, sstk):
        h_llr = jnp.einsum("bko,boh->bkh", ostk[i], pstk[i])
        starts = jnp.sum(ostk[i] * sstk[i][:, None, :].astype(
            jnp.float32), axis=-1)
        return h_llr.sum() + starts.sum()
    stages["hcontr"] = (jit_scan(hcontr_step),
                        (hplane, honehot, hstarts))

    def crc_step(i, hstk, bstk):
        h = soft_fsk._crc16_bits_device(hstk[i])
        b = soft_fsk._crc16_bits_device(bstk[i])
        return (h.sum() + b.sum()).astype(jnp.float32)
    stages["crc"] = (jit_scan(crc_step), (hbits16, bbits))

    chosen = args.stages or list(stages)
    # measure "full" first when requested (in any position) so the
    # '% of full' column renders for every stage
    if "full" in chosen:
        chosen = ["full"] + [n for n in chosen if n != "full"]
    full_ms = None
    for name in chosen:
        fn, operands = stages[name]
        per = _slope(lambda c, n: fn(c, n, *operands), zero,
                     args.n_lo, args.n_hi, args.reps)
        if per < 0:  # slope noise on fast hosts / tiny reps
            print(f"{name:8s} {per * 1e3:8.3f} ms (negative slope — "
                  "measurement noise; raise --reps/--n-hi)")
            continue
        if name == "full":
            full_ms = per
        frac = f" ({per / full_ms * 100:5.1f}% of full)" if full_ms \
            else ""
        print(f"{name:8s} {per * 1e3:8.3f} ms{frac}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
