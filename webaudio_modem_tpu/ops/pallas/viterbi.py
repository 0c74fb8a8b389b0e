"""Pallas TPU kernel for the batched soft-decision Viterbi decoder.

Replaces the XLA ``lax.scan`` pair in ops/fec._viterbi_core (forward
ACS scan + reverse traceback scan) for large lane counts.  The scan
form is correct but leaves ~3x on the table at farm shapes (measured
2.23 ms for the header trellis at B=2048 x 8 candidate lanes, vs a
~0.6 ms VPU-issue floor): every ACS step re-materializes [lanes, 64]
intermediates through HBM-visible ops, and the decision planes
(T x lanes x 64 bools) round-trip to HBM between the two scans.

This kernel runs the WHOLE trellis — forward ACS, decision storage,
and traceback — in one ``pallas_call``:

  * lanes tile the (sublane, lane) grid as (rows_blk, 128), the grid
    is independent lane blocks (no cross-lane coupling in Viterbi);
  * path metrics live as a [64, rows_blk, 128] register/VMEM value
    carried through a ``fori_loop`` over time — never touching HBM;
  * the 64-state butterfly is unrolled in Python: because each branch
    metric is exactly +/-(x0+x1) or +/-(x0-x1) (see the A/D mask
    derivation in fec._viterbi_core), each candidate is ONE add of a
    precomputed +/-a / +/-d plane — no [lanes, 64] broadcast FMAs;
  * per-step survivor decisions pack into two uint32 bitplanes
    (bit s2 of word s2//32) held in VMEM scratch — 32x smaller than
    the bool planes the scan form streamed to HBM;
  * traceback reads the packed words back with per-lane variable
    shifts (state & 31) — no one-hot reduction.

Arithmetic is ORDER-IDENTICAL to the lax path (same single-add branch
metrics, same ``>`` tie-break, same group-of-16 max normalization —
max is exact, so tree order is immaterial), so decoded bits are
bit-identical, which the differential test asserts exactly
(tests/transports/test_pallas_viterbi.py), not just at the CRC gate.

Reference context: the reference never implements its FEC memo
(/root/reference/advanced-error-correction.md); this is the TPU-native
realization of that design's decoder at farm batch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webaudio_modem_tpu.ops import fec

LANES = 128
MIN_L = 1024          # below this the lax scan path is fine anyway
N_STATES = fec.N_STATES
_NEG = -1e9
_GROUP = 16           # normalization period — must match fec._viterbi_core


@functools.lru_cache(maxsize=1)
def _branch_terms():
    """Per-state static branch-term selectors.

    Returns two 64-entry tuples (for h=0 / h=1) of (kind, sign) with
    kind 0 = use a = x0+x1, kind 1 = use d = x0-x1 — exactly one is
    active per (s2, h), mirroring fec._viterbi_core's A/D masks."""
    import numpy as np

    _, _, pred_out_np = fec._tables()
    sgn = 2.0 * pred_out_np - 1.0                      # [64, 2, 2]
    sel = []
    for h in (0, 1):
        entries = []
        for s2 in range(N_STATES):
            s0, s1 = sgn[s2, h, 0], sgn[s2, h, 1]
            if s0 == s1:                               # +/-(x0+x1)
                entries.append((0, int(s0)))
            else:                                      # +/-(x0-x1)
                entries.append((1, int(s0)))
        sel.append(tuple(entries))
    return tuple(sel)


def _kernel(T: int, a_ref, d_ref, bits_ref, dec_ref):
    sel0, sel1 = _branch_terms()
    rows, lanes = a_ref.shape[1], a_ref.shape[2]
    half = N_STATES // 2

    idx0 = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, rows, lanes),
                                    0)
    pm0 = jnp.where(idx0 == 0, jnp.float32(0.0), jnp.float32(_NEG))

    def pick(terms, s2, a, na, d, nd):
        kind, sign = terms[s2]
        if kind == 0:
            return a if sign > 0 else na
        return d if sign > 0 else nd

    def step(t, pm):
        a = a_ref[t]
        d = d_ref[t]
        na = jnp.negative(a)
        nd = jnp.negative(d)
        w0 = jnp.zeros((rows, lanes), jnp.uint32)
        w1 = jnp.zeros((rows, lanes), jnp.uint32)
        new = []
        for s2 in range(N_STATES):
            j = s2 // 2
            c0 = pm[j] + pick(sel0, s2, a, na, d, nd)
            c1 = pm[j + half] + pick(sel1, s2, a, na, d, nd)
            dec = c1 > c0
            new.append(jnp.where(dec, c1, c0))
            bit = dec.astype(jnp.uint32) << (s2 % 32)
            if s2 < 32:
                w0 = w0 | bit
            else:
                w1 = w1 | bit
        dec_ref[t, 0] = w0
        dec_ref[t, 1] = w1
        return jnp.stack(new)

    def group(g, pm):
        pm = jax.lax.fori_loop(0, _GROUP,
                               lambda u, p, gg=g: step(gg * _GROUP + u,
                                                       p), pm)
        return pm - jnp.max(pm, axis=0, keepdims=True)

    n_g, rem = divmod(T, _GROUP)
    pm = pm0
    if n_g:
        pm = jax.lax.fori_loop(0, n_g, group, pm)
    if rem:
        pm = jax.lax.fori_loop(n_g * _GROUP, T, step, pm)

    # traceback from state 0 (the trellis is flushed); survivor bits
    # come from the packed words via per-lane variable shifts
    def back(r, st):
        t = T - 1 - r
        w = jnp.where(st < 32, dec_ref[t, 0], dec_ref[t, 1])
        sh = (st & 31).astype(jnp.uint32)
        h = (jax.lax.shift_right_logical(w, sh) & 1).astype(jnp.int32)
        bits_ref[t] = st & 1                           # input bit = LSB
        return (st >> 1) | (h << (fec.K - 2))

    jax.lax.fori_loop(0, T, back,
                      jnp.zeros((rows, lanes), jnp.int32))


def _rows_blk(rows: int, T: int) -> int:
    """Largest Mosaic-LEGAL divisor of ``rows`` whose per-block VMEM
    stays comfortable.

    Legal sublane block dims are multiples of 8 or the whole dim
    itself (the Pallas TPU lowering constraint on the last two block
    dims); a 4-row block over a 16-row array is REJECTED at lowering,
    and through the remote-compile tunnel that rejection surfaced as a
    wedge, not an error.  Per-block VMEM is ~4 KB x T x rb (a/d/bits
    double-buffered + the packed-decision scratch), so the preferred
    budget T*rb <= 2048 keeps the round-4 block choices; the extended
    3072 budget (~12 MB of ~16 MB/core) admits rb=8 for the payload-40
    body trellis (T=342).  Returns 0 when no legal block fits — the
    caller (fec._viterbi_core via ``available``) falls back to the lax
    scan form."""
    for budget in (2048, 3072):
        best = 0
        for cand in (2, 4, 8, 16, 32):
            if rows % cand or (cand % 8 and cand != rows):
                continue
            if T * cand <= budget:
                best = cand
        if best:
            return best
    if T * rows <= 3072:
        return rows          # whole-dim block is always legal
    return 0


@functools.partial(jax.jit, static_argnums=(1, 2))
def decode(soft, n_bits: int, interpret: bool = False):
    """soft [L, T, 2] correlations -> decoded bits [L, n_bits] int32,
    bit-identical to ``fec._viterbi_core(soft, n_bits)`` (the grouped-
    normalization schedule).  Requires ``available(L)`` (or
    ``interpret=True`` for the CPU differential test)."""
    L, T, _ = soft.shape
    rows = L // LANES
    rb = _rows_blk(rows, T)
    if rb == 0:
        raise ValueError(
            f"no legal VMEM block for L={L}, T={T} — gate calls with "
            f"available(L, T) and use the lax path")

    soft = soft.astype(jnp.float32)
    a = (soft[..., 0] + soft[..., 1]).T.reshape(T, rows, LANES)
    d = (soft[..., 0] - soft[..., 1]).T.reshape(T, rows, LANES)

    bits = pl.pallas_call(
        functools.partial(_kernel, T),
        grid=(rows // rb,),
        in_specs=[
            pl.BlockSpec((T, rb, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, rb, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, rb, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, rows, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((T, 2, rb, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(a, d)
    return bits.reshape(T, L).T[:, :n_bits]


def available(L: int, T: Optional[int] = None) -> bool:
    """Whether the kernel supports ``L`` lanes (and, when given, a
    ``T``-step trellis: long trellises can exceed every legal VMEM
    block — e.g. payload >~90 B conv bodies — and take the lax path)."""
    if L % LANES != 0 or L < MIN_L:
        return False
    if T is not None and _rows_blk(L // LANES, T) == 0:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # broken/unusable default backend — lax path
        return False
