"""Pallas TPU kernel: single-pass zero-prefixed time cumsum.

The soft decode's header/body stages consume ``csum`` — the
zero-prefixed f32 prefix sum of the [n_ds, B] soft-LLR plane (window
sums become differences of two csum rows, soft_fsk._candidate_headers).
XLA lowers ``jnp.cumsum`` over the 8k-row time axis as a log-depth
pass ladder: ~13 full-plane read+write sweeps ~= 1.8 GB of HBM traffic
at the bench shape, measured 1.09 ms of the 6.8 ms fused decode
(examples/soft_ablate.py, stage ``cumsum``).  A prefix sum is
single-pass work: this kernel streams time blocks through VMEM with a
[rows, 128] running-total scratch carried across the (sequential) time
grid — one read + one write of the plane (~136 MB).

The output is the EXCLUSIVE prefix (out[t] = sum of rows < t), i.e.
exactly the zero-prefixed csum rows [0 .. n_ds]; the row-padded tail
(out rows > n_ds, an artifact of block-aligned output) is sliced away
lazily by the consumer.  Adds run strictly in row order (acc += x[t]
one row at a time), so the result is bit-identical to a sequential f32
accumulation (numpy's cumsum) — the differential test asserts exact
equality.  Versus XLA's pass-ladder rounding the values differ in the
last ulps; every consumer is CRC-gated (the f32-precision note in
soft_fsk._batch_header_stage covers exactly this class of drift).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MIN_B = 1024        # below farm batch the log-pass cumsum is cheap
T_BLK = 256
_UNROLL = 8

# Pipelined per-block VMEM: in + out, each double-buffered ->
# 4 x T_BLK x rb x LANES x 4 B.  rb=32 (B=4096) measured 16.02 MB vs
# the 16.00 MB scoped limit at compile (round 5); cap well under it.
_RB_BUDGET = 12 * 1024 * 1024


def _rb(rows: int) -> int:
    """Largest Mosaic-LEGAL row block under the VMEM budget: legal
    sublane block dims are multiples of 8 or the whole dim itself
    (see viterbi._rows_blk).  0 = nothing fits; callers take the lax
    log-pass cumsum via ``available``."""
    per = T_BLK * LANES * 4 * 4
    for cand in (16, 8):
        if rows % cand == 0 and cand * per <= _RB_BUDGET:
            return cand
    if rows * per <= _RB_BUDGET:
        return rows            # whole-dim block is always legal
    return 0


def _kernel(x_ref, out_ref, carry):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    def body(j, acc):
        slab = x_ref[pl.ds(j * _UNROLL, _UNROLL)]
        outs = []
        for u in range(_UNROLL):
            outs.append(acc)
            acc = acc + slab[u]        # strict row order: sequential-
        out_ref[pl.ds(j * _UNROLL, _UNROLL)] = jnp.stack(outs)
        return acc                     # f32-exact vs np.cumsum

    carry[...] = jax.lax.fori_loop(0, T_BLK // _UNROLL, body,
                                   carry[...])


@jax.jit
def csum0(softs):
    """softs [n_ds, B] -> zero-prefixed f32 cumsum [n_ds + 1, B].
    Requires ``available(B)`` (or interpret mode via ``_call``)."""
    return _call(softs, interpret=False)


@functools.partial(jax.jit, static_argnums=(1,))
def _call(softs, interpret: bool):
    n_ds, B = softs.shape
    rows = B // LANES
    x = softs.astype(jnp.float32).reshape(n_ds, rows, LANES)
    rb = _rb(rows)
    if rb == 0:
        raise ValueError(
            f"no legal VMEM block for B={B} — gate with available(B)")
    n_t = pl.cdiv(n_ds + 1, T_BLK)
    out = pl.pallas_call(
        _kernel,
        grid=(rows // rb, n_t),
        in_specs=[pl.BlockSpec((T_BLK, rb, LANES),
                               lambda l, t: (t, l, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T_BLK, rb, LANES),
                               lambda l, t: (t, l, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_t * T_BLK, rows, LANES),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((rb, LANES), jnp.float32)],
        interpret=interpret,
    )(x)
    # lazy slice: fuses into the consumers' reads, no copy
    return out.reshape(n_t * T_BLK, rows * LANES)[:n_ds + 1]


def available(B: int) -> bool:
    if B % LANES != 0 or B < MIN_B or _rb(B // LANES) == 0:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # broken/unusable default backend — lax path
        return False
