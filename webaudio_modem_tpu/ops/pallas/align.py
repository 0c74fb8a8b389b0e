"""Pallas TPU kernel: per-channel aligned LLR-window extraction.

The fused soft decode's header/body stages read, per channel, a
contiguous (or ds-strided) window of the sliding bit sum
``wsum[i] = polarity * (csum[i + ds] - csum[i])`` starting at a
per-channel row ``base[b]`` (soft_fsk._candidate_headers /
._batch_body_stage).  The lax path realizes this as a truncating
barrel shifter over HBM (soft_fsk._aligned_rows): it avoids the
per-lane scalar gather XLA:TPU would serialize, but each select pass
is a full-width HBM read+write — measured 1.01 ms (header) + 1.34 ms
(body) of the 5.78 ms fused decode at B=2048, ~0.5 GB of traffic per
align against a ~70 MB information content.

This kernel does the same barrel ENTIRELY IN VMEM: the grid tiles the
batch into 128-lane column groups, each grid step DMAs its [T, 128]
csum column block in once, materializes nothing in HBM, and runs the
truncating select ladder on a VMEM scratch (VMEM bandwidth is ~2
orders above HBM, so the passes cost microseconds).  HBM traffic
collapses to one csum read + one small window write.  ``wsum`` itself
is never materialized anywhere: every ladder leaf computes
``polarity * (csum[i+ds] - csum[i])`` on the fly from the block.

Two shapes, two ladders (both bounded to ~<12 MB scoped VMEM — the
naive whole-pass value ladder at body shapes measured 18.08M and was
rejected by Mosaic's 16M scoped limit):

  * stride == 1 (header windows): truncating row barrel — chunked
    in-place on a scratch while k >= chunk (pass k reads rows
    [c+k, c+k+n) and [c, c+n) and writes [c, c+n) ascending; with
    chunk <= k every read lands on rows not yet written this pass),
    then a whole-pass value ladder once the live row count is small.
  * stride == ds > 1 (body windows): the lax path's phase
    decomposition base = q*ds + r done in VMEM — chunks of the
    DECIMATED plane consume r's bits straight from the csum block
    (z[m] = wsum[m*ds + r]), then the tiny [~n/ds, 128] plane is
    barrel-shifted by q as a pure value ladder.

Exactness: every output element is produced by the SAME single f32
subtraction (+/-1.0 multiply) of the same two csum rows the lax path
performs, then routed through selects — bit-identical to
``_aligned_rows(wsum_padded, base, U)`` / ``_aligned_strided(wsum,
base, n_out, ds)`` for every base the callers produce (they clip to
[0, max_shift]); rows outside the stream read as exact zeros in both
paths.  The differential test asserts exact equality, not tolerance
(tests/transports/test_pallas_align.py).

Reference context: the window reads realize the grid search around the
sync peak of /root/reference/src/modems/fsk.ts:297-315 at farm batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MIN_B = 1024        # below farm batch the lax barrel is cheap enough
_CHUNK = 512        # scratch-ladder chunk rows (multiple of 8)
_SMALLK = 64        # below this the value ladder's temps are small
_PCHUNK = 64        # decimated-plane rows per phase-stage chunk


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _msb(n: int) -> int:
    return 0 if n <= 0 else 1 << (int(n).bit_length() - 1)


def _kernel(n_wsum: int, ds: int, n_out: int, stride: int, pad_lo: int,
            pol: float, max_shift: int, virt0: bool,
            x_ref, base_ref, out_ref, y_ref):
    l = pl.program_id(0)
    b = base_ref[pl.ds(l, 1), :]                   # [1, LANES] int32
    scale = jnp.float32(pol)

    def vw(s: int, n: int):
        """Rows [s, s+n) of the virtual zero-padded wsum plane:
        pad_lo zeros, then pol*(csum[i+ds]-csum[i]) for i < n_wsum,
        then zeros — all static slices of the csum block ref.

        With ``virt0`` the block holds the INCLUSIVE cumsum (no
        leading zero row): csum[i] reads as x_ref[i-1] with csum[0]
        an exact virtual zero, so wsum[i] = pol*(x[i+ds-1] - x[i-1])
        and the i == 0 subtrahend is a zero row spliced in.  Same two
        f32 row values, same single subtraction — bit-identical to
        the zero-prefixed form."""
        p = min(max(pad_lo - s, 0), n)
        a0 = max(s - pad_lo, 0)
        v = max(min(n - p, n_wsum - a0), 0)
        parts = []
        if p:
            parts.append(jnp.zeros((p, LANES), jnp.float32))
        if v:
            if virt0:
                mi = x_ref[a0 + ds - 1: a0 + ds - 1 + v, :]
                if a0 == 0:
                    sub = jnp.concatenate(
                        [jnp.zeros((1, LANES), jnp.float32),
                         x_ref[0: v - 1, :]], 0) if v > 1 else \
                        jnp.zeros((1, LANES), jnp.float32)
                else:
                    sub = x_ref[a0 - 1: a0 - 1 + v, :]
                parts.append(scale * (mi - sub))
            else:
                parts.append(scale * (x_ref[a0 + ds: a0 + ds + v, :]
                                      - x_ref[a0: a0 + v, :]))
        q = n - p - v
        if q:
            parts.append(jnp.zeros((q, LANES), jnp.float32))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

    def value_ladder(y, shift, khi: int, U: int):
        """Whole-pass select ladder consuming ``shift``'s bits
        khi..1 on a value ``y`` of U + 2*khi - 1 live rows."""
        k = khi
        while k >= 1:
            nxt = U + k - 1
            m = (shift & k) > 0
            y = jnp.where(m, y[k:k + nxt], y[:nxt])
            k >>= 1
        return y

    if stride == 1:
        U = n_out
        kmax = _msb(max_shift)
        if kmax == 0:
            y = vw(0, U)
        elif U + kmax - 1 <= _CHUNK:
            y = value_ladder(
                jnp.concatenate([vw(0, U + kmax - 1),
                                 vw(U + kmax - 1, kmax)], 0),
                b, kmax, U)
        else:
            # first pass reads the virtual plane, chunked into scratch
            k = kmax
            nxt = U + k - 1
            m = (b & k) > 0
            for c in range(0, nxt, _CHUNK):
                n = min(_CHUNK, nxt - c)
                y_ref[pl.ds(c, n), :] = jnp.where(
                    m, vw(k + c, n), vw(c, n))
            k >>= 1
            # in-place chunked ladder (chunk <= k keeps reads clean)
            while k >= _SMALLK:
                nxt = U + k - 1
                ch = min(k, _CHUNK)
                m = (b & k) > 0
                for c in range(0, nxt, ch):
                    n = min(ch, nxt - c)
                    y_ref[pl.ds(c, n), :] = jnp.where(
                        m, y_ref[pl.ds(c + k, n), :],
                        y_ref[pl.ds(c, n), :])
                k >>= 1
            if k >= 1:
                y = value_ladder(y_ref[pl.ds(0, U + 2 * k - 1), :],
                                 b, k, U)
            else:
                y = y_ref[pl.ds(0, U), :]
    else:
        # phase decomposition base = q*stride + r: consume r's bits
        # per chunk of the DECIMATED plane (z[m] = wsum[m*ds + r]),
        # then barrel the ~stride-times-smaller plane by q.
        q = b // stride
        r = b - q * stride
        q_max = max_shift // stride
        kq = _msb(q_max)
        kr = _msb(stride - 1)
        n_z = n_out + (2 * kq - 1 if kq else 0)
        span = (_PCHUNK - 1) * stride + 1
        for c in range(0, n_z, _PCHUNK):
            cc = min(_PCHUNK, n_z - c)
            spanc = (cc - 1) * stride + 1
            v = vw(c * stride, spanc + (2 * kr - 1 if kr else 0))
            if kr:
                v = value_ladder(v, r, kr, spanc)
            pad = cc * stride - spanc
            if pad:
                v = jnp.concatenate(
                    [v, jnp.zeros((pad, LANES), jnp.float32)], 0)
            y_ref[pl.ds(c, cc), :] = v.reshape(cc, stride, LANES)[:, 0]
        if kq:
            y = value_ladder(y_ref[pl.ds(0, n_out + 2 * kq - 1), :],
                             q, kq, n_out)
        else:
            y = y_ref[pl.ds(0, n_out), :]

    rows_out = out_ref.shape[0]
    if rows_out > n_out:
        y = jnp.concatenate(
            [y, jnp.zeros((rows_out - n_out, LANES), jnp.float32)], 0)
    out_ref[...] = y


def aligned_wsum(csum, base, n_out: int, ds: int, stride: int = 1,
                 pad_lo: int = 0, polarity: float = 1.0,
                 interpret: bool = False, virt0: bool = False):
    """csum [T, B] f32 (zero-prefixed cumsum), base [B] int32 ->
    out [n_out, B] f32 with

        out[j, b] = wsumpad[base[b] + j*stride, b]
        wsumpad   = pad_lo zero rows ++ polarity*(csum[ds:]-csum[:-ds])

    (zeros past the plane), bit-identical to the lax
    ``_aligned_rows`` / ``_aligned_strided`` forms for every
    base in [0, max(pad_lo + T - ds - (n_out-1)*stride - 1, 0)] —
    the range the callers' clips produce.  ``stride`` must be 1 or
    equal to ``ds`` (the two shapes the decode dispatches).  Requires
    ``available(B)`` (or ``interpret=True`` for the CPU test).

    ``virt0``: ``csum`` is the INCLUSIVE cumsum [T, B] (the seq
    kernel's fused emit_csum stream) and behaves exactly as if a zero
    row were prepended — output identical to
    ``aligned_wsum(concat([zeros(1, B), csum]), ...)`` without ever
    materializing the [T+1, B] plane in HBM."""
    return _call(csum, base, int(n_out), int(ds), int(stride),
                 int(pad_lo), float(polarity), bool(interpret),
                 bool(virt0))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def _call(csum, base, n_out: int, ds: int, stride: int, pad_lo: int,
          polarity: float, interpret: bool, virt0: bool = False):
    T, B = csum.shape
    # virt0: one virtual zero row at csum[0] (block shapes keep the
    # ACTUAL array rows; only the wsum-row count sees the extra row)
    n_wsum = (T + 1 if virt0 else T) - ds
    U = (n_out - 1) * stride + 1
    max_shift = max(pad_lo + n_wsum - U, 0)
    rows_out = _round8(n_out)
    if stride == 1:
        y_rows = _round8(max(U + max(_msb(max_shift), 1) - 1, U))
    else:
        kq = _msb(max_shift // stride)
        y_rows = _round8(n_out + (2 * kq - 1 if kq else 0))
    rows_b = B // LANES
    out = pl.pallas_call(
        functools.partial(_kernel, n_wsum, ds, n_out, stride, pad_lo,
                          polarity, max_shift, virt0),
        grid=(rows_b,),
        in_specs=[
            pl.BlockSpec((T, LANES), lambda l: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_b, LANES), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_out, LANES), lambda l: (0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_out, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((y_rows, LANES), jnp.float32)],
        interpret=interpret,
    )(csum.astype(jnp.float32), base.reshape(rows_b, LANES))
    # lazy slice: fuses into the consumers' reads, no copy
    return out[:n_out]


def available(B: int) -> bool:
    if B % LANES != 0 or B < MIN_B:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # broken/unusable default backend — lax path
        return False


# Estimated per-lane-block VMEM ceiling for fits(): the known-good
# bench header barrel (csum 8361 rows) estimates ~13.0 MB and
# compiles; the payload-40 endurance window (19201 rows) estimates
# ~30 MB and is REJECTED by the 16 MB scoped-vmem limit at compile
# (round-5 finding — the r4 endurance table predates this kernel).
_VMEM_EST_BUDGET = 14 * 1024 * 1024


def fits(T: int, n_out: int, ds: int, stride: int = 1,
         pad_lo: int = 0, virt0: bool = False) -> bool:
    """Whether the kernel fits scoped VMEM at these STATIC shapes.

    The whole [T, 128] csum column is double-buffered per lane block
    and the barrel scratch scales with msb(max_shift) (itself ~T), so
    total VMEM ~ (2*T + y_rows + 2*rows_out) * 512 B — long decode
    windows must take the lax barrel instead.  Mirrors ``_call``'s
    shape derivations exactly."""
    n_wsum = (T + 1 if virt0 else T) - ds
    U = (n_out - 1) * stride + 1
    max_shift = max(pad_lo + n_wsum - U, 0)
    rows_out = _round8(n_out)
    if stride == 1:
        y_rows = _round8(max(U + max(_msb(max_shift), 1) - 1, U))
    else:
        kq = _msb(max_shift // stride)
        y_rows = _round8(n_out + (2 * kq - 1 if kq else 0))
    rows = 2 * T + y_rows + 2 * rows_out
    return rows * LANES * 4 <= _VMEM_EST_BUDGET
