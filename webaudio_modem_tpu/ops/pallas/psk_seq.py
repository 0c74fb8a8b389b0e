"""Pallas TPU kernel for the DBPSK demodulator's sequential stage.

Same structure as the FSK kernel (ops/pallas/fsk_seq.py): the whole
channel batch rides one (B/128, 128) sublane x lane tile per time step,
the time loop runs inside the kernel, and the grid is 1-D over
sequential time blocks with carried state in VMEM scratch.

The DBPSK difference is the decision stage: instead of the FSK
phase-difference discriminator (carried last_phase + post biquad), the
decision compares each downsampled I/Q sample against the one-bit-
period-delayed sample through a circular delay ring
(ops/psk._psk_decision).  Both rings are PACKED INTO the carried state
plane ([N_STATE + 2D, rows, 128]) so one scratch buffer carries
everything across grid steps; the ring index is derivable from the
group counter, so the caller pre-rolls the rings to read-position 0
(``seq_main``) and no scalar index crosses the kernel boundary.

The arithmetic is shared with the lax path (_full_rate_step and
ops/psk._psk_soft), so the two implementations cannot drift; a
differential test runs this kernel in interpreter mode against the
scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webaudio_modem_tpu.models.config import FSKParams

LANES = 128
MIN_B = 1024
N_STATE = 15                     # front-end carry (no FSK dsc fields)
_STATE_VMEM_LIMIT = 6 * 2 ** 20  # in+out+scratch of the packed plane


def _pack_fr(fr):
    g, pre, (nco_c, nco_s), iq_i, iq_q = fr
    leaves = [g, *pre, nco_c, nco_s, *iq_i, *iq_q]
    assert len(leaves) == N_STATE
    return jnp.stack(leaves, 0)


def _unpack_fr(packed):
    leaves = [packed[i] for i in range(N_STATE)]
    return (leaves[0], tuple(leaves[1:5]), (leaves[5], leaves[6]),
            tuple(leaves[7:11]), tuple(leaves[11:15]))


def _kernel(params: FSKParams, n_groups: int, groups_per_block: int,
            with_r: bool, *refs):
    """Shared kernel body; ``with_r`` (static) appends a 4th output
    stream rbits_ref — the sliding D-wide bit sums R, maintained as a
    rolling carry over a D-deep bit ring packed into the state plane
    (rows [N_STATE+2D, N_STATE+3D); running sum in row N_STATE+3D).
    The ring shares the delay rings' read index ((base+g) % D), so the
    R update costs ~3 extra VPU ops per group — the same fusion as the
    FSK kernel (fsk_seq._kernel_r), with the ring riding the existing
    packed-state roll convention instead of a separate input."""
    from webaudio_modem_tpu.ops.fsk_demod import _full_rate_step
    from webaudio_modem_tpu.ops.pallas.tpu_math import atan2 as tpu_atan2
    from webaudio_modem_tpu.ops.psk import _psk_soft

    if with_r:
        (x_ref, state_in_ref, bits_ref, amps_ref, softs_ref, rbits_ref,
         state_out_ref, scratch) = refs
    else:
        (x_ref, state_in_ref, bits_ref, amps_ref, softs_ref,
         state_out_ref, scratch) = refs
        rbits_ref = None

    t_idx = pl.program_id(0)
    n_t = pl.num_programs(0)
    ratio = params.downsample_ratio
    D = params.ds_samples_per_bit
    inv_ratio = jnp.float32(1.0 / ratio)

    @pl.when(t_idx == 0)
    def _():
        scratch[...] = state_in_ref[...]

    fr0 = _unpack_fr(tuple(scratch[i] for i in range(N_STATE)))
    run0 = scratch[N_STATE + 3 * D] if with_r else None

    base = t_idx * groups_per_block
    count = jnp.minimum(groups_per_block, n_groups - base)

    UNROLL = 4
    n_main_iters = count // UNROLL

    def group(fr, run, g_idx, samples):
        acc_i = acc_q = None
        for x_t in samples:
            fr, fi, fq = _full_rate_step(params, fr, x_t)
            acc_i = fi if acc_i is None else acc_i + fi
            acc_q = fq if acc_q is None else acc_q + fq
        avg_i = acc_i * inv_ratio
        avg_q = acc_q * inv_ratio
        idx = (base + g_idx) % D
        di = scratch[N_STATE + idx]
        dq = scratch[N_STATE + D + idx]
        bit, amp, soft = _psk_soft(params, avg_i, avg_q, di, dq,
                                   atan2=tpu_atan2)
        scratch[N_STATE + idx] = avg_i
        scratch[N_STATE + D + idx] = avg_q
        if with_r:
            old = scratch[N_STATE + 2 * D + idx]
            run = run + bit - old
            scratch[N_STATE + 2 * D + idx] = bit
        return fr, run, bit, amp, soft

    carry0 = (fr0, run0) if with_r else (fr0,)

    def body_u(j, state):
        fr, run = state if with_r else (state[0], None)
        slab = x_ref[pl.ds(j * (UNROLL * ratio), UNROLL * ratio)]
        bits_u, amps_u, softs_u, r_u = [], [], [], []
        for u in range(UNROLL):
            samples = tuple(slab[u * ratio + r] for r in range(ratio))
            fr, run, bit, amp, soft = group(fr, run, j * UNROLL + u,
                                            samples)
            bits_u.append(bit)
            amps_u.append(amp)
            softs_u.append(soft)
            r_u.append(run)
        bits_ref[pl.ds(j * UNROLL, UNROLL)] = \
            jnp.stack(bits_u).astype(jnp.bfloat16)
        amps_ref[pl.ds(j * UNROLL, UNROLL)] = jnp.stack(amps_u)
        softs_ref[pl.ds(j * UNROLL, UNROLL)] = jnp.stack(softs_u)
        if with_r:
            rbits_ref[pl.ds(j * UNROLL, UNROLL)] = \
                jnp.stack(r_u).astype(jnp.bfloat16)
        return (fr, run) if with_r else (fr,)

    carry = jax.lax.fori_loop(0, n_main_iters, body_u, carry0)

    def body_tail(i, state):
        fr, run = state if with_r else (state[0], None)
        samples = tuple(x_ref[i * ratio + r] for r in range(ratio))
        fr, run, bit, amp, soft = group(fr, run, i, samples)
        bits_ref[i] = bit.astype(jnp.bfloat16)
        amps_ref[i] = amp
        softs_ref[i] = soft
        if with_r:
            rbits_ref[i] = run.astype(jnp.bfloat16)
        return (fr, run) if with_r else (fr,)

    carry = jax.lax.fori_loop(n_main_iters * UNROLL, count, body_tail,
                              carry)
    fr, run = carry if with_r else (carry[0], None)

    packed = _pack_fr(fr)
    for i in range(N_STATE):
        scratch[i] = packed[i]
    if with_r:
        scratch[N_STATE + 3 * D] = run

    @pl.when(t_idx == n_t - 1)
    def _():
        state_out_ref[...] = scratch[...]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _psk_main_call(params: FSKParams, n_groups: int, T_blk: int,
                   interpret: bool, with_r: bool, packed_state, xT):
    """packed_state [N_STATE + 2D, B] (+ D bit-ring rows + 1 run row
    when ``with_r``); xT time-major [T_m, B]."""
    ratio = params.downsample_ratio
    D = params.ds_samples_per_bit
    n_packed = N_STATE + (3 * D + 1 if with_r else 2 * D)
    T_m, B = xT.shape
    rows = B // LANES
    gpb = T_blk // ratio
    n_t = pl.cdiv(n_groups, gpb)

    x3 = xT.reshape(T_m, rows, LANES)
    st3 = packed_state.reshape(n_packed, rows, LANES)

    kernel = functools.partial(_kernel, params, n_groups, gpb, with_r)
    plane = lambda n: jax.ShapeDtypeStruct(  # noqa: E731
        (n, rows, LANES), jnp.float32)
    whole = lambda n: pl.BlockSpec(  # noqa: E731
        (n, rows, LANES), lambda t: (0, 0, 0), memory_space=pltpu.VMEM)
    stream = lambda n: pl.BlockSpec(  # noqa: E731
        (n, rows, LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)

    bf16_stream = jax.ShapeDtypeStruct((n_t * gpb, rows, LANES),
                                       jnp.bfloat16)
    out_specs = [stream(gpb), stream(gpb), stream(gpb)]
    out_shape = [bf16_stream, plane(n_t * gpb), plane(n_t * gpb)]
    if with_r:
        out_specs.append(stream(gpb))
        out_shape.append(bf16_stream)
    out_specs.append(whole(n_packed))
    out_shape.append(plane(n_packed))

    outs = pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=[stream(T_blk), whole(n_packed)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((n_packed, rows, LANES), jnp.float32)],
        interpret=interpret,
    )(x3, st3)

    st_out = outs[-1].reshape(n_packed, B)
    streams = [o.reshape(n_t * gpb, B)[:n_groups] for o in outs[:-1]]
    return (st_out, *streams)


def seq_main(params: FSKParams, fr, dsc, xT_main,
             T_blk: int = 0, interpret: bool = False, ring0=None):
    """Pallas path for the aligned main body of the DBPSK sequential
    stage.  ``dsc`` = (zbuf_i [D, B], zbuf_q [D, B], zidx scalar) in
    the lax path's representation; returned in the same representation
    (canonicalized to zidx == 0).

    With ``ring0`` (the D-deep bit history, oldest first — e.g.
    ``bit_tail[-D:]``) a 6th output is appended: ``rsum [n_groups, B]``
    bf16, the sliding D-wide bit sums (the sync correlation's block-sum
    stage, fused — see fsk_seq).  The bit ring and running sum ride the
    packed state plane alongside the I/Q delay rings."""
    T_m, B = xT_main.shape
    ratio = params.downsample_ratio
    D = params.ds_samples_per_bit
    if B % LANES != 0:
        raise ValueError(f"Pallas psk kernel needs B % {LANES} == 0")
    n_groups = T_m // ratio
    if T_blk == 0:
        # same ladder shape as fsk_seq, a notch smaller: the delay
        # rings also live in scoped VMEM
        if B <= 2048:
            T_blk = 256
        elif B <= 4096:
            T_blk = 128
        else:
            T_blk = max(32 * 8192 // B, 4 * ratio)
    T_blk = min(T_blk, max(T_m, ratio))
    T_blk = max(T_blk - (T_blk % ratio), ratio)

    zbi, zbq, zidx = dsc
    # roll the rings so the kernel's read position is 0 (zidx points at
    # the oldest entry, which is read and then overwritten)
    with_r = ring0 is not None
    parts = [
        _pack_fr(fr),
        jnp.roll(zbi, -zidx, axis=0),
        jnp.roll(zbq, -zidx, axis=0)]
    if with_r:
        ring_f32 = ring0.astype(jnp.float32)
        parts.append(ring_f32)                      # oldest first: the
        parts.append(jnp.sum(ring_f32, axis=0,      # shared idx reads
                             keepdims=True))        # the leaving bit
    packed = jnp.concatenate(parts, axis=0)

    out = _psk_main_call(
        params, n_groups, T_blk, interpret, with_r, packed, xT_main)
    packed = out[0]
    bits, amps, softs = out[1], out[2], out[3]
    fr2 = _unpack_fr(packed[:N_STATE])
    ri = packed[N_STATE:N_STATE + D]
    rq = packed[N_STATE + D:N_STATE + 2 * D]
    # canonicalize: after n_groups writes the read position is
    # n_groups % D; roll back so position 0 is again the oldest
    shift = n_groups % D
    if shift:
        ri = jnp.roll(ri, -shift, axis=0)
        rq = jnp.roll(rq, -shift, axis=0)
    dsc2 = (ri, rq, jnp.zeros((), jnp.int32))
    if with_r:
        return fr2, dsc2, bits, amps, softs, out[4]
    return fr2, dsc2, bits, amps, softs


def available(params: FSKParams, B: int) -> bool:
    if B % LANES != 0 or B < MIN_B:
        return False
    # sized for the R-fused plane (bit ring + run row) — the larger of
    # the two layouts, so availability cannot flip with the rsum flag
    n_packed = N_STATE + 3 * params.ds_samples_per_bit + 1
    if 3 * n_packed * (B // LANES) * LANES * 4 > _STATE_VMEM_LIMIT:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
