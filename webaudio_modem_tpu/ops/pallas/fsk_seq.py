"""Pallas TPU kernel for the demodulator's sequential stage.

Replaces the XLA ``lax.scan`` in ops/fsk_demod._sequential_stage for
the aligned main body: AGC -> pre-filter -> NCO mix -> I/Q LPF ->
2x average -> atan2 -> phase diff -> post-LPF -> slicer, all per
downsample group, carried per channel.

Layout strategy: the whole channel batch is one (B/128, 128)
sublane x lane tile per time step, so every vector op covers ALL
channels (B=4096 -> 4 VREGs per op, exactly like the XLA path), and
the time loop runs INSIDE the kernel as a ``fori_loop`` — Mosaic loops
have none of the XLA While per-iteration overhead that dominated the
scan.  The grid is 1-D over time blocks (sequential by construction),
with the N_STATE (20) carried state tiles living in a VMEM scratch across grid
steps.  atan2 has no Mosaic lowering, so the kernel injects
ops/pallas/tpu_math.atan2.

The arithmetic is shared with the lax path (ops/fsk_demod
._group_step), so the two implementations cannot drift; a differential
test runs this kernel in interpreter mode against the scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webaudio_modem_tpu.models.config import FSKParams

LANES = 128
MIN_B = 1024                     # below this the scan path wins anyway
T_BLK_OVERRIDE = 0               # tuning hook (examples/tune_ladder.py)
N_STATE = 20                     # carried state variables


def _pack_state(fr, dsc):
    """fr/dsc pytrees of [B] -> [N_STATE, B] (order = unpack order)."""
    g, pre, (nco_c, nco_s), iq_i, iq_q = fr
    last_phase, post = dsc
    leaves = [g, *pre, nco_c, nco_s, *iq_i, *iq_q, last_phase, *post]
    assert len(leaves) == N_STATE
    return jnp.stack(leaves, 0)


def _unpack_state(packed):
    leaves = [packed[i] for i in range(N_STATE)]
    g = leaves[0]
    pre = tuple(leaves[1:5])
    nco = (leaves[5], leaves[6])
    iq_i = tuple(leaves[7:11])
    iq_q = tuple(leaves[11:15])
    last_phase = leaves[15]
    post = tuple(leaves[16:20])
    return (g, pre, nco, iq_i, iq_q), (last_phase, post)


def _kernel(params: FSKParams, n_groups: int, groups_per_block: int,
            x_ref, state_in_ref, bits_ref, amps_ref, softs_ref,
            state_out_ref, scratch):
    from webaudio_modem_tpu.ops.fsk_demod import _group_step
    from webaudio_modem_tpu.ops.pallas.tpu_math import atan2 as tpu_atan2

    t_idx = pl.program_id(0)
    n_t = pl.num_programs(0)
    ratio = params.downsample_ratio

    @pl.when(t_idx == 0)
    def _():
        scratch[...] = state_in_ref[...]

    carry0 = _unpack_state(tuple(scratch[i] for i in range(N_STATE)))

    base = t_idx * groups_per_block
    count = jnp.minimum(groups_per_block, n_groups - base)

    # In-kernel unrolling: each fori iteration loads one contiguous
    # UNROLL-group slab and stores one slab of decisions, amortizing
    # dynamic-index memory ops over UNROLL groups of compute.
    UNROLL = 4
    n_main_iters = count // UNROLL

    # bits stay a kernel output even though they equal
    # sign(polarity*soft): measured on v5e, emitting the third stream
    # here beats materializing it with XLA outside (61.0k vs 59.5k
    # bench channels).
    def body_u(j, carry):
        slab = x_ref[pl.ds(j * (UNROLL * ratio), UNROLL * ratio)]
        bits_u, amps_u, softs_u = [], [], []
        for u in range(UNROLL):
            group = tuple(slab[u * ratio + r] for r in range(ratio))
            carry, bit, amp, soft = _group_step(params, carry, group,
                                                atan2=tpu_atan2)
            bits_u.append(bit)
            amps_u.append(amp)
            softs_u.append(soft)
        # bits are 0/1 — exact in bf16, halving the plane every
        # downstream stage (sync, framing, tail) reads
        bits_ref[pl.ds(j * UNROLL, UNROLL)] = \
            jnp.stack(bits_u).astype(jnp.bfloat16)
        amps_ref[pl.ds(j * UNROLL, UNROLL)] = jnp.stack(amps_u)
        softs_ref[pl.ds(j * UNROLL, UNROLL)] = jnp.stack(softs_u)
        return carry

    carry = jax.lax.fori_loop(0, n_main_iters, body_u, carry0)

    def body_tail(i, carry):
        group = tuple(x_ref[i * ratio + r] for r in range(ratio))
        carry, bit, amp, soft = _group_step(params, carry, group,
                                            atan2=tpu_atan2)
        bits_ref[i] = bit.astype(jnp.bfloat16)
        amps_ref[i] = amp
        softs_ref[i] = soft
        return carry

    carry = jax.lax.fori_loop(n_main_iters * UNROLL, count, body_tail,
                              carry)

    packed = _pack_state(*carry)
    for i in range(N_STATE):
        scratch[i] = packed[i]

    @pl.when(t_idx == n_t - 1)
    def _():
        state_out_ref[...] = scratch[...]


def _kernel_r(params: FSKParams, n_groups: int, groups_per_block: int,
              emit_bits: bool, emit_amps: bool, emit_csum: bool,
              x_ref, state_in_ref, ring_in_ref, *refs):
    """Variant emitting the sliding ds-wide bit sums R as a 4th stream.

    R(i) = R(i-1) + b(i) - b(i-ds) rides the sequential loop as a
    rolling carry — the sync correlation's block-sum stage for free
    (same fusion trick as the framing kernel's rolling amp mean).  The
    ds-deep bit history lives in a VMEM ring seeded from
    ``bit_tail[-ds:]`` (read position = global group index mod ds —
    pure scalar-unit arithmetic, no VPU cost); the running sum is an
    exact f32 integer <= ds, emitted bf16 (exact for ds <= 256).

    ``emit_bits`` / ``emit_amps`` (static) gate the bit/amp output
    streams.  pallas_call outputs are opaque to XLA, so a consumer
    that ignores them (the fused soft decode uses only softs + rsum;
    the blind detector only adds bits) still pays their stores — and
    the amp's sqrt chain — unless the kernel itself drops them.  The
    bit decision is always computed (R consumes it); with
    ``emit_amps=False`` the amp arithmetic is dead at trace time and
    never reaches Mosaic.  Retained outputs are bit-identical to the
    full kernel's (differential test test_pallas_seq.py).

    ``emit_csum`` (static): the softs slot stores the INCLUSIVE f32
    running cumsum of the soft stream instead of the raw softs — the
    fused soft decode consumes the plane only as its zero-prefixed
    prefix sum (window sums = differences of csum rows), so emitting
    it here deletes the whole downstream cumsum0 pass (one full-plane
    HBM read + write).  The accumulation runs acc += soft one group
    at a time in stream order — the exact add sequence of
    ops/pallas/cumsum0.py — so inc[t] bit-equals csum0(softs)[t+1]
    (differential test).  The running total carries across grid
    blocks in a VMEM scratch like the R sum."""
    from webaudio_modem_tpu.ops.fsk_demod import _group_step
    from webaudio_modem_tpu.ops.pallas.tpu_math import atan2 as tpu_atan2

    it = iter(refs)
    bits_ref = next(it) if emit_bits else None
    amps_ref = next(it) if emit_amps else None
    softs_ref = next(it)
    rbits_ref = next(it)
    state_out_ref = next(it)
    scratch = next(it)
    ring_scr = next(it)
    run_scr = next(it)
    cs_scr = next(it) if emit_csum else None

    t_idx = pl.program_id(0)
    n_t = pl.num_programs(0)
    ratio = params.downsample_ratio
    ds = params.ds_samples_per_bit

    @pl.when(t_idx == 0)
    def _():
        scratch[...] = state_in_ref[...]
        ring_scr[...] = ring_in_ref[...]
        run_scr[...] = jnp.sum(
            ring_in_ref[...].astype(jnp.float32), axis=0, keepdims=True)
        if emit_csum:
            cs_scr[...] = jnp.zeros_like(cs_scr)

    carry0 = _unpack_state(tuple(scratch[i] for i in range(N_STATE)))
    run0 = run_scr[0]
    cs0 = cs_scr[0] if emit_csum else None

    base = t_idx * groups_per_block
    count = jnp.minimum(groups_per_block, n_groups - base)

    UNROLL = 4
    n_main_iters = count // UNROLL

    def r_step(g, run, bit):
        # g: global group index (scalar); ring position of the bit
        # leaving the window is g mod ds
        rp = jax.lax.rem(g, ds)
        old = ring_scr[pl.ds(rp, 1)][0]
        run = run + bit - old.astype(jnp.float32)
        ring_scr[pl.ds(rp, 1)] = bit.astype(jnp.bfloat16)[None]
        return run

    def body_u(j, state):
        carry, run, cs = state
        slab = x_ref[pl.ds(j * (UNROLL * ratio), UNROLL * ratio)]
        bits_u, amps_u, softs_u, r_u = [], [], [], []
        g0 = base + j * UNROLL
        for u in range(UNROLL):
            group = tuple(slab[u * ratio + r] for r in range(ratio))
            carry, bit, amp, soft = _group_step(params, carry, group,
                                                atan2=tpu_atan2)
            run = r_step(g0 + u, run, bit)
            bits_u.append(bit)
            amps_u.append(amp)
            if emit_csum:
                cs = cs + soft      # strict stream order: == csum0's
                softs_u.append(cs)
            else:
                softs_u.append(soft)
            r_u.append(run)
        if emit_bits:
            bits_ref[pl.ds(j * UNROLL, UNROLL)] = \
                jnp.stack(bits_u).astype(jnp.bfloat16)
        if emit_amps:
            amps_ref[pl.ds(j * UNROLL, UNROLL)] = jnp.stack(amps_u)
        softs_ref[pl.ds(j * UNROLL, UNROLL)] = jnp.stack(softs_u)
        rbits_ref[pl.ds(j * UNROLL, UNROLL)] = \
            jnp.stack(r_u).astype(jnp.bfloat16)
        return carry, run, cs

    state0 = (carry0, run0, cs0 if emit_csum else run0)
    carry, run, cs = jax.lax.fori_loop(0, n_main_iters, body_u, state0)

    def body_tail(i, state):
        carry, run, cs = state
        group = tuple(x_ref[i * ratio + r] for r in range(ratio))
        carry, bit, amp, soft = _group_step(params, carry, group,
                                            atan2=tpu_atan2)
        run = r_step(base + i, run, bit)
        if emit_bits:
            bits_ref[i] = bit.astype(jnp.bfloat16)
        if emit_amps:
            amps_ref[i] = amp
        if emit_csum:
            cs = cs + soft
            softs_ref[i] = cs
        else:
            softs_ref[i] = soft
        rbits_ref[i] = run.astype(jnp.bfloat16)
        return carry, run, cs

    carry, run, cs = jax.lax.fori_loop(n_main_iters * UNROLL, count,
                                       body_tail, (carry, run, cs))

    packed = _pack_state(*carry)
    for i in range(N_STATE):
        scratch[i] = packed[i]
    run_scr[0] = run
    if emit_csum:
        cs_scr[0] = cs

    @pl.when(t_idx == n_t - 1)
    def _():
        state_out_ref[...] = scratch[...]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _seq_main_call(params: FSKParams, n_groups: int, T_blk: int,
                   interpret: bool, packed_state, xT):
    """packed_state [N_STATE, B]; xT time-major [T_m, B] with
    T_m == n_groups * ratio.  Returns (packed_state', bits [n_groups, B],
    amps [n_groups, B])."""
    ratio = params.downsample_ratio
    T_m, B = xT.shape
    rows = B // LANES
    gpb = T_blk // ratio
    n_t = pl.cdiv(n_groups, gpb)

    x3 = xT.reshape(T_m, rows, LANES)
    st3 = packed_state.reshape(N_STATE, rows, LANES)

    kernel = functools.partial(_kernel, params, n_groups, gpb)
    out_shape = (
        jax.ShapeDtypeStruct((n_t * gpb, rows, LANES), jnp.bfloat16),
        jax.ShapeDtypeStruct((n_t * gpb, rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_t * gpb, rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((N_STATE, rows, LANES), jnp.float32),
    )
    bits, amps, softs, st_out = pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec((T_blk, rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_STATE, rows, LANES), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((gpb, rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_STATE, rows, LANES), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((N_STATE, rows, LANES), jnp.float32)],
        interpret=interpret,
    )(x3, st3)

    bits = bits.reshape(n_t * gpb, B)[:n_groups]
    amps = amps.reshape(n_t * gpb, B)[:n_groups]
    softs = softs.reshape(n_t * gpb, B)[:n_groups]
    return st_out.reshape(N_STATE, B), bits, amps, softs


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _seq_main_call_r(params: FSKParams, n_groups: int, T_blk: int,
                     interpret: bool, emit_bits: bool, emit_amps: bool,
                     emit_csum: bool, packed_state, xT, ring0):
    """R-emitting variant: also takes the ds-deep bit ring seed
    (bit_tail[-ds:], bf16 [ds, B]) and returns (packed_state', bits,
    amps, softs, rsum [n_groups, B] bf16) — ``bits``/``amps`` are
    ``None`` when the matching emit flag is off (stream dropped at
    the kernel level, see _kernel_r); with ``emit_csum`` the softs
    slot holds the inclusive f32 cumsum of the soft stream."""
    ratio = params.downsample_ratio
    ds = params.ds_samples_per_bit
    T_m, B = xT.shape
    rows = B // LANES
    gpb = T_blk // ratio
    n_t = pl.cdiv(n_groups, gpb)

    x3 = xT.reshape(T_m, rows, LANES)
    st3 = packed_state.reshape(N_STATE, rows, LANES)
    ring3 = ring0.reshape(ds, rows, LANES)

    kernel = functools.partial(_kernel_r, params, n_groups, gpb,
                               emit_bits, emit_amps, emit_csum)
    out_stream = lambda dt: jax.ShapeDtypeStruct(  # noqa: E731
        (n_t * gpb, rows, LANES), dt)
    stream_spec = pl.BlockSpec((gpb, rows, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)
    out_specs, out_shape = [], []
    if emit_bits:
        out_specs.append(stream_spec)
        out_shape.append(out_stream(jnp.bfloat16))
    if emit_amps:
        out_specs.append(stream_spec)
        out_shape.append(out_stream(jnp.float32))
    out_specs += [stream_spec, stream_spec,
                  pl.BlockSpec((N_STATE, rows, LANES),
                               lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM)]
    out_shape += [out_stream(jnp.float32), out_stream(jnp.bfloat16),
                  jax.ShapeDtypeStruct((N_STATE, rows, LANES),
                                       jnp.float32)]
    outs = pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec((T_blk, rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_STATE, rows, LANES), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ds, rows, LANES), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((N_STATE, rows, LANES), jnp.float32),
            pltpu.VMEM((ds, rows, LANES), jnp.bfloat16),
            pltpu.VMEM((1, rows, LANES), jnp.float32),
        ] + ([pltpu.VMEM((1, rows, LANES), jnp.float32)]
             if emit_csum else []),
        interpret=interpret,
    )(x3, st3, ring3)

    outs = list(outs)
    cut = lambda a: a.reshape(n_t * gpb, B)[:n_groups]  # noqa: E731
    bits = cut(outs.pop(0)) if emit_bits else None
    amps = cut(outs.pop(0)) if emit_amps else None
    softs, rsum, st_out = cut(outs[0]), cut(outs[1]), outs[2]
    return st_out.reshape(N_STATE, B), bits, amps, softs, rsum


def seq_main(params: FSKParams, fr, dsc, xT_main,
             T_blk: int = 0, interpret: bool = False,
             ring0=None, run0=None, emit_bits: bool = True,
             emit_amps: bool = True, emit_csum: bool = False):
    """Pallas path for the aligned main body of the sequential stage.

    xT_main: time-major [n_groups*ratio, B]; B must be a multiple of
    128 lanes.  Returns (fr', dsc', bits [n_groups, B],
    amps [n_groups, B], softs [n_groups, B]) — plus
    ``rsum [n_groups, B]`` (sliding ds-wide bit sums, bf16) when
    ``ring0`` (the ds-deep bit history, bf16 [ds, B]) is given.
    ``run0`` is accepted for interface symmetry but recomputed
    in-kernel from the ring (exact integer sum).

    ``emit_bits`` / ``emit_amps`` (R variant only) drop the matching
    output streams at the kernel level — pallas_call outputs are
    opaque to XLA DCE, so consumers that ignore a stream otherwise
    still pay its stores (and the amp sqrt chain).  A dropped stream
    returns ``None`` in its slot; retained outputs are bit-identical.

    ``emit_csum`` (R variant only): the softs slot returns the
    INCLUSIVE f32 running cumsum of the soft stream — bit-identical
    to ``cumsum0.csum0(softs)[1:]`` — so the fused soft decode skips
    its separate prefix-sum pass (align kernels take the plane with
    ``virt0=True``).
    """
    T_m, B = xT_main.shape
    ratio = params.downsample_ratio
    if B % LANES != 0:
        raise ValueError(f"Pallas seq kernel needs B % {LANES} == 0")
    n_groups = T_m // ratio
    if T_blk == 0:
        T_blk = T_BLK_OVERRIDE   # tuning hook (examples/tune_ladder.py)
    if T_blk == 0:
        # VMEM scales with rows = B/128: the input block + 3 output
        # blocks are double-buffered, so shrink the time-block as the
        # batch grows to stay inside the ~16 MB scoped budget.
        # Slope-calibrated on v5e: 256 is best through B=2048; at
        # B=4096 the 256-block pipeline starves double-buffering
        # (190k bench channels vs 211k at 192); above 4096 the ladder
        # formula keeps the blocks inside VMEM.
        if B <= 2048:
            T_blk = 256
        elif B <= 4096:
            T_blk = 192   # r3: 128 re-measured worse (194k vs 217k)
        else:
            T_blk = max(64 * 8192 // B, 4 * ratio)
    T_blk = min(T_blk, max(T_m, ratio))
    # Block geometry: the input block advances T_blk rows per grid step
    # while the kernel consumes gpb*ratio rows, so blocks must hold a
    # whole number of downsample groups.
    T_blk = max(T_blk - (T_blk % ratio), ratio)
    packed = _pack_state(fr, dsc)
    if ring0 is not None:
        packed, bits, amps, softs, rsum = _seq_main_call_r(
            params, n_groups, T_blk, interpret, emit_bits, emit_amps,
            emit_csum, packed, xT_main, ring0)
        fr2, dsc2 = _unpack_state(packed)
        return fr2, dsc2, bits, amps, softs, rsum
    assert not emit_csum, "emit_csum requires the R variant (ring0)"
    packed, bits, amps, softs = _seq_main_call(
        params, n_groups, T_blk, interpret, packed, xT_main)
    fr2, dsc2 = _unpack_state(packed)
    return fr2, dsc2, bits, amps, softs


# kept for tests that exercise tile-sized batches explicitly
TILE = 1024


def available(B: int) -> bool:
    if B % LANES != 0 or B < MIN_B:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # broken/unusable default backend — lax path
        return False
