"""Pallas TPU kernel for the framing state machine (stage D).

Same playbook as fsk_seq.py: all channels in one (B/128, 128) tile per
step, time loop inside the kernel, 1-D grid over time blocks with the
10 carried state tiles in VMEM scratch.  The per-step logic is the
shared ops/fsk_demod._d_step (silence EOD, sync firing, majority-vote
bit decisions, UART assembly — fsk.ts:278-375), so the lax and Pallas
paths cannot drift.

The four per-step outputs (byte value, emit, eod, fire) are bit-packed
into one int32 plane (byte | emit<<8 | eod<<9 | fire<<10) to halve
output bandwidth; demod_chunk unpacks them.
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
# started, counter, sil, accum, count, bsc, nxt, byte_cur, pos, fill
N_I32 = 10
N_F32 = 2   # threshold, rolling amp-window sum (fused means carry)


def pack_carry(carry):
    (started, counter, sil, thr, accum, count, bsc, nxt,
     byte_cur, pos, run_sum, fillv) = carry
    ints = jnp.stack([started.astype(jnp.int32), counter, sil, accum,
                      count, bsc, nxt, byte_cur, pos, fillv], 0)
    return ints, jnp.stack([thr, run_sum], 0)


def unpack_carry(ints, flts):
    # started stays int32 — _d_step's carry convention (Mosaic i1 limits)
    return (ints[0], ints[1], ints[2], flts[0], ints[3], ints[4],
            ints[5], ints[6], ints[7], ints[8], flts[1], ints[9])


def _kernel(params: FSKParams, n_ds: int, gpb: int,
            bits_ref, amps_ref, ratios_ref, sub_ref, gate_ref,
            sti_ref, stf_ref, out_ref, sti_out, stf_out, scr_i, scr_f):
    from webaudio_modem_tpu.ops.fsk_demod import _d_step

    t_idx = pl.program_id(0)
    n_t = pl.num_programs(0)

    @pl.when(t_idx == 0)
    def _():
        scr_i[...] = sti_ref[...]
        scr_f[...] = stf_ref[...]

    carry0 = unpack_carry(
        tuple(scr_i[i] for i in range(N_I32)),
        tuple(scr_f[i] for i in range(N_F32)))

    count = jnp.minimum(gpb, n_ds - t_idx * gpb)

    def body(i, carry):
        inp = (bits_ref[i], amps_ref[i], ratios_ref[i], sub_ref[i],
               gate_ref[i] > jnp.float32(0.5))
        carry, (byte_i32, emit, eod, fire) = _d_step(params, carry, inp)
        packed = ((byte_i32 & 0xFF)
                  | (emit.astype(jnp.int32) << 8)
                  | (eod.astype(jnp.int32) << 9)
                  | (fire.astype(jnp.int32) << 10))
        out_ref[i] = packed
        return carry

    carry = jax.lax.fori_loop(0, count, body, carry0)

    ints, flts = pack_carry(carry)
    for i in range(N_I32):
        scr_i[i] = ints[i]
    for i in range(N_F32):
        scr_f[i] = flts[i]

    @pl.when(t_idx == n_t - 1)
    def _():
        sti_out[...] = scr_i[...]
        stf_out[...] = scr_f[...]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _stage_d_call(params: FSKParams, n_ds: int, gpb: int, interpret: bool,
                  ints, flts, bits, amps, ratios, sub_amps, gate_f32):
    rows = bits.shape[-1] // LANES

    def r3(a):
        return a.reshape(a.shape[0], rows, LANES)

    n_t = pl.cdiv(n_ds, gpb)
    kernel = functools.partial(_kernel, params, n_ds, gpb)
    in_time_spec = pl.BlockSpec((gpb, rows, LANES), lambda t: (t, 0, 0),
                                memory_space=pltpu.VMEM)
    state_i_spec = pl.BlockSpec((N_I32, rows, LANES), lambda t: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    state_f_spec = pl.BlockSpec((N_F32, rows, LANES), lambda t: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    packed, ints_out, flts_out = pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=[in_time_spec] * 5 + [state_i_spec, state_f_spec],
        out_specs=(in_time_spec, state_i_spec, state_f_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_t * gpb, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((N_I32, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((N_F32, rows, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N_I32, rows, LANES), jnp.int32),
            pltpu.VMEM((N_F32, rows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(r3(bits), r3(amps), r3(ratios), r3(sub_amps), r3(gate_f32),
      ints.reshape(N_I32, rows, LANES),
      flts.reshape(N_F32, rows, LANES))
    B = bits.shape[-1]
    return (packed.reshape(n_t * gpb, B)[:n_ds],
            ints_out.reshape(N_I32, B), flts_out.reshape(N_F32, B))



BLOCK_GROUPS_OVERRIDE = 0   # tuning hook (examples/tune_ladder.py)


def _default_block_groups(B: int) -> int:
    """Slope-calibrated v5e block ladder shared by stage_d and
    stage_d_compact: bigger blocks amortize the pipeline at the B=2048
    sweet spot; 4096 stays at 64 (VMEM); above that the formula keeps
    the 6 double-buffered streams inside the scoped budget."""
    if BLOCK_GROUPS_OVERRIDE:
        return BLOCK_GROUPS_OVERRIDE
    if B <= 2048:
        return 256
    if B <= 4096:
        return 64
    return max(24 * 8192 // B, 8)

def stage_d(params: FSKParams, state, bits, amps, ratios, sub_amps,
            gate_fill, T_blk_groups: int = 0, interpret: bool = False):
    # T_blk_groups sizes VMEM: 5 input streams + 1 output are double-
    # buffered per block (measured on v5e: 256-group blocks fit and
    # run fastest at B<=2048; 64 at B=4096); 64 groups * (B/128) rows
    # * 128 lanes * 4 B
    # * 6 streams * 2 ≈ 6 MB at B=4096 — inside the 16 MB budget, and
    # halved per batch doubling beyond 4096.
    """Pallas stage-D; same contract as fsk_demod._stage_d.

    All inputs time-major [n_ds, B] except ``sub_amps``, the delayed
    amplitude stream feeding the fused rolling mean (ext_amps — may be
    longer than n_ds; only the first n_ds rows are read); returns
    (carry, (byte_vals, emits, eods, fires)) with outputs [n_ds, B].
    """
    from webaudio_modem_tpu.ops.fsk_demod import _means_carry

    n_ds, B = bits.shape
    run_sum0, fillv0 = _means_carry(params, state)
    carry_in = (state.started, state.counter, state.sil, state.threshold,
                state.accum, state.count, state.bsc, state.next_idx,
                state.byte_cur, state.pos, run_sum0, fillv0)
    ints, flts = pack_carry(carry_in)
    if T_blk_groups == 0:
        T_blk_groups = _default_block_groups(B)
    gpb = min(T_blk_groups, n_ds)
    packed, ints_out, flts_out = _stage_d_call(
        params, n_ds, gpb, interpret, ints, flts,
        bits, amps, ratios, sub_amps, gate_fill.astype(jnp.float32))
    carry = unpack_carry(ints_out, flts_out)
    byte_vals = packed & 0xFF
    emits = (packed >> 8 & 1).astype(bool)
    eods = (packed >> 9 & 1).astype(bool)
    fires = (packed >> 10 & 1).astype(bool)
    return carry, (byte_vals, emits, eods, fires)


def available(B: int) -> bool:
    if B % LANES != 0 or B < MIN_B:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # broken/unusable default backend — lax path
        return False


# ---------------------------------------------------------------------------
# Compact variant: byte compaction + event counters INSIDE the kernel
# ---------------------------------------------------------------------------
#
# The packed per-step output plane is [n_ds, B] int32 (~39 MB at the
# bench shape) and the host-side unpack + masked-sum compaction reads
# it several more times.  But the information demod_chunk actually
# needs is tiny per channel: up to maxb decoded bytes, three event
# counters, and the last fire position.  This variant accumulates all
# of that in VMEM scratch and emits ONLY [maxb + 4, B] int32 —
# eliminating the whole packed stream and its consumers.

MAX_SLOTS = 64  # in-kernel compaction bound (selects per step ~ maxb)


def _kernel_compact(params: FSKParams, n_ds: int, gpb: int, maxb: int,
                    bits_ref, amps_ref, ratios_ref, sub_ref,
                    sti_ref, stf_ref, fill_ref, out_ref, sti_out,
                    stf_out, scr_i, scr_f, acc):
    from webaudio_modem_tpu.ops.fsk_demod import _d_step

    t_idx = pl.program_id(0)
    n_t = pl.num_programs(0)
    W = jnp.int32(params.sync_window)

    @pl.when(t_idx == 0)
    def _():
        scr_i[...] = sti_ref[...]
        scr_f[...] = stf_ref[...]
        # acc layout: [0:maxb] byte slots, then cursor, eods, fires,
        # last fire position (-1 = none)
        acc[...] = jnp.zeros_like(acc)
        acc[maxb + 3] = jnp.full_like(acc[maxb + 3], -1)

    carry0 = unpack_carry(
        tuple(scr_i[i] for i in range(N_I32)),
        tuple(scr_f[i] for i in range(N_F32)))
    acc0 = tuple(acc[j] for j in range(maxb + 4))

    count = jnp.minimum(gpb, n_ds - t_idx * gpb)
    base = t_idx * gpb
    fill = fill_ref[0]

    # Accumulators ride the fori carry (registers), not scratch — the
    # slot updates would otherwise cost 2*maxb VMEM touches per step.
    # UNROLL amortizes the dynamic-index stream loads over slabs, same
    # trick as the sequential kernel.  (8 measured flat on v5e — the
    # kernel is VPU-loop-bound, not load-amortization-bound.)
    UNROLL = 4

    def one_step(i, carry, accs, inp4):
        bits_t, amps_t, ratios_t, sub_t = inp4
        gate = (base + i + 1 + fill) >= W
        carry, (byte_i32, emit, eod, fire) = _d_step(
            params, carry, (bits_t, amps_t, ratios_t, sub_t, gate))
        slots = list(accs[:maxb])
        cursor = accs[maxb]
        for j in range(maxb):
            slots[j] = jnp.where(emit & (cursor == j), byte_i32 & 0xFF,
                                 slots[j])
        accs = (*slots,
                cursor + emit.astype(jnp.int32),
                accs[maxb + 1] + eod.astype(jnp.int32),
                accs[maxb + 2] + fire.astype(jnp.int32),
                jnp.where(fire, base + i, accs[maxb + 3]))
        return carry, accs

    n_main = count // UNROLL

    def body_u(k, state):
        carry, accs = state
        i0 = k * UNROLL
        slab_b = bits_ref[pl.ds(i0, UNROLL)]
        slab_a = amps_ref[pl.ds(i0, UNROLL)]
        slab_r = ratios_ref[pl.ds(i0, UNROLL)]
        slab_s = sub_ref[pl.ds(i0, UNROLL)]
        for u in range(UNROLL):
            carry, accs = one_step(
                i0 + u, carry, accs,
                (slab_b[u], slab_a[u], slab_r[u], slab_s[u]))
        return carry, accs

    carry, accs = jax.lax.fori_loop(0, n_main, body_u, (carry0, acc0))

    def body_tail(i, state):
        carry, accs = state
        return one_step(i, carry, accs,
                        (bits_ref[i], amps_ref[i], ratios_ref[i],
                         sub_ref[i]))

    carry, accs = jax.lax.fori_loop(n_main * UNROLL, count, body_tail,
                                    (carry, accs))

    ints, flts = pack_carry(carry)
    for i in range(N_I32):
        scr_i[i] = ints[i]
    for i in range(N_F32):
        scr_f[i] = flts[i]
    for j in range(maxb + 4):
        acc[j] = accs[j]

    @pl.when(t_idx == n_t - 1)
    def _():
        sti_out[...] = scr_i[...]
        stf_out[...] = scr_f[...]
        out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _stage_d_compact_call(params: FSKParams, n_ds: int, gpb: int,
                          maxb: int, interpret: bool,
                          ints, flts, bits, amps, ratios, sub_amps,
                          bit_fill):
    rows = bits.shape[-1] // LANES

    def r3(a):
        return a.reshape(a.shape[0], rows, LANES)

    n_t = pl.cdiv(n_ds, gpb)
    kernel = functools.partial(_kernel_compact, params, n_ds, gpb, maxb)
    in_time_spec = pl.BlockSpec((gpb, rows, LANES), lambda t: (t, 0, 0),
                                memory_space=pltpu.VMEM)
    state_i_spec = pl.BlockSpec((N_I32, rows, LANES), lambda t: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    state_f_spec = pl.BlockSpec((N_F32, rows, LANES), lambda t: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    fill_spec = pl.BlockSpec((1, rows, LANES), lambda t: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((maxb + 4, rows, LANES), lambda t: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    out, ints_out, flts_out = pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=[in_time_spec] * 4 + [state_i_spec, state_f_spec,
                                       fill_spec],
        out_specs=(acc_spec, state_i_spec, state_f_spec),
        out_shape=(
            jax.ShapeDtypeStruct((maxb + 4, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((N_I32, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((N_F32, rows, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N_I32, rows, LANES), jnp.int32),
            pltpu.VMEM((N_F32, rows, LANES), jnp.float32),
            pltpu.VMEM((maxb + 4, rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(r3(bits), r3(amps), r3(ratios), r3(sub_amps),
      ints.reshape(N_I32, rows, LANES),
      flts.reshape(N_F32, rows, LANES),
      bit_fill.reshape(1, rows, LANES))
    B = bits.shape[-1]
    return (out.reshape(maxb + 4, B),
            ints_out.reshape(N_I32, B), flts_out.reshape(N_F32, B))


def stage_d_compact(params: FSKParams, state, bits, amps, ratios,
                    sub_amps, maxb: int, T_blk_groups: int = 0,
                    interpret: bool = False):
    """Pallas stage-D with IN-KERNEL byte compaction.

    ``sub_amps`` is the delayed amplitude stream for the fused rolling
    mean (ext_amps; may be longer than n_ds — only the first n_ds rows
    are read).  Returns (carry, (bytes_out [B, maxb] int32, byte_count
    [B], eod_fired [B], sync_fired [B], fire_t [B] — last fire position
    or -1)) — the exact aggregates demod_chunk needs, with no [n_ds, B]
    output plane.
    """
    from webaudio_modem_tpu.ops.fsk_demod import _means_carry

    n_ds, B = bits.shape
    run_sum0, fillv0 = _means_carry(params, state)
    carry_in = (state.started, state.counter, state.sil, state.threshold,
                state.accum, state.count, state.bsc, state.next_idx,
                state.byte_cur, state.pos, run_sum0, fillv0)
    ints, flts = pack_carry(carry_in)
    if T_blk_groups == 0:
        T_blk_groups = _default_block_groups(B)
    gpb = min(T_blk_groups, n_ds)
    out, ints_out, flts_out = _stage_d_compact_call(
        params, n_ds, gpb, maxb, interpret, ints, flts,
        bits, amps, ratios, sub_amps, state.bit_fill)
    carry = unpack_carry(ints_out, flts_out)
    bytes_out = out[:maxb].T           # [B, maxb]
    byte_count = out[maxb]
    eod_fired = out[maxb + 1]
    sync_fired = out[maxb + 2]
    fire_t = out[maxb + 3]
    return carry, (bytes_out, byte_count, eod_fired, sync_fired, fire_t)


_compact_fallback_logged = set()


def compact_available(B: int, maxb: int) -> bool:
    if maxb > MAX_SLOTS and available(B):
        # A high-baud/long-chunk config silently dropping to the much
        # slower masked-sum loop is a perf cliff discoverable only by
        # profiling — log once per shape and count it.
        key = (B, maxb)
        if key not in _compact_fallback_logged:
            _compact_fallback_logged.add(key)
            from webaudio_modem_tpu.utils.trace import (component_logger,
                                                        metrics)

            metrics.incr("pallas.compact_fallback")
            component_logger("fsk_framing").warning(
                "compact framing kernel unavailable for B=%d, maxb=%d "
                "(> MAX_SLOTS=%d): falling back to the masked-sum slot "
                "loop — use shorter chunks to stay on the fast path",
                B, maxb, MAX_SLOTS)
        return False
    return maxb <= MAX_SLOTS and available(B)
