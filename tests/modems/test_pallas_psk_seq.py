"""Differential test: the DBPSK Pallas sequential-stage kernel
(interpreter mode on CPU) must match the lax.scan path bit-for-bit in
its decisions, closely in float state, and exactly in the delay-ring
contents after zidx canonicalization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from webaudio_modem_tpu.ops import psk as psk_ops
from webaudio_modem_tpu.ops.pallas import psk_seq

PARAMS = psk_ops.psk_params(baud_rate=1200)
B = 1024


def _split_state(state):
    fr = (state.agc_gain, state.pre, state.phi, state.iq_i, state.iq_q)
    dsc = (state.zbuf_i, state.zbuf_q, state.zidx)
    return fr, dsc


@pytest.mark.parametrize("T", [256, 1000, 2048])
def test_psk_pallas_matches_scan(T):
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    state = psk_ops.init_state(PARAMS, B)
    fr, dsc = _split_state(state)

    n_groups = T // PARAMS.downsample_ratio
    Tm = n_groups * PARAMS.downsample_ratio
    (fr_ref, dsc_ref, _, _, bits_ref, amps_ref,
     softs_ref) = psk_ops._sequential_stage(
        PARAMS, 0, state, jnp.asarray(x[:, :Tm]), unroll=2)

    xT = jnp.asarray(x[:, :Tm]).T
    fr_p, dsc_p, bits_p, amps_p, softs_p = psk_seq.seq_main(
        PARAMS, fr, dsc, xT, T_blk=512, interpret=True)

    mism = np.mean(np.asarray(bits_p) != np.asarray(bits_ref))
    assert mism <= 1e-4, f"bit mismatch fraction {mism}"
    np.testing.assert_allclose(np.asarray(amps_p), np.asarray(amps_ref),
                               rtol=1e-4, atol=5e-5)
    # softs = arg(z * conj(z_delay)) wrapped to the nearest
    # constellation point: the wrap subtracts values near ±pi, so the
    # test env's --xla_allow_excess_precision fusion differences
    # (axon sitecustomize) amplify to ~1e-3 here; decode-level
    # equality is asserted by the PSK round-trip tests.
    np.testing.assert_allclose(np.asarray(softs_p),
                               np.asarray(softs_ref),
                               rtol=1e-3, atol=2e-3)
    for a, b in zip(jax.tree.leaves(fr_p), jax.tree.leaves(fr_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-5)
    # ring equivalence: both paths, read out in oldest-first order
    zbi_ref, zbq_ref, zidx_ref = dsc_ref
    zbi_p, zbq_p, zidx_p = dsc_p
    assert int(zidx_p) == 0
    order_ref = (np.arange(PARAMS.ds_samples_per_bit) +
                 int(zidx_ref)) % PARAMS.ds_samples_per_bit
    np.testing.assert_allclose(np.asarray(zbi_p),
                               np.asarray(zbi_ref)[order_ref],
                               rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(zbq_p),
                               np.asarray(zbq_ref)[order_ref],
                               rtol=1e-4, atol=5e-5)


def test_psk_pallas_streaming_state_carry():
    # chunk sizes chosen so n_groups % D != 0 — exercises the ring
    # canonicalization roll between chunks
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (B, 1024)).astype(np.float32)
    state = psk_ops.init_state(PARAMS, B)
    fr, dsc = _split_state(state)

    fr_w, dsc_w, bits_w, amps_w, _ = psk_seq.seq_main(
        PARAMS, fr, dsc, jnp.asarray(x).T, T_blk=256, interpret=True)
    cut = 392  # 196 groups: not a multiple of D=20
    fr_c, dsc_c, b1, a1, _ = psk_seq.seq_main(
        PARAMS, fr, dsc, jnp.asarray(x[:, :cut]).T, T_blk=256,
        interpret=True)
    fr_c, dsc_c, b2, a2, _ = psk_seq.seq_main(
        PARAMS, fr_c, dsc_c, jnp.asarray(x[:, cut:]).T, T_blk=256,
        interpret=True)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(b1), np.asarray(b2)], 0),
        np.asarray(bits_w))
    for a, b in zip(jax.tree.leaves((fr_c, dsc_c)),
                    jax.tree.leaves((fr_w, dsc_w))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-5)


def test_psk_available_gates():
    assert not psk_seq.available(PARAMS, 100)       # lane misalign
    assert not psk_seq.available(PARAMS, 512)       # below MIN_B
    slow = psk_ops.psk_params(baud_rate=75)         # D=320: ring too big
    assert not psk_seq.available(slow, 65536)


def test_psk_pallas_rsum_matches_lax():
    # the R-emitting variant (sliding ds-wide bit sums fused into the
    # kernel via a bit ring in the packed state plane) must match the
    # lax with_rsum path bit-for-bit in bits AND rsum, across a ring
    # seeded from a non-trivial bit_tail
    rng = np.random.RandomState(3)
    T = 1200
    x = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    ds = PARAMS.ds_samples_per_bit
    state = psk_ops.init_state(PARAMS, B)._replace(
        bit_tail=jnp.asarray(
            rng.randint(0, 2, (PARAMS.sync_window, B)), jnp.bfloat16))
    fr, dsc = _split_state(state)

    n_groups = T // PARAMS.downsample_ratio
    Tm = n_groups * PARAMS.downsample_ratio
    from webaudio_modem_tpu.ops import fsk_demod as _fd
    prev = _fd.FORCE_LAX_SEQ
    _fd.FORCE_LAX_SEQ = True
    try:
        out_l = psk_ops._sequential_stage(
            PARAMS, 0, state, jnp.asarray(x[:, :Tm]), unroll=2,
            with_rsum=True)
    finally:
        _fd.FORCE_LAX_SEQ = prev
    bits_l, rsum_l = np.asarray(out_l[4]), np.asarray(out_l[7])

    xT = jnp.asarray(x[:, :Tm]).T
    _, _, bits_p, _, _, rsum_p = psk_seq.seq_main(
        PARAMS, fr, dsc, xT, T_blk=240, interpret=True,
        ring0=state.bit_tail[-ds:])
    np.testing.assert_array_equal(bits_l, np.asarray(bits_p))
    np.testing.assert_array_equal(rsum_l, np.asarray(rsum_p))
    # rsum really is the sliding ds-wide sum over (ring ++ bits)
    ext = np.concatenate(
        [np.asarray(state.bit_tail[-ds:], np.float32), bits_l], 0)
    cs = np.cumsum(ext, 0)
    np.testing.assert_array_equal(
        rsum_l, (cs[ds:] - cs[:-ds]).astype(rsum_l.dtype))
