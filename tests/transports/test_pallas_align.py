"""Differential test: the Pallas VMEM align kernel vs the lax barrel.

The kernel (ops/pallas/align.py) must be BIT-IDENTICAL to the lax
forms it replaces — soft_fsk._aligned_rows over the zero-padded wsum
plane (header windows) and soft_fsk._aligned_strided over wsum (body
windows) — because each output element is the same single f32
subtraction routed through selects.  Exact equality is asserted
(kernel in interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from webaudio_modem_tpu.ops import soft_fsk
from webaudio_modem_tpu.ops.pallas import align as palign

B = 256


def _ref_dense(csum, base, n_out, ds, pad_lo, pol):
    wsum = jnp.float32(pol) * (csum[ds:] - csum[:-ds])
    wsum = jnp.concatenate(
        [jnp.zeros((pad_lo, csum.shape[1]), jnp.float32), wsum], 0)
    return np.asarray(soft_fsk._aligned_rows(wsum, base, n_out))


def _ref_strided(csum, base, n_out, ds, pol):
    wsum = jnp.float32(pol) * (csum[ds:] - csum[:-ds])
    return np.asarray(soft_fsk._aligned_strided(wsum, base, n_out, ds))


def _csum(rng, T):
    softs = rng.randn(T - 1, B).astype(np.float32)
    return jnp.concatenate(
        [jnp.zeros((1, B), jnp.float32),
         jnp.cumsum(jnp.asarray(softs), axis=0)], 0)


class TestPallasAlign:
    def _base(self, rng, max_shift):
        hi = max(max_shift, 0)
        base = rng.randint(0, hi + 1, B).astype(np.int32)
        base[0] = 0                      # always pin the edges
        base[1] = hi
        return jnp.asarray(base)

    @pytest.mark.parametrize("pad_lo", [0, 25])
    def test_dense_matches_lax(self, pad_lo):
        rng = np.random.RandomState(7 + pad_lo)
        T, ds, n_out, pol = 2001, 20, 401, -1.0
        csum = _csum(rng, T)
        max_shift = pad_lo + (T - ds) - n_out
        base = self._base(rng, max_shift)
        got = np.asarray(palign.aligned_wsum(
            csum, base, n_out, ds, stride=1, pad_lo=pad_lo,
            polarity=pol, interpret=True))
        exp = _ref_dense(csum, base, n_out, ds, pad_lo, pol)
        np.testing.assert_array_equal(got, exp)

    def test_strided_matches_lax(self):
        rng = np.random.RandomState(11)
        T, ds, n_out, pol = 2001, 20, 91, 1.0
        csum = _csum(rng, T)
        max_shift = (T - ds) - ((n_out - 1) * ds + 1)
        base = self._base(rng, max_shift)
        got = np.asarray(palign.aligned_wsum(
            csum, base, n_out, ds, stride=ds, pad_lo=0,
            polarity=pol, interpret=True))
        exp = _ref_strided(csum, base, n_out, ds, pol)
        np.testing.assert_array_equal(got, exp)

    def test_short_plane_no_shift_room(self):
        # max_shift <= 0: kernel must return the window at base 0
        # (the lax path's plane[:U] after zero-padding)
        rng = np.random.RandomState(13)
        T, ds, n_out = 101, 4, 120      # U > plane rows: reads padding
        csum = _csum(rng, T)
        base = jnp.zeros((B,), jnp.int32)
        got = np.asarray(palign.aligned_wsum(
            csum, base, n_out, ds, interpret=True))
        exp = _ref_dense(csum, base, n_out, ds, 0, 1.0)
        np.testing.assert_array_equal(got, exp)

    def test_fused_decode_shapes(self):
        # the exact shapes the fused farm decode dispatches (header:
        # dense + pad_lo, body: strided), scaled-down stream length
        rng = np.random.RandomState(17)
        T, ds = 4181, 20
        csum = _csum(rng, T)
        n_off, h_bits = 31, 76
        pad_lo = ds + ds // 4
        U = n_off + (h_bits - 1) * ds + 1
        max_shift = pad_lo + (T - ds) - U
        base = self._base(rng, max_shift)
        got = np.asarray(palign.aligned_wsum(
            csum, base, U, ds, stride=1, pad_lo=pad_lo, polarity=-1.0,
            interpret=True))
        exp = _ref_dense(csum, base, U, ds, pad_lo, -1.0)
        np.testing.assert_array_equal(got, exp)

        body_bits = 148
        max_shift_b = (T - ds) - ((body_bits - 1) * ds + 1)
        base_b = self._base(rng, max_shift_b)
        got_b = np.asarray(palign.aligned_wsum(
            csum, base_b, body_bits, ds, stride=ds, polarity=-1.0,
            interpret=True))
        exp_b = _ref_strided(csum, base_b, body_bits, ds, -1.0)
        np.testing.assert_array_equal(got_b, exp_b)


class TestVirt0:
    """virt0=True: the csum argument is the INCLUSIVE cumsum (the seq
    kernel's fused emit_csum stream) and must behave exactly as if a
    zero row were prepended — bit-identical to the zero-prefixed call
    on concat([zeros, inc])."""

    def _planes(self, rng, T):
        softs = rng.randn(T - 1, B).astype(np.float32)
        inc = jnp.cumsum(jnp.asarray(softs), axis=0)   # [T-1, B]
        full = jnp.concatenate(
            [jnp.zeros((1, B), jnp.float32), inc], 0)  # [T, B]
        return inc, full

    @pytest.mark.parametrize("pad_lo", [0, 25])
    def test_dense_matches_full(self, pad_lo):
        rng = np.random.RandomState(41 + pad_lo)
        T, ds, n_out, pol = 2001, 20, 401, -1.0
        inc, full = self._planes(rng, T)
        max_shift = pad_lo + (T - ds) - n_out
        base = TestPallasAlign._base(None, rng, max_shift)
        got = np.asarray(palign.aligned_wsum(
            inc, base, n_out, ds, stride=1, pad_lo=pad_lo,
            polarity=pol, interpret=True, virt0=True))
        exp = np.asarray(palign.aligned_wsum(
            full, base, n_out, ds, stride=1, pad_lo=pad_lo,
            polarity=pol, interpret=True))
        np.testing.assert_array_equal(got, exp)

    def test_strided_matches_full(self):
        rng = np.random.RandomState(43)
        T, ds, n_out, pol = 2001, 20, 91, 1.0
        inc, full = self._planes(rng, T)
        max_shift = (T - ds) - ((n_out - 1) * ds + 1)
        base = TestPallasAlign._base(None, rng, max_shift)
        got = np.asarray(palign.aligned_wsum(
            inc, base, n_out, ds, stride=ds, polarity=pol,
            interpret=True, virt0=True))
        exp = np.asarray(palign.aligned_wsum(
            full, base, n_out, ds, stride=ds, polarity=pol,
            interpret=True))
        np.testing.assert_array_equal(got, exp)

    def test_base_zero_hits_virtual_row(self):
        # base = 0, pad_lo = 0: the first output row is
        # pol*(csum[ds] - csum[0]) with csum[0] the VIRTUAL zero —
        # the spliced zero-row path in the kernel's vw()
        rng = np.random.RandomState(47)
        T, ds, n_out = 501, 4, 64
        inc, full = self._planes(rng, T)
        base = jnp.zeros((B,), jnp.int32)
        got = np.asarray(palign.aligned_wsum(
            inc, base, n_out, ds, interpret=True, virt0=True))
        exp = np.asarray(palign.aligned_wsum(
            full, base, n_out, ds, interpret=True))
        np.testing.assert_array_equal(got, exp)
        assert got[0, 0] == np.asarray(full)[ds, 0] * 1.0
