"""Differential test: the fused Pallas trellis kernel must decode
BIT-IDENTICALLY to the lax scan form of fec._viterbi_core.

Unlike the cross-schedule comparisons (grouped vs per-step norm, which
are only CRC-gate equivalent), the Pallas kernel reproduces the lax
path's arithmetic exactly — same single-add branch metrics, same ``>``
tie-break, same group-of-16 normalization with an exact max — so the
contract here is raw decoded-bit equality, asserted on random soft
inputs including adversarial near-tie magnitudes.

Runs the kernel in interpreter mode on CPU (the same pattern as
tests/modems/test_pallas_seq.py); the real-TPU path is exercised by
bench/verify_onchip runs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from webaudio_modem_tpu.ops import fec
from webaudio_modem_tpu.ops.pallas import viterbi as pviterbi


def _lax_bits(soft, n_bits):
    # the scan form, bypassing the Pallas dispatch (available() is
    # False on CPU anyway, but make the oracle explicit)
    return np.asarray(fec._viterbi_core(soft, n_bits))


def _pallas_bits(soft, n_bits):
    return np.asarray(pviterbi.decode(jnp.asarray(soft), n_bits,
                                      interpret=True))


def _coded_soft(rng, lanes, n_bits, sigma):
    """Real coded streams + AWGN -> soft correlations [L, T, 2]."""
    bits = rng.randint(0, 2, (lanes, n_bits)).astype(np.uint8)
    coded = fec.conv_encode_bits_batch(bits).astype(np.float32)
    soft = (2.0 * coded - 1.0) + sigma * rng.randn(*coded.shape) \
        .astype(np.float32)
    return soft.reshape(lanes, -1, 2), bits


class TestPallasViterbiDifferential:
    @pytest.mark.parametrize("n_bits", [16, 18 * 8, 7])
    def test_bit_identical_on_coded_streams(self, n_bits):
        rng = np.random.RandomState(3 + n_bits)
        soft, _ = _coded_soft(rng, 256, n_bits, sigma=0.7)
        assert (_pallas_bits(soft, n_bits)
                == _lax_bits(jnp.asarray(soft), n_bits)).all()

    def test_bit_identical_on_pure_noise(self):
        # no frame at all: every path metric is a random walk, maximal
        # tie pressure on the ACS compares
        rng = np.random.RandomState(11)
        soft = rng.randn(128, 38, 2).astype(np.float32)
        assert (_pallas_bits(soft, 16)
                == _lax_bits(jnp.asarray(soft), 16)).all()

    def test_bit_identical_near_ties(self):
        # quantized magnitudes make exact metric ties common; both
        # forms must break them identically (strict >)
        rng = np.random.RandomState(17)
        soft = rng.choice([-1.0, -0.5, 0.0, 0.5, 1.0],
                          size=(128, 70, 2)).astype(np.float32)
        assert (_pallas_bits(soft, 28)
                == _lax_bits(jnp.asarray(soft), 28)).all()

    def test_decodes_clean_stream_exactly(self):
        rng = np.random.RandomState(23)
        soft, bits = _coded_soft(rng, 128, 24, sigma=0.0)
        assert (_pallas_bits(soft, 24) == bits).all()

    def test_payload40_body_shape(self):
        # the farm-endurance body trellis (T=342) that round-5 moved
        # onto the extended VMEM budget: rb=8 blocks, bit-identical
        rng = np.random.RandomState(37)
        n_bits = 8 * (40 + 2)                      # payload + len + CRC
        soft, _ = _coded_soft(rng, 1024, n_bits, sigma=0.7)
        assert (_pallas_bits(soft, n_bits)
                == _lax_bits(jnp.asarray(soft), n_bits)).all()

    def test_group_boundary_lengths(self):
        # T % 16 == 0 (no remainder scan) and T < 16 (no groups)
        rng = np.random.RandomState(29)
        for n_bits in (10, 4):                # T = 16, 10
            soft = rng.randn(128, 2 * (n_bits + fec.K - 1), 1) \
                .astype(np.float32).repeat(2, -1)
            soft = soft + rng.randn(*soft.shape).astype(np.float32)
            soft = soft.reshape(128, -1, 2)
            assert (_pallas_bits(soft, n_bits)
                    == _lax_bits(jnp.asarray(soft), n_bits)).all()


class TestAvailability:
    def test_gates(self):
        assert not pviterbi.available(100)        # not lane-aligned
        assert not pviterbi.available(512)        # below MIN_L
        # backend gate: on the CPU-pinned suite this is always False
        assert pviterbi.available(2048) in (False, True)

    def test_rows_blk_always_legal(self):
        # Mosaic rejects sublane block dims that are neither multiples
        # of 8 nor the whole dim; through the axon remote-compile
        # tunnel that rejection wedged the client (round-5 farm
        # endurance at payload 40: rows=16, T=342 picked rb=4).  Every
        # returned block must be legal, and the payload-40 body shape
        # must stay ON the kernel.
        for rows in (8, 16, 24, 32, 12, 20):
            for T in (38, 150, 342, 534, 1046):
                rb = pviterbi._rows_blk(rows, T)
                if rb == 0:
                    continue                       # lax fallback
                assert rows % rb == 0
                assert rb % 8 == 0 or rb == rows, (rows, T, rb)
        assert pviterbi._rows_blk(16, 342) == 8    # payload-40 body
        assert pviterbi._rows_blk(32, 342) == 8    # ... at B=4096
        assert pviterbi._rows_blk(16, 150) == 8    # unchanged (r4 pick)
        # payload >~90 B trellises exceed every legal VMEM block ->
        # available(L, T) must gate them off the kernel
        assert pviterbi._rows_blk(16, 1046) == 0
        assert not pviterbi.available(2048, 1046)

    def test_long_trellis_takes_lax_path(self):
        # fec._viterbi_core at a shape the kernel rejects must decode
        # via the scan form (no ValueError), even where available(L)
        # alone would have said yes
        rng = np.random.RandomState(31)
        n_bits = 8 * (128 + 2)                     # payload-128 body
        soft, bits = _coded_soft(rng, 4, n_bits, sigma=0.0)
        out = np.asarray(fec._viterbi_core(jnp.asarray(soft), n_bits))
        assert (out == bits).all()
