"""Differential test for the single-pass Pallas cumsum kernel.

The kernel adds rows in strict sequential order, so its output is
bit-identical to numpy's sequential f32 cumsum — asserted exactly.
(XLA's log-pass cumsum rounds differently in the last ulps; consumers
are CRC-gated, see soft_fsk._csum0.)
"""

import numpy as np

import jax.numpy as jnp

from webaudio_modem_tpu.ops.pallas import cumsum0 as pcs


def _ref(x):
    out = np.zeros((x.shape[0] + 1, x.shape[1]), np.float32)
    np.cumsum(x.astype(np.float32), axis=0, out=out[1:])
    return out


class TestPallasCumsum:
    def test_bit_identical_to_sequential(self):
        rng = np.random.RandomState(5)
        x = rng.randn(1000, 256).astype(np.float32)
        got = np.asarray(pcs._call(jnp.asarray(x), True))
        assert got.shape == (1001, 256)
        assert (got == _ref(x)).all()

    def test_block_boundary_lengths(self):
        # n_ds % T_BLK == 0 (fully out-of-range tail block) and a
        # short plane (single partial block)
        rng = np.random.RandomState(7)
        for n in (pcs.T_BLK * 2, 37, pcs.T_BLK - 1, pcs.T_BLK + 1):
            x = rng.randn(n, 128).astype(np.float32)
            got = np.asarray(pcs._call(jnp.asarray(x), True))
            assert (got == _ref(x)).all(), n

    def test_large_magnitude_accumulation(self):
        # adversarial: large cancelling values stress the f32
        # sequential-order contract
        rng = np.random.RandomState(9)
        x = (rng.randn(500, 128) * 1e6).astype(np.float32)
        got = np.asarray(pcs._call(jnp.asarray(x), True))
        assert (got == _ref(x)).all()

    def test_availability_gates(self):
        assert not pcs.available(100)      # not lane-aligned
        assert not pcs.available(512)      # below MIN_B
        assert pcs.available(2048) in (False, True)  # backend gate
