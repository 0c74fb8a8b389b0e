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

    def test_rb_legal_and_under_vmem_budget(self):
        # rb=32 at B=4096 measured 16.02 MB vs the 16.00 MB scoped
        # VMEM limit at compile (round-5 blind endurance); every pick
        # must be legal (multiple of 8 or the whole dim) AND under the
        # pipelined budget
        per = pcs.T_BLK * pcs.LANES * 4 * 4
        for rows in (8, 16, 24, 32, 12, 20, 64):
            rb = pcs._rb(rows)
            assert rb != 0, rows
            assert rows % rb == 0
            assert rb % 8 == 0 or rb == rows, (rows, rb)
            assert rb * per <= pcs._RB_BUDGET, (rows, rb)
        assert pcs._rb(32) == 16           # the B=4096 regression
        assert pcs._rb(16) == 16           # unchanged (r4 pick)

    def test_multi_row_block_grid(self):
        # rows//rb > 1 (the B=4096 shape class): carry reset must be
        # per row block
        rng = np.random.RandomState(11)
        x = rng.randn(300, 4096).astype(np.float32)
        got = np.asarray(pcs._call(jnp.asarray(x), True))
        assert (got == _ref(x)).all()
