"""Accuracy tests for the Pallas-substitute transcendentals."""

import numpy as np

import jax.numpy as jnp

from webaudio_modem_tpu.ops.pallas import tpu_math


def test_atan_accuracy_full_range():
    x = np.concatenate([
        np.linspace(-50, 50, 4001),
        np.linspace(-1.5, 1.5, 2001),
        [0.0, 1e-8, -1e-8, 1e8, -1e8],
    ]).astype(np.float32)
    got = np.asarray(tpu_math.atan(jnp.asarray(x)))
    ref = np.arctan(x)
    np.testing.assert_allclose(got, ref, atol=2e-7, rtol=2e-7)


def test_atan2_quadrants():
    pts = [(1, 1), (1, -1), (-1, 1), (-1, -1), (0, 1), (0, -1),
           (1, 0), (-1, 0), (0, 0), (0.3, -2.0), (-5.0, 0.01)]
    y = np.array([p[0] for p in pts], np.float32)
    x = np.array([p[1] for p in pts], np.float32)
    got = np.asarray(tpu_math.atan2(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y, x)
    np.testing.assert_allclose(got, ref, atol=3e-7)


def test_atan2_dense_grid():
    rng = np.random.RandomState(0)
    y = rng.uniform(-2, 2, 20000).astype(np.float32)
    x = rng.uniform(-2, 2, 20000).astype(np.float32)
    got = np.asarray(tpu_math.atan2(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y, x)
    np.testing.assert_allclose(got, ref, atol=5e-7)


def test_atan2_tiny_magnitudes():
    # demod amplitudes during silence are ~1e-6..1e-2
    rng = np.random.RandomState(1)
    y = (rng.uniform(-1, 1, 5000) * 1e-5).astype(np.float32)
    x = (rng.uniform(-1, 1, 5000) * 1e-5).astype(np.float32)
    got = np.asarray(tpu_math.atan2(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y, x)
    np.testing.assert_allclose(got, ref, atol=1e-6)
