"""Transcendentals missing from the Pallas TPU lowering.

Mosaic has no atan/atan2 primitive, so the demod kernel uses this
float32 implementation: classic argument reduction (octant split at
tan(pi/8) / tan(3pi/8)) + the Cephes atanf minimax polynomial —
~1 ulp over the full range, branchless (`where`-composed), pure jnp so
it also runs outside Pallas for testing.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_PI = np.float32(np.pi)
_PI_2 = np.float32(np.pi / 2)
_PI_4 = np.float32(np.pi / 4)
_TAN_PI_8 = np.float32(0.4142135623730950)
_TAN_3PI_8 = np.float32(2.414213562373095)


def atan(x):
    """float32 arctangent, full range."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = (ax > _TAN_PI_8) & ~big
    safe = jnp.maximum(ax, jnp.float32(1e-30))
    arg = jnp.where(big, -1.0 / safe,
                    jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    base = jnp.where(big, _PI_2, jnp.where(mid, _PI_4, jnp.float32(0.0)))
    z = arg * arg
    # Cephes atanf coefficients
    p = ((jnp.float32(8.05374449538e-2) * z
          - jnp.float32(1.38776856032e-1)) * z
         + jnp.float32(1.99777106478e-1)) * z \
        - jnp.float32(3.33329491539e-1)
    poly = p * z * arg + arg
    return sign * (base + poly)


def atan2(y, x):
    """float32 atan2 with numpy quadrant conventions."""
    safe_x = jnp.where(x == 0, jnp.float32(1.0), x)
    r = atan(y / safe_x)
    return jnp.where(
        x > 0, r,
        jnp.where(
            x < 0,
            jnp.where(y >= 0, r + _PI, r - _PI),
            jnp.where(y > 0, _PI_2,
                      jnp.where(y < 0, -_PI_2, jnp.float32(0.0)))))
