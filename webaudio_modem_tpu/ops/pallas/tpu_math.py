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


# atan(q)/q on q in [0,1] as a degree-7 polynomial in z = q^2
# (Chebyshev fit, max error 7.5e-8 rad — float32-level).  Used by the
# single-divide atan2 below: the old octant-reduced Cephes form cost
# THREE divides per call (y/x plus two inside atan); with |y|,|x|
# min/max reduction the argument is already in [0,1], so one divide and
# one Horner chain suffice — the demod kernel is VPU-issue-bound and
# atan2 runs once per downsample group.
_ATAN_POLY = (  # plain Python floats: jnp scalars here would be
    # captured as pallas_call constants (Mosaic rejects that)
    -4.6687733075e-03,
    2.4166189522e-02,
    -5.9367100789e-02,
    9.9060968960e-02,
    -1.4016585042e-01,
    1.9969235395e-01,
    -3.3331959724e-01,
    9.9999989775e-01,
)


def atan2(y, x):
    """float32 atan2 with numpy quadrant conventions (one divide)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    q = lo / jnp.maximum(hi, jnp.float32(1e-30))  # [0, 1]; 0 at origin
    z = q * q
    p = jnp.float32(_ATAN_POLY[0])
    for c in _ATAN_POLY[1:]:
        p = p * z + jnp.float32(c)
    a = q * p
    a = jnp.where(ay > ax, _PI_2 - a, a)
    a = jnp.where(x < 0, _PI - a, a)
    return jnp.where(y < 0, -a, a)
