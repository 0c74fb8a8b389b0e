"""Filter design and filtering ops.

Design formulas are coefficient-identical to the reference
(FilterDesign, src/dsp/filters.ts:172-315): 2nd-order Butterworth
LP/HP/BP via bilinear transform, windowed-sinc (Hamming) FIR LP/HP/BP
with odd-tap enforcement, spectral inversion for HP, and HP*LP
convolution for BP.

Filtering comes in three flavours:
  * ``IIRFilter`` / ``FIRFilter`` — stateful scalar host classes with the
    reference per-sample contract (src/dsp/filters.ts:8-167); used by
    host code, the golden model, and design-parity tests.
  * ``biquad_scan`` — batched JAX Direct-Form-I biquad over [B, T] via
    ``lax.scan``; carried state makes streaming chunk calls exact.
  * ``fir_apply`` — batched FIR via ``jnp.convolve``-style conv, used by
    the V.21 channel-separation simulator.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

SQRT2 = math.sqrt(2.0)


# ---------------------------------------------------------------------------
# IIR design (reference FilterDesign.butterworth*, filters.ts:180-234)
# ---------------------------------------------------------------------------

def butterworth_lowpass(cutoff_freq: float,
                        sample_rate: float) -> Tuple[List[float], List[float]]:
    nyquist = sample_rate / 2.0
    normalized = cutoff_freq / nyquist
    c = math.tan(math.pi * normalized / 2.0)
    c2 = c * c
    sqrt2c = SQRT2 * c
    denom = 1.0 + sqrt2c + c2
    b = [c2 / denom, 2.0 * c2 / denom, c2 / denom]
    a = [1.0, (2.0 * c2 - 2.0) / denom, (1.0 - sqrt2c + c2) / denom]
    return b, a


def butterworth_highpass(cutoff_freq: float,
                         sample_rate: float) -> Tuple[List[float], List[float]]:
    nyquist = sample_rate / 2.0
    normalized = cutoff_freq / nyquist
    c = math.tan(math.pi * normalized / 2.0)
    c2 = c * c
    sqrt2c = SQRT2 * c
    denom = 1.0 + sqrt2c + c2
    b = [1.0 / denom, -2.0 / denom, 1.0 / denom]
    a = [1.0, (2.0 * c2 - 2.0) / denom, (1.0 - sqrt2c + c2) / denom]
    return b, a


def butterworth_bandpass(center_freq: float, bandwidth: float,
                         sample_rate: float) -> Tuple[List[float], List[float]]:
    omega = 2.0 * math.pi * center_freq / sample_rate
    bw = 2.0 * math.pi * bandwidth / sample_rate
    c = math.tan(bw / 2.0)
    d = 2.0 * math.cos(omega)
    c2 = c * c
    denom = 1.0 + c + c2
    b = [c / denom, 0.0, -c / denom]
    a = [1.0, (-d * (1.0 + c2)) / denom, (1.0 - c + c2) / denom]
    return b, a


def normalize_biquad(b: Sequence[float],
                     a: Sequence[float]) -> Tuple[float, float, float,
                                                  float, float]:
    """Normalize so a[0] == 1 and return (b0, b1, b2, a1, a2)."""
    a0 = a[0]
    if a0 == 0:
        raise ValueError("a[0] cannot be zero")
    b = [x / a0 for x in b] + [0.0] * (3 - len(b))
    a = [x / a0 for x in a] + [0.0] * (3 - len(a))
    return (b[0], b[1], b[2], a[1], a[2])


# ---------------------------------------------------------------------------
# FIR design (reference FilterDesign.sinc*, filters.ts:243-314)
# ---------------------------------------------------------------------------

def sinc_lowpass(cutoff_freq: float, sample_rate: float,
                 num_taps: int) -> np.ndarray:
    if num_taps % 2 == 0:
        num_taps += 1  # odd-tap enforcement (filters.ts:244-246)
    normalized = cutoff_freq / sample_rate
    center = (num_taps - 1) // 2
    i = np.arange(num_taps, dtype=np.float64)
    x = np.pi * (i - center)
    with np.errstate(invalid="ignore", divide="ignore"):
        coeffs = np.sin(2.0 * normalized * x) / x
    coeffs[center] = 2.0 * normalized
    # Hamming window (filters.ts:261)
    coeffs *= 0.54 - 0.46 * np.cos(2.0 * np.pi * i / (num_taps - 1))
    return coeffs


def sinc_highpass(cutoff_freq: float, sample_rate: float,
                  num_taps: int) -> np.ndarray:
    if num_taps % 2 == 0:
        num_taps += 1
    coeffs = -sinc_lowpass(cutoff_freq, sample_rate, num_taps)
    coeffs[(num_taps - 1) // 2] += 1.0  # spectral inversion
    return coeffs


def sinc_bandpass(center_freq: float, bandwidth: float, sample_rate: float,
                  num_taps: int) -> np.ndarray:
    if num_taps % 2 == 0:
        num_taps += 1
    low_freq = center_freq - bandwidth / 2.0
    high_freq = center_freq + bandwidth / 2.0
    highpass = sinc_highpass(low_freq, sample_rate, num_taps)
    lowpass = sinc_lowpass(high_freq, sample_rate, num_taps)
    # Truncated linear convolution, keeping the first num_taps terms
    # (filters.ts:304-311).
    full = np.convolve(highpass, lowpass)
    return full[:num_taps]


# ---------------------------------------------------------------------------
# Stateful scalar filters (host / golden-model use)
# ---------------------------------------------------------------------------

class IIRFilter:
    """Direct-Form-I recursive filter, per-sample, matching the reference
    contract (src/dsp/filters.ts:8-106) including a0-normalization."""

    def __init__(self, b: Sequence[float], a: Sequence[float]):
        if b is None or len(b) == 0:
            raise ValueError("Feedforward coefficients (b) cannot be empty")
        if a is None or len(a) == 0:
            raise ValueError("Feedback coefficients (a) cannot be empty")
        if a[0] == 0:
            raise ValueError("First feedback coefficient (a[0]) cannot be zero")
        a0 = a[0]
        self.b = np.asarray([x / a0 for x in b], dtype=np.float64)
        self.a = np.asarray([1.0] + [x / a0 for x in a[1:]], dtype=np.float64)
        self.order = max(len(b), len(a)) - 1
        self.reset()

    def process(self, x: float) -> float:
        self._x = np.roll(self._x, 1)
        self._x[0] = x
        y = float(self.b @ self._x[:len(self.b)])
        if len(self.a) > 1:
            y -= float(self.a[1:] @ self._y[:len(self.a) - 1])
        self._y = np.roll(self._y, 1)
        if len(self._y):
            self._y[0] = y
        return y

    def process_buffer(self, xs: np.ndarray) -> np.ndarray:
        out = np.empty(len(xs), dtype=np.float32)
        for i, x in enumerate(np.asarray(xs, dtype=np.float64)):
            out[i] = self.process(float(x))
        return out

    def reset(self) -> None:
        self._x = np.zeros(max(len(self.b), self.order + 1), dtype=np.float64)
        self._y = np.zeros(max(len(self.a) - 1, self.order), dtype=np.float64)

    def get_coefficients(self):
        return {"b": list(self.b), "a": list(self.a)}


class FIRFilter:
    """Delay-line FIR, per-sample (src/dsp/filters.ts:112-167)."""

    def __init__(self, coefficients: Sequence[float]):
        self.coefficients = np.asarray(coefficients, dtype=np.float64)
        self.reset()

    def process(self, x: float) -> float:
        self._delay = np.roll(self._delay, 1)
        self._delay[0] = x
        return float(self.coefficients @ self._delay)

    def process_buffer(self, xs: np.ndarray) -> np.ndarray:
        out = np.empty(len(xs), dtype=np.float32)
        for i, x in enumerate(np.asarray(xs, dtype=np.float64)):
            out[i] = self.process(float(x))
        return out

    def reset(self) -> None:
        self._delay = np.zeros(len(self.coefficients), dtype=np.float64)

    def get_coefficients(self):
        return list(self.coefficients)


class FilterFactory:
    """Convenience constructors (reference FilterFactory,
    src/dsp/filters.ts:320-369).  FIR default is 51 taps (:349)."""

    @staticmethod
    def create_iir_lowpass(cutoff: float, sample_rate: float) -> IIRFilter:
        return IIRFilter(*butterworth_lowpass(cutoff, sample_rate))

    @staticmethod
    def create_iir_highpass(cutoff: float, sample_rate: float) -> IIRFilter:
        return IIRFilter(*butterworth_highpass(cutoff, sample_rate))

    @staticmethod
    def create_iir_bandpass(center: float, bandwidth: float,
                            sample_rate: float) -> IIRFilter:
        return IIRFilter(*butterworth_bandpass(center, bandwidth, sample_rate))

    @staticmethod
    def create_fir_lowpass(cutoff: float, sample_rate: float,
                           num_taps: int = 51) -> FIRFilter:
        return FIRFilter(sinc_lowpass(cutoff, sample_rate, num_taps))

    @staticmethod
    def create_fir_highpass(cutoff: float, sample_rate: float,
                            num_taps: int = 51) -> FIRFilter:
        return FIRFilter(sinc_highpass(cutoff, sample_rate, num_taps))

    @staticmethod
    def create_fir_bandpass(center: float, bandwidth: float,
                            sample_rate: float,
                            num_taps: int = 51) -> FIRFilter:
        return FIRFilter(sinc_bandpass(center, bandwidth, sample_rate,
                                       num_taps))


# ---------------------------------------------------------------------------
# Batched JAX filtering ops
# ---------------------------------------------------------------------------

def biquad_scan(coeffs, state, x):
    """Batched streaming biquad over [B, T] (or [T]) via lax.scan.

    coeffs: (b0, b1, b2, a1, a2) — python floats (baked into the jaxpr).
    state:  (x1, x2, y1, y2) arrays of shape [B] (carried across chunks).
    x:      [B, T] input.
    Returns (state', y[B, T]).
    """
    import jax
    import jax.numpy as jnp

    b0, b1, b2, a1, a2 = [jnp.float32(c) for c in coeffs]

    def step(carry, xt):
        x1, x2, y1, y2 = carry
        y = b0 * xt + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
        return (xt, x1, y, y1), y

    xT = jnp.moveaxis(x, -1, 0)  # [T, B]
    state, yT = jax.lax.scan(step, tuple(state), xT)
    return state, jnp.moveaxis(yT, 0, -1)


def biquad_init_state(batch_shape=()):
    import jax.numpy as jnp
    z = jnp.zeros(batch_shape, dtype=jnp.float32)
    return (z, z, z, z)


def fir_apply(coeffs: np.ndarray, x, history=None):
    """Batched streaming FIR over [B, T] via conv.

    history: [B, num_taps-1] previous input tail (zeros initially).
    Returns (new_history, y[B, T]).
    """
    import jax.numpy as jnp

    taps = jnp.asarray(np.asarray(coeffs, dtype=np.float32))
    n = taps.shape[0]
    x = jnp.asarray(x, dtype=jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    if history is None:
        history = jnp.zeros((x.shape[0], n - 1), dtype=jnp.float32)
    ext = jnp.concatenate([history, x], axis=-1)  # [B, n-1+T]
    # y[t] = sum_k taps[k] * ext[t + (n-1) - k]
    lhs = ext[:, None, :]                 # [B, 1, L]
    rhs = taps[::-1][None, None, :]       # [O=1, I=1, n]
    import jax
    y = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))[:, 0, :]
    new_history = ext[:, -(n - 1):] if n > 1 else history
    if squeeze:
        y = y[0]
    return new_history, y
