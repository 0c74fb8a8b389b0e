"""Channel simulators for loopback testing and BER evaluation.

The noise model matches the reference test helper exactly
(tests/modems/fsk-demodulation.node.test.ts:1184-1205): uniform noise
in [-A, A] with A = sqrt(3 * noise_power) so the variance equals the
requested noise power.  Channel functions compose with
runtime.AudioGraph's ``channel_fn`` hook and with batched [B, T] arrays
for device-side BER sweeps.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np


def signal_power(signal: np.ndarray) -> float:
    signal = np.asarray(signal, dtype=np.float64)
    return float(np.mean(signal * signal))


def awgn(signal: np.ndarray, noise_power: float,
         rng: np.random.RandomState) -> np.ndarray:
    amplitude = np.sqrt(3.0 * noise_power)
    noise = amplitude * (rng.uniform(size=np.shape(signal)) * 2.0 - 1.0)
    return (np.asarray(signal, np.float32)
            + noise.astype(np.float32))


def awgn_snr(signal: np.ndarray, snr_db: float,
             rng: np.random.RandomState,
             reference_power: Optional[float] = None) -> np.ndarray:
    """Add uniform noise at the given SNR relative to the signal power
    (or an explicit reference power for batched/streamed use)."""
    power = signal_power(signal) if reference_power is None \
        else reference_power
    noise_power = power / (10.0 ** (snr_db / 10.0))
    return awgn(signal, noise_power, rng)


def make_awgn_channel(noise_power: float,
                      seed: int = 0) -> Callable[[np.ndarray], np.ndarray]:
    """Streaming AWGN channel function for AudioGraph (fixed noise power,
    since streamed quanta have varying signal content)."""
    rng = np.random.RandomState(seed)
    return lambda x: awgn(x, noise_power, rng)


def make_gain(gain: float) -> Callable[[np.ndarray], np.ndarray]:
    return lambda x: (np.asarray(x, np.float32) * np.float32(gain))


def make_dc_offset(offset: float) -> Callable[[np.ndarray], np.ndarray]:
    return lambda x: (np.asarray(x, np.float32) + np.float32(offset))


def make_dropout_channel(drop_probability: float, seed: int = 0,
                         block: int = 128) -> Callable[[np.ndarray],
                                                       np.ndarray]:
    """Randomly zeroes whole blocks — a burst-loss model that forces the
    ARQ layer to retransmit (BASELINE config 3: lossy audio channel)."""
    rng = np.random.RandomState(seed)

    def fn(x):
        x = np.array(x, np.float32, copy=True)
        for start in range(0, len(x), block):
            if rng.uniform() < drop_probability:
                x[start:start + block] = 0.0
        return x

    return fn


def make_device_awgn(noise_power: float):
    """Jittable on-device AWGN for DeviceFarmHub: same uniform noise
    model as ``awgn`` (amplitude sqrt(3*noise_power), reference
    fsk-demodulation.node.test.ts:1184-1205) but drawn with the JAX PRNG
    inside the hub's fused pump — the noisy frame never exists on the
    host.  Signature: fn(frame, key) -> frame."""
    import jax
    import jax.numpy as jnp

    amplitude = float(np.sqrt(3.0 * noise_power))

    def fn(frame, key):
        noise = jnp.float32(amplitude) * (
            jax.random.uniform(key, frame.shape, jnp.float32) * 2.0 - 1.0)
        return frame + noise

    return fn


def make_chain(*fns: Sequence[Callable]) -> Callable[[np.ndarray],
                                                     np.ndarray]:
    def chained(x):
        for f in fns:
            x = f(x)
        return x

    return chained
