"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding tests work without
TPU hardware; this must be set before jax is first imported.
The benchmark (bench.py) runs on the real TPU and does not import this.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize hook imports jax before conftest runs, so the
# env var alone is not enough — force the platform via the config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (hundreds
# of distinct (config, chunk-shape) traces), so repeat runs skip most of
# the XLA:CPU compile wall time.
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/wam_jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import asyncio  # noqa: E402
import inspect  # noqa: E402

# Keep suite timing deterministic: no background calibration threads
# racing the tests' own jax work (test_signal_quality covers the warm
# path explicitly).
from webaudio_modem_tpu.ops import fsk_demod as _fsk_demod  # noqa: E402

_fsk_demod.AUTO_WARM_QUALITY = False


def pytest_pyfunc_call(pyfuncitem):
    """Run ``async def`` tests on a fresh event loop (no pytest-asyncio
    in this image)."""
    fn = pyfuncitem.obj
    if inspect.iscoroutinefunction(fn):
        kwargs = {name: pyfuncitem.funcargs[name]
                  for name in pyfuncitem._fixtureinfo.argnames}
        asyncio.run(fn(**kwargs))
        return True
    return None
