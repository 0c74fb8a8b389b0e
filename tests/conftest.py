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

# NO persistent compilation cache for the suite.  It was enabled in
# round 2 (the suite is compile-dominated), but with round 3's test
# volume the process reproducibly DIED inside the cache machinery —
# SIGABRT in backend.deserialize_executable on re-reads after cpp-cache
# eviction, and SIGSEGV in serialize on write — always in
# jax/_src/compilation_cache.py, three runs, three different entries.
# The native deframer was ruled out with an ASan-instrumented build
# (fuzz suite clean); the crashes are in jaxlib's XLA:CPU executable
# (de)serialization under heavy compile churn.  Correctness over
# speed: cold compiles cost ~2x wall time but never crash.

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
