"""Platform selection helper.

In environments where a site hook imports jax before user code (e.g.
the axon TPU tunnel), setting ``JAX_PLATFORMS`` in the environment is
read too late; the platform must also be forced through the config.
Call this early in CLI entry points to make ``JAX_PLATFORMS=cpu python
examples/...`` behave as expected.
"""

from __future__ import annotations

import os


def ensure_env_platform() -> None:
    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platforms)
    except Exception:
        pass
