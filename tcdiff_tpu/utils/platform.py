"""Platform forcing for one-off CLI runs.

In this container `JAX_PLATFORMS=cpu` as an environment variable does NOT
take effect: sitecustomize initializes the axon TPU plugin before user code
runs, so the only reliable override is `jax.config.update("jax_platforms",
...)` before first backend use (tests/conftest.py and bench.py already do
this). `TCDIFF_PLATFORM={cpu,tpu,...}` gives the CLIs the same escape
hatch — without it, a "quick local" `cli.train --synthetic` run silently
grabs the single TPU chip and collides with a measurement campaign (two
concurrent axon clients are unsupported; observed 2026-08-19).
"""

from __future__ import annotations

import os


def apply_platform_env(env_var: str = "TCDIFF_PLATFORM") -> str | None:
    """Force the JAX platform from `env_var` if set. Call before any JAX
    backend initialization. Returns the forced platform (or None)."""
    plat = os.environ.get(env_var, "").strip().lower()
    if not plat:
        return None
    import jax

    jax.config.update("jax_platforms", plat)
    return plat
