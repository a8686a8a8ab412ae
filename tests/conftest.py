"""Test configuration: force an 8-device CPU mesh before JAX initializes.

This is the standard JAX trick for exercising multi-chip sharding logic
without hardware; the driver separately dry-runs the multi-chip path.
"""

import os

# hard override: the session env may point JAX at a real accelerator, but the
# test suite must run on a deterministic 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep math comparable across machines
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"

# The container's sitecustomize imports jax at interpreter startup (to
# register the axon TPU backend), so jax has already captured
# JAX_PLATFORMS=axon from the env — os.environ edits above are too late for
# it. Override via jax.config, which works as long as no backend has been
# initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# compiles are ~1.3 s each on this host; cache them across pytest runs.
# Fresh r4 dir: the old one holds AOT entries with mismatched machine
# features and XLA logs a screenful of SIGILL warnings per load.
jax.config.update("jax_compilation_cache_dir", "/tmp/tcdiff_jax_cache_r4")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
