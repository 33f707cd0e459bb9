"""Test configuration: run on a simulated 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices (the JAX analogue of a fake backend;
see SURVEY.md section 4, item 4). Must run before jax is imported.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the single real TPU
# chip; unit tests must run on the virtual 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Installed pytest plugins (jaxtyping) import jax BEFORE this conftest runs, so
# the env var alone is too late; the config update below still takes effect
# because no backend has been initialized yet at collection time.
import jax

jax.config.update("jax_platforms", "cpu")
