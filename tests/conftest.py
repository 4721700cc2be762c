"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any `import jax` so the XLA client is created with 8 host
devices — this is how multi-chip sharding (dp/fsdp/tp) is exercised without
TPU hardware.
"""

import os

# zero-egress environment: make HF hub lookups fail immediately instead of
# retrying DNS for minutes
os.environ.setdefault("HF_HUB_OFFLINE", "1")

# Force CPU: the host environment pins JAX_PLATFORMS=axon (a tunneled TPU
# whose first compile is slow) and its sitecustomize re-applies the platform
# through jax.config at interpreter start, so the env var alone is not
# enough — override the config too, before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
