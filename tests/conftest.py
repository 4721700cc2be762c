"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any `import jax` so the XLA client is created with 8 host
devices — this is how multi-chip sharding (dp/fsdp/tp) is exercised without
TPU hardware.
"""

import os

# zero-egress environment: make HF hub lookups fail immediately instead of
# retrying DNS for minutes
os.environ.setdefault("HF_HUB_OFFLINE", "1")

# Hermetic: never touch the user's persistent XLA compile cache. The CLI
# dispatch tests run intact_tpu.run.main() which otherwise enables it
# process-wide, and a cache entry half-written by a killed TPU bench run
# aborts the interpreter on deserialization ('Fatal Python error: Aborted'
# inside pjit) for every test that compiles afterwards.
os.environ.setdefault("INTACT_TPU_NO_COMPILE_CACHE", "1")

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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The suite holds hundreds of jitted programs by the time the trainer
    tests run; on the 1-core 8-virtual-device host the accumulated XLA
    executables eventually abort the interpreter ('Fatal Python error:
    Aborted' mid-pjit). Dropping caches between modules keeps the peak
    bounded; individual modules recompile what they need."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
