"""Test env: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run on `--xla_force_host_platform_device_count=8`
CPU devices (the fake-backend capability the reference lacks, SURVEY.md §4).
"""

import os

# force CPU even when the session env preselects a TPU platform
# (JAX_PLATFORMS=axon): the suite runs on the virtual 8-device mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count=8" not in flags:
    # strip any OTHER preset count (e.g. =2 left over from a
    # jax.distributed debug session) — the suite NEEDS 8 devices
    flags = " ".join(t for t in flags.split()
                     if "host_platform_device_count" not in t)
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the integrator jits are expensive on CPU
# (minutes); cached across test runs they are milliseconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt_tests"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

# The session's TPU plugin registers itself from sitecustomize BEFORE this
# conftest runs and pins jax_platforms; env vars alone cannot undo that —
# override the config directly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound the live-executable count to ~one module's worth.

    The full suite accumulates hundreds of XLA:CPU executables; past a
    threshold the NEXT backend compile segfaults inside XLA (observed
    round 5 at test_sharding after ~150 tests — every sub-half of the
    suite passes, only the whole set crashes). Dropping compiled
    programs between modules keeps the process under the cliff; the
    persistent on-disk cache above makes the re-compiles cheap."""
    yield
    jax.clear_caches()
