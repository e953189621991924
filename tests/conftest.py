"""Test configuration: force an 8-device CPU mesh before JAX initialises.

Multi-chip TPU hardware is not available in CI; the standard JAX trick is a
virtual host-platform device count, which exercises the same pjit/Mesh code
paths (collectives and all) on CPU.
"""
import os

# The environment's site config force-sets JAX_PLATFORMS=axon (the TPU
# tunnel); override both the env var and the live config so tests run on the
# virtual CPU mesh even when the var is clobbered before we get here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache (shared with __graft_entry__): test programs
# are deterministic, so repeat suite runs — and the sharded serial runs used
# on 1-core rigs (tools/run_suite.py) — replay compiles from disk.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _knob, _value in (
        ("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")),
        ("jax_persistent_cache_min_compile_time_secs", 0.5),
        ("jax_persistent_cache_min_entry_size_bytes", 0)):
    try:
        jax.config.update(_knob, _value)
    except Exception:
        pass
assert jax.default_backend() == "cpu", "tests must run on the CPU mesh"
assert jax.device_count() == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
