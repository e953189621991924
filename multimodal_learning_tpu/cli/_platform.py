"""Optional platform override for the CLI drivers (TPU-build addition;
the reference has no backend switch — it hardcodes `.cuda()`,
``MICCAI-2022/train_test_MT.py:53``).

``MML_PLATFORM=cpu`` forces the JAX backend (useful on dev rigs where the TPU
tunnel is shared/flaky, and for CI).  Must be imported before any jax use.

For CPU drives it also points JAX's persistent compilation cache at the
repo's ``.jax_cache/`` (same dir as ``tests/conftest.py`` and
``__graft_entry__.py``), so repeat CLI drives — the synthetic sweep, the
verify recipes — skip recompiles of the identical tiny programs.  TPU runs
are left uncached: a stale cross-host AOT entry through the tunnel can
SIGILL, and only ``__graft_entry__`` carries the no-cache retry for that.
``MML_NO_COMPILE_CACHE=1`` disables it.
"""
import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def apply_platform_override() -> None:
    plat = os.environ.get("MML_PLATFORM")
    if plat:
        import jax
        os.environ["JAX_PLATFORMS"] = plat
        jax.config.update("jax_platforms", plat)
        if plat == "cpu" and not os.environ.get("MML_NO_COMPILE_CACHE"):
            jax.config.update("jax_compilation_cache_dir",
                              os.path.join(_REPO, ".jax_cache"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
