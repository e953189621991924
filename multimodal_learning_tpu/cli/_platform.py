"""Optional platform override for the CLI drivers.

``MML_PLATFORM=cpu`` forces the JAX backend (useful on dev rigs where the TPU
tunnel is shared/flaky, and for CI).  Must be imported before any jax use.
"""
import os


def apply_platform_override() -> None:
    plat = os.environ.get("MML_PLATFORM")
    if plat:
        os.environ["JAX_PLATFORMS"] = plat
        import jax
        jax.config.update("jax_platforms", plat)
