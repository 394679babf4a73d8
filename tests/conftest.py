"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the role of MOM6's .testing harness host setup: tests must be
hardware-independent, and the sharding tests need multiple devices
(the CI/driver machines may only have one real chip).

The container's sitecustomize imports jax (registering the TPU tunnel
backend) at interpreter startup — *before* pytest loads this file — so
platform env vars set here are too late.  If we detect that situation we
re-exec pytest once with a corrected environment.
"""

import os
import sys

_WANT = {
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    # sitecustomize only hijacks jax when this is set
    "PALLAS_AXON_POOL_IPS": "",
    "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
}


def _needs_reexec() -> bool:
    if os.environ.get("MOM6_TPU_TEST_REEXEC") == "1":
        return False
    if "jax" in sys.modules:
        import jax
        try:
            return len(jax.devices()) < 8
        except Exception:
            return True
    return any(os.environ.get(k) != v for k, v in _WANT.items())


if _needs_reexec():
    env = dict(os.environ)
    env.update(_WANT)
    env["MOM6_TPU_TEST_REEXEC"] = "1"
    os.execvpe(sys.executable,
               [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

import jax  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Triage tiers: everything not explicitly marked ``slow`` is ``fast``
    (the <10-min tier; ``pytest -m fast``).  Heavy driver-level /
    compile-bound integration files opt into ``slow`` via pytestmark."""
    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def devices8():
    d = jax.devices()
    assert len(d) >= 8, f"expected 8 virtual devices, got {len(d)}"
    return d[:8]
