"""Test configuration.

Runs every test on a virtual 8-device CPU mesh so sharding/collective logic
is exercised without TPU hardware (SURVEY.md section 4.3).

NOTE: this environment pre-imports jax via a sitecustomize on PYTHONPATH and
pre-exports JAX_PLATFORMS=axon (a TPU tunnel), so plain env vars are not
enough: the platform must be overridden through jax.config BEFORE the
backend initializes. XLA_FLAGS is still read lazily at backend init, so the
host-device-count flag does take effect from here.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Opt out of the CPU override with PATOLETTE_TEST_TPU=1 to run on hardware.
if not os.environ.get("PATOLETTE_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # No persistent compile cache under pytest: writing certain sharded
    # XLA:CPU executables segfaults in jax's cache writer late in the
    # suite (r4, flaky, full-suite state only), and cross-machine CPU AOT
    # entries can SIGILL on load. CPU compiles are cheap relative to both
    # failure modes; TPU benches keep their per-platform cache.
    os.environ.setdefault("PATOLETTE_NO_JIT_CACHE", "1")
    import jax

    jax.config.update("jax_platforms", "cpu")

# The library is dtype-polymorphic (f32 on TPU); tests validate the math at
# f64 against numpy oracles, which needs x64 enabled.
import jax as _jax

_jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_state_between_modules():
    """Free compiled executables after each test module.

    The suite compiles ~200 XLA:CPU programs; with all of them held live,
    late sharded (8-device) compiles segfault inside XLA
    (backend_compile_and_load / the cache writer — r4, flaky, full-suite
    runs only, never in isolation). Dropping executables between modules
    keeps the compiler's accumulated state small. Cross-module program
    reuse is minor, so the runtime cost is a few recompiles.
    """
    yield
    # our own caches hold references to jitted objects / device grids —
    # drop them so clear_caches can actually free the executables
    try:
        from patolette_tpu.ops import lut as _lut
        from patolette_tpu.parallel import mesh as _mesh

        _lut.clear_grid_cache()
        for _fn in (_mesh.quantize_palette_sharded, _mesh.saliency_sharded,
                    _mesh.dither_sharded, _mesh._ones_program):
            _fn.cache_clear()
    except Exception:
        pass
    _jax.clear_caches()
    gc.collect()
