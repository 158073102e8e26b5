"""patolette-tpu: a TPU-native color quantization + dithering engine.

Brand-new JAX/XLA implementation with the full capability set of the
CPU reference library *patolette* (weighted Wu PCA quantization with
non-axis-aligned principal-axis splits, CIEL*u*v* / ICtCp / sRGB working
spaces, minimum-barrier-distance saliency weighting, weighted KMeans palette
refinement, Riemersma Hilbert-curve error-diffusion dithering), re-designed
for TPU: pixels are sharded HBM-resident arrays, every cluster/bucket
statistic is a weighted moment matmul on the MXU, nearest-neighbour search is
a distance-matrix argmin instead of kd-trees, and multi-host scaling rides
``jax.sharding`` collectives.

Public API mirrors the reference package facade
(/root/reference/src/patolette/__init__.py, __init__.pyi):

    from patolette_tpu import quantize, ColorSpace_sRGB, ColorSpace_CIELuv, ColorSpace_ICtCp
"""

import os as _os

# Persistent compilation cache: the LQ/dither programs are large (minutes of
# XLA/Mosaic compile time per new shape); caching them across processes is
# essential for interactive use. Opt out with PATOLETTE_NO_JIT_CACHE=1 or
# override the location with JAX_COMPILATION_CACHE_DIR.
if not _os.environ.get("PATOLETTE_NO_JIT_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/patolette_tpu/jax"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from patolette_tpu.utils.config import (  # noqa: F401
    ColorSpace,
    ColorSpace_CIELuv,
    ColorSpace_ICtCp,
    ColorSpace_sRGB,
    QuantizeOptions,
    default_options,
)
from patolette_tpu.utils.errors import ExitCode, exit_code_message  # noqa: F401
from patolette_tpu.models.pipeline import quantize, quantize_options  # noqa: F401

__version__ = "0.1.0"

__all__ = [
    "quantize",
    "quantize_options",
    "ColorSpace",
    "ColorSpace_sRGB",
    "ColorSpace_CIELuv",
    "ColorSpace_ICtCp",
    "QuantizeOptions",
    "default_options",
    "ExitCode",
    "exit_code_message",
]
