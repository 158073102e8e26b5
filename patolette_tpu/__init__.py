"""patolette-tpu: a TPU-native color quantization + dithering engine.

Brand-new JAX/XLA/Pallas implementation with the full capability set of the
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

from patolette_tpu.utils.config import (  # noqa: F401
    ColorSpace,
    ColorSpace_CIELuv,
    ColorSpace_ICtCp,
    ColorSpace_sRGB,
    QuantizeOptions,
    default_options,
)
from patolette_tpu.utils.errors import ExitCode, exit_code_message  # noqa: F401
from patolette_tpu.models.pipeline import quantize  # noqa: F401

__version__ = "0.1.0"

__all__ = [
    "quantize",
    "ColorSpace",
    "ColorSpace_sRGB",
    "ColorSpace_CIELuv",
    "ColorSpace_ICtCp",
    "QuantizeOptions",
    "default_options",
    "ExitCode",
    "exit_code_message",
]
