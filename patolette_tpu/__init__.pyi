import numpy as np
from typing import Optional, Tuple

from patolette_tpu.utils.config import (
    ColorSpace as ColorSpace,
    QuantizeOptions as QuantizeOptions,
    default_options as default_options,
)
from patolette_tpu.utils.errors import (
    ExitCode as ExitCode,
    exit_code_message as exit_code_message,
)

ColorSpace_CIELuv: ColorSpace
ColorSpace_ICtCp: ColorSpace
ColorSpace_sRGB: ColorSpace

__version__: str

def quantize(
    width: int,
    height: int,
    colors: np.ndarray,
    palette_size: int,
    dither: bool = ...,
    palette_only: bool = ...,
    color_space: ColorSpace = ...,
    tile_size: float = ...,
    kmeans_niter: int = ...,
    kmeans_max_samples: int = ...,
    verbose: bool = ...,
    *,
    weights: Optional[np.ndarray] = ...,
    lq_max_samples: int = ...,
    lq_batch_splits: int = ...,
    dither_segment: int = ...,
    seed: int = ...,
    mesh: Optional[object] = ...,
) -> Tuple[bool, Optional[np.ndarray], Optional[np.ndarray], str]:
    """Quantizes color data.

    :param width: The width of the source image.
    :param height: The height of the source image.
    :param colors:
        A (width * height, 3) array of sRGB colors, scanned left-to-right,
        top-to-bottom: float in [0, 1] (reference convention) or uint8 in
        [0, 255] (TPU extension — 8-bit images cross the host->device
        link at 1/4 the bytes).
    :param palette_size: The desired palette size.
    :param dither: Whether dithering should be used. Default: True.
    :param palette_only:
        When True, only a color palette is generated and palette mapping is
        omitted. Default: False.
    :param color_space:
        Color space used for palette generation; dithering always runs in
        linear Rec2020, nearest-neighbour mapping in ICtCp.
        Default: ICtCp.
    :param tile_size:
        Saliency weighting control in [0, inf]; > 0 computes a saliency map
        and upweights visually striking areas (smaller => stronger).
        Default: 512.
    :param kmeans_niter:
        KMeans refinement iterations; <= 0 disables refinement.
        Default: 32.
    :param kmeans_max_samples:
        Maximum samples for KMeans refinement (hard minimum 256 ** 2).
        Default: 512 ** 2.
    :param verbose: Whether to print progress. Default: False.
    :param weights:
        TPU extension: explicit per-pixel weights in [1, inf); bypasses
        saliency (mirrors the reference C API).
    :param lq_max_samples:
        TPU extension: sampling cap for the GQ/LQ palette-search stages
        (0 = no cap). Default: 262144.
    :param lq_batch_splits:
        TPU extension: clusters split per LQ round (1 = reference-exact
        sequential greedy). Default: 8.
    :param dither_segment:
        TPU extension: Hilbert-curve segment length for the parallel dither
        scan (0 = fully serial). Default: 4096.
    :param seed: TPU extension: PRNG seed for sampling. Default: 1234.
    :param mesh:
        TPU extension: a 1-D ``jax.sharding.Mesh`` — runs the sharded
        pipeline (psum'd moments, per-strip saliency/dither) with pixels
        row-sharded over the mesh devices.
    :return:
        (success, palette, palette_map, message); palette is
        (palette_size, 3) sRGB[0, 1] with [-1, -1, -1] rows for unused
        slots, palette_map is int32 of length width * height (None when
        palette_only).
    """
    ...
