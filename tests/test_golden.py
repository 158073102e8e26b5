"""Golden-output pins: exact expected palettes for fixed configs.

The parity battery (test_parity_ref.py) gates RATIOS against a same-author
oracle, so a regression that shifts both pipelines' shared assumptions — or
hides inside the battery's ~±6% per-case scatter — is invisible to it
(VERDICT r3 weak #6). These tests pin the actual f64 sRGB palettes (and the
palette-map histogram) of four fixed configs to committed arrays, at
tolerances tight enough that a single-bucket LQ off-by-one or a moment-sign
slip fails the suite.

Regenerate after a DELIBERATE behavior change with:

    python tests/test_golden.py --regen

and justify the new goldens in the commit message. Tests run on the CPU
backend (conftest forces cpu + x64), so the values are deterministic.
"""

import pathlib
import sys

if __name__ == "__main__":
    # direct execution (--regen): mirror conftest's backend setup BEFORE
    # importing the package (jax is pre-imported on the axon TPU platform)
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

import patolette_tpu as pt

GOLDEN_PATH = pathlib.Path(__file__).parent / "golden" / "quantize_golden.npz"


def _image(w=96, h=64, seed=11):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.stack(
        [
            0.5 + 0.45 * np.sin(xx / 9.0) * np.cos(yy / 13.0),
            0.5 + 0.45 * np.cos(xx / 17.0),
            np.clip(yy / h + 0.08 * rng.standard_normal((h, w)), 0, 1),
        ],
        axis=-1,
    )
    return np.clip(img, 0, 1).reshape(-1, 3)


# name -> (kwargs, uses_pmap)
CONFIGS = {
    "cieluv_plain": dict(
        palette_size=32, dither=False, tile_size=0, kmeans_niter=0,
        color_space=pt.ColorSpace_CIELuv,
    ),
    "ictcp_kmeans8": dict(
        palette_size=24, dither=False, tile_size=0, kmeans_niter=8,
        color_space=pt.ColorSpace_ICtCp,
    ),
    "srgb_saliency": dict(
        palette_size=16, dither=False, tile_size=256, kmeans_niter=0,
        color_space=pt.ColorSpace_sRGB,
    ),
    "ictcp_dither": dict(
        palette_size=16, dither=True, tile_size=0, kmeans_niter=4,
        color_space=pt.ColorSpace_ICtCp,
    ),
}


def _run(name):
    kw = dict(CONFIGS[name])
    p = kw.pop("palette_size")
    colors = _image()
    ok, pal, pmap, msg = pt.quantize(96, 64, colors, p, verbose=False, **kw)
    assert ok, msg
    hist = np.bincount(pmap, minlength=p) if pmap is not None else None
    return pal, hist


def regen():
    out = {}
    for name in CONFIGS:
        pal, hist = _run(name)
        out[f"{name}__palette"] = pal
        if hist is not None:
            out[f"{name}__hist"] = hist
    GOLDEN_PATH.parent.mkdir(exist_ok=True)
    np.savez_compressed(GOLDEN_PATH, **out)
    print(f"wrote {GOLDEN_PATH} ({len(out)} arrays)")


@pytest.fixture(scope="module")
def golden():
    if not GOLDEN_PATH.exists():
        pytest.fail(
            "golden file missing — run `python tests/test_golden.py --regen`"
        )
    return np.load(GOLDEN_PATH)


@pytest.mark.parametrize("name", list(CONFIGS))
def test_golden_palette(name, golden):
    pal, hist = _run(name)
    expect = golden[f"{name}__palette"]
    # f32-compute tolerance: the pipeline is f32 on device, so allow a few
    # ulp of f32 noise; any algorithmic change (one bucket, one iteration,
    # one sign) moves palette entries by >> 1e-3.
    np.testing.assert_allclose(pal, expect, atol=5e-5, rtol=0)
    if hist is not None:
        ehist = golden[f"{name}__hist"]
        # palette-map stability: identical assignment histogram
        np.testing.assert_array_equal(hist, ehist)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        regen()
    else:
        print(__doc__)
