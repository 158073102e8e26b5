"""Palette-quality guardrails.

The CPU reference cannot be built in this environment (FLANN/Cython deps),
so quality is bounded from both sides instead (SURVEY.md section 4.1
metric-level parity):

  * our full pipeline must BEAT a plain unweighted numpy Lloyd KMeans from
    random init at equal palette size (Wu-style init + refinement should
    never lose to random-init KMeans), and
  * must come within a few percent of a strong oracle (numpy Lloyd started
    from OUR palette, run to convergence) — i.e. our result sits near a
    local optimum of the same objective the reference optimizes.
"""

import numpy as np
import pytest

import patolette_tpu as pt
from patolette_tpu.ops import colorspace as cs


def _image(seed=0, n=128 * 128):
    rng = np.random.default_rng(seed)
    # mixture of gaussians + gradient, mimicking natural-image clustering
    k = 12
    means = rng.uniform(0.1, 0.9, (k, 3))
    idx = rng.integers(0, k, n)
    img = means[idx] + rng.normal(0, 0.05, (n, 3))
    ramp = np.linspace(0, 0.15, n)[:, None]
    return np.clip(img + ramp, 0, 1)


def _mse_luv(colors, palette, pmap):
    a = np.asarray(cs.srgb_to_cieluv(colors))
    b = np.asarray(cs.srgb_to_cieluv(np.clip(palette, 0, 1)))[pmap]
    return float(((a - b) ** 2).sum(-1).mean())


def _palette_mse_luv(colors, palette):
    """Palette quality in isolation: NN map in CIELuv.

    The pipeline's palette_map runs in ICtCp (reference semantics, Q4),
    which inflates a CIELuv-scored MSE; mapping in Luv isolates the palette
    itself for fair comparison against Luv-objective baselines."""
    luv = np.asarray(cs.srgb_to_cieluv(colors))
    pw = np.asarray(cs.srgb_to_cieluv(np.clip(palette[palette[:, 0] >= 0], 0, 1)))
    d = ((luv[:, None, :] - pw[None, :, :]) ** 2).sum(-1)
    return float(d.min(-1).mean())


def _np_lloyd(x, k, iters, seed=0, init=None):
    rng = np.random.default_rng(seed)
    c = x[rng.choice(len(x), k, replace=False)] if init is None else init.copy()
    for _ in range(iters):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        a = d.argmin(-1)
        for j in range(k):
            if (a == j).any():
                c[j] = x[a == j].mean(0)
    d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    return c, d.argmin(-1)


@pytest.mark.parametrize("palette_size", [16, 64])
def test_beats_random_init_kmeans(palette_size):
    colors = _image()
    ok, pal, pmap, msg = pt.quantize(
        128, 128, colors, palette_size,
        dither=False, tile_size=0, kmeans_niter=25,
        color_space=pt.ColorSpace_CIELuv,
    )
    assert ok, msg
    ours = _palette_mse_luv(colors, pal)

    luv = np.asarray(cs.srgb_to_cieluv(colors))
    best_base = np.inf
    for seed in range(2):
        c, a = _np_lloyd(luv, palette_size, 25, seed=seed)
        base = float(((luv - c[a]) ** 2).sum(-1).mean())
        best_base = min(best_base, base)

    assert ours <= best_base * 1.02

    # the delivered (ICtCp-mapped) MSE stays within a bounded perceptual-
    # tradeoff factor of the Luv-optimal mapping (grows with palette size)
    delivered = _mse_luv(colors, pal, pmap)
    assert delivered <= ours * 2.0


def test_near_local_optimum():
    colors = _image(seed=3)
    ok, pal, pmap, _ = pt.quantize(
        128, 128, colors, 32, dither=False, tile_size=0, kmeans_niter=25,
        color_space=pt.ColorSpace_CIELuv,
    )
    assert ok
    ours = _palette_mse_luv(colors, pal)

    luv = np.asarray(cs.srgb_to_cieluv(colors))
    init = np.asarray(cs.srgb_to_cieluv(np.clip(pal[pal[:, 0] >= 0], 0, 1)))
    c, a = _np_lloyd(luv, len(init), 50, init=init)
    refined = float(((luv - c[a]) ** 2).sum(-1).mean())
    assert ours <= refined * 1.05


def test_lq_sampling_quality_neutral():
    """GQ/LQ subsampling (divergence S1) must not change quality
    meaningfully."""
    colors = _image(seed=5, n=1 << 16)
    common = dict(dither=False, tile_size=0, kmeans_niter=16,
                  color_space=pt.ColorSpace_CIELuv)
    ok1, pal1, map1, _ = pt.quantize(256, 256, colors, 64,
                                     lq_max_samples=0, **common)
    ok2, pal2, map2, _ = pt.quantize(256, 256, colors, 64,
                                     lq_max_samples=1 << 14, **common)
    assert ok1 and ok2
    m1 = _palette_mse_luv(colors, pal1)
    m2 = _palette_mse_luv(colors, pal2)
    # subsampled palette search within 2% MSE of full-data search
    assert m2 <= m1 * 1.02 + 0.5
