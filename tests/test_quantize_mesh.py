"""quantize(mesh=...) end-to-end on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

import patolette_tpu as pt
from patolette_tpu.parallel import mesh as PM


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return PM.make_mesh(jax.devices()[:8])


def _image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.1, 0.9, (6, 3))
    idx = rng.integers(0, 6, h * w)
    return np.clip(base[idx] + rng.normal(0, 0.03, (h * w, 3)), 0, 1)


def test_sharded_matches_single(mesh8):
    h, w = 64, 64
    colors = _image(h, w)
    common = dict(dither=False, tile_size=0, kmeans_niter=5)
    ok_s, pal_s, map_s, _ = pt.quantize(w, h, colors, 8, mesh=mesh8, **common)
    ok_1, pal_1, map_1, _ = pt.quantize(w, h, colors, 8, **common)
    assert ok_s and ok_1
    used_s = pal_s[pal_s[:, 0] >= 0]
    used_1 = pal_1[pal_1[:, 0] >= 0]
    assert len(used_s) == len(used_1)
    # palettes agree (sharded path uses the device f32 GQ DP, so compare
    # with tolerance after matching rows)
    for c in used_1:
        assert np.min(np.abs(used_s - c).sum(-1)) < 2e-2


def test_sharded_dither(mesh8):
    h, w = 64, 32
    colors = _image(h, w, seed=2)
    ok, pal, pmap, _ = pt.quantize(
        w, h, colors, 8, dither=True, tile_size=0, kmeans_niter=0,
        mesh=mesh8, dither_segment=64,
    )
    assert ok
    assert pmap.shape == (h * w,)
    assert (pal[np.unique(pmap)][:, 0] >= 0).all()


def test_mesh_fallback_on_indivisible(mesh8):
    h, w = 13, 11  # not divisible by 8
    colors = _image(h, w, seed=3)
    ok, pal, pmap, _ = pt.quantize(
        w, h, colors, 4, dither=False, tile_size=0, kmeans_niter=0,
        mesh=mesh8,
    )
    assert ok and pmap is not None


def test_sharded_saliency_weights(mesh8):
    h, w = 32, 32
    colors = _image(h, w, seed=4)
    ok, pal, pmap, _ = pt.quantize(
        w, h, colors, 8, dither=False, kmeans_niter=2, mesh=mesh8,
        tile_size=128,
    )
    assert ok and pmap is not None
