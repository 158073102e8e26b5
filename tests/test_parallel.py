"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md section 4.3): k-shard results must match 1-shard results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patolette_tpu.models import pipeline as PIPE
from patolette_tpu.parallel import mesh as PM


def _image(n=8192, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.1, 0.9, size=(8, 3))
    idx = rng.integers(0, 8, n)
    c = np.clip(base[idx] + rng.normal(0, 0.04, (n, 3)), 0, 1)
    return c.astype(np.float32)


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return PM.make_mesh(jax.devices()[:8])


class TestShardedPalette:
    def test_matches_single_device(self, mesh8):
        colors = _image()
        w = np.ones(len(colors), np.float32)

        fn = PM.quantize_palette_sharded(mesh8, 16, color_space=1,
                                         kmeans_niter=0)
        pal_s, valid_s, map_s = fn(
            PM.shard_pixels(jnp.asarray(colors), mesh8),
            PM.shard_pixels(jnp.asarray(w), mesh8),
        )

        pal_1, valid_1, map_1 = jax.jit(
            lambda c, wt: PIPE.palette_pipeline_device(
                c, wt, 16, color_space=1, kmeans_niter=0
            )
        )(jnp.asarray(colors), jnp.asarray(w))

        assert np.asarray(valid_s).sum() == np.asarray(valid_1).sum()
        vs = np.asarray(valid_s)
        np.testing.assert_allclose(
            np.asarray(pal_s)[vs], np.asarray(pal_1)[vs], rtol=5e-4, atol=5e-4
        )
        agree = (np.asarray(map_s) == np.asarray(map_1)).mean()
        assert agree > 0.999

    def test_with_kmeans(self, mesh8):
        colors = _image(seed=2)
        w = np.ones(len(colors), np.float32)
        fn = PM.quantize_palette_sharded(mesh8, 8, color_space=2,
                                         kmeans_niter=5)
        pal, valid, pmap = fn(
            PM.shard_pixels(jnp.asarray(colors), mesh8),
            PM.shard_pixels(jnp.asarray(w), mesh8),
        )
        assert np.asarray(valid).sum() >= 1
        assert np.isfinite(np.asarray(pal)[np.asarray(valid)]).all()

    def test_weighted_sharded(self, mesh8):
        colors = _image(seed=3)
        w = np.concatenate(
            [np.full(len(colors) // 2, 30.0),
             np.ones(len(colors) - len(colors) // 2)]
        ).astype(np.float32)
        fn = PM.quantize_palette_sharded(mesh8, 8, color_space=1)
        pal_s, valid_s, _ = fn(
            PM.shard_pixels(jnp.asarray(colors), mesh8),
            PM.shard_pixels(jnp.asarray(w), mesh8),
        )
        pal_1, valid_1, _ = jax.jit(
            lambda c, wt: PIPE.palette_pipeline_device(
                c, wt, 8, color_space=1
            )
        )(jnp.asarray(colors), jnp.asarray(w))
        vs = np.asarray(valid_s)
        np.testing.assert_allclose(
            np.asarray(pal_s)[vs], np.asarray(pal_1)[vs], rtol=1e-3, atol=1e-3
        )


class TestShardedDither:
    def test_runs_and_covers_strips(self, mesh8):
        h, wdt = 64, 64
        rng = np.random.default_rng(1)
        colors = rng.uniform(0, 1, (h * wdt, 3)).astype(np.float32)
        pal = rng.uniform(0, 1, (8, 3)).astype(np.float32)
        fn = PM.dither_sharded(mesh8, wdt, h, color_space=0, segment=0)
        pmap = fn(
            PM.shard_pixels(jnp.asarray(colors), mesh8),
            jnp.asarray(pal),
            jnp.ones(8, bool),
        )
        pmap = np.asarray(pmap)
        assert pmap.shape == (h * wdt,)
        assert set(np.unique(pmap)).issubset(set(range(8)))
