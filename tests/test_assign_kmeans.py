"""Assignment kernel + weighted KMeans vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from patolette_tpu.ops.assign import assign
from patolette_tpu.models import kmeans as KM


def _data(n=3000, k=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-50, 50, size=(k, 3))
    x = centers[rng.integers(0, k, n)] + rng.normal(0, 1.0, size=(n, 3))
    w = rng.uniform(1, 4, size=(n,))
    return x.astype(np.float64), w.astype(np.float64), centers.astype(np.float64)


class TestAssign:
    def test_matches_numpy(self):
        x, _, c = _data()
        ours = np.asarray(assign(jnp.asarray(x), jnp.asarray(c)))
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        ref = d.argmin(-1)
        np.testing.assert_array_equal(ours, ref)

    def test_chunked(self):
        x, _, c = _data(5000)
        a = np.asarray(assign(jnp.asarray(x), jnp.asarray(c), chunk=512))
        b = np.asarray(assign(jnp.asarray(x), jnp.asarray(c), chunk=8192))
        np.testing.assert_array_equal(a, b)

    def test_valid_mask(self):
        x, _, c = _data(k=8)
        valid = jnp.asarray(np.array([1, 0, 1, 0, 1, 1, 0, 1], bool))
        ours = np.asarray(assign(jnp.asarray(x), jnp.asarray(c), valid=valid))
        assert set(np.unique(ours)).issubset({0, 2, 4, 5, 7})

    def test_distances(self):
        x, _, c = _data(100)
        labels, dists = assign(
            jnp.asarray(x), jnp.asarray(c), with_distances=True
        )
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(
            np.asarray(dists), d.min(-1), rtol=1e-8, atol=1e-8
        )


def _np_weighted_lloyd(x, w, centers, niter):
    c = centers.copy()
    k = len(c)
    for _ in range(niter):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        a = d.argmin(-1)
        for j in range(k):
            m = a == j
            if m.sum():
                c[j] = (w[m, None] * x[m]).sum(0) / w[m].sum()
    return c


class TestKMeans:
    def test_matches_numpy_lloyd(self):
        x, w, c0 = _data(n=4000, k=8, seed=2)
        ours = np.asarray(
            KM.lloyd_iterations(
                jnp.asarray(x), jnp.asarray(w), jnp.asarray(c0),
                jnp.ones(8, bool), 10,
            )
        )
        ref = _np_weighted_lloyd(x, w, c0, 10)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)

    def test_unweighted(self):
        x, _, c0 = _data(n=2000, k=6, seed=3)
        ours = np.asarray(
            KM.lloyd_iterations(
                jnp.asarray(x), None, jnp.asarray(c0), jnp.ones(6, bool), 5
            )
        )
        ref = _np_weighted_lloyd(x, np.ones(len(x)), c0, 5)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)

    def test_empty_cluster_split(self):
        rng = np.random.default_rng(4)
        x = rng.normal(0, 1, size=(500, 3))
        # one center far away => empty; must get re-seeded near the data
        c0 = np.array([[0.0, 0, 0], [1000.0, 1000, 1000]])
        out = np.asarray(
            KM.lloyd_iterations(
                jnp.asarray(x), None, jnp.asarray(c0), jnp.ones(2, bool), 5
            )
        )
        assert np.all(np.abs(out) < 100.0)

    def test_invalid_slots_untouched(self):
        x, w, c0 = _data(n=1000, k=4)
        cpad = np.vstack([c0, np.full((2, 3), -1.0)])
        valid = jnp.asarray(np.array([1, 1, 1, 1, 0, 0], bool))
        out = np.asarray(
            KM.lloyd_iterations(
                jnp.asarray(x), jnp.asarray(w), jnp.asarray(cpad), valid, 5
            )
        )
        np.testing.assert_array_equal(out[4:], cpad[4:])

    def test_subsample_cap(self):
        # refine.c:87: max(max_samples, 256^2) // k * k
        assert KM.subsample_cap(256, 512**2) == (512**2 // 256) * 256
        assert KM.subsample_cap(256, 1000) == (256 * 256 // 256) * 256

    def test_refine_reduces_sse(self):
        x, w, c0 = _data(n=5000, k=8, seed=5)
        # perturb the true centers
        start = c0 + np.random.default_rng(6).normal(0, 3.0, c0.shape)
        out = np.asarray(
            KM.refine_palette(
                jnp.asarray(x), jnp.asarray(w), jnp.asarray(start),
                jnp.ones(8, bool), 8, 25, 512**2, 1234,
            )
        )

        def sse(c):
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            return (w * d.min(-1)).sum()

        assert sse(out) < sse(start) * 0.9
