"""Moment accumulation vs naive numpy (SURVEY.md section 4.2)."""

import numpy as np

from patolette_tpu.ops import moments as M


def _data(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    colors = rng.uniform(-50, 100, size=(n, 3)).astype(np.float32)
    weights = rng.uniform(1, 5, size=(n,)).astype(np.float32)
    ids = rng.integers(0, 17, size=(n,)).astype(np.int32)
    return colors, weights, ids


def _naive_moments(colors, weights, ids, num_segments, shift=None):
    x = colors.astype(np.float64)
    if shift is not None:
        x = x - shift
    w = np.ones(len(x)) if weights is None else weights.astype(np.float64)
    out = np.zeros((num_segments, 11))
    for s in range(num_segments):
        m = ids == s
        xs, ws = x[m], w[m]
        out[s, 0] = ws.sum()
        out[s, 1:4] = (ws[:, None] * xs).sum(0)
        out[s, 4] = (ws * (xs**2).sum(-1)).sum()
        prods = np.einsum("n,ni,nj->ij", ws, xs, xs)
        out[s, 5:11] = [
            prods[0, 0], prods[0, 1], prods[0, 2],
            prods[1, 1], prods[1, 2], prods[2, 2],
        ]
    return out


class TestSegmentMoments:
    def test_matches_naive(self):
        colors, weights, ids = _data()
        ours = np.asarray(M.segment_moments(colors, ids, 17, weights=weights))
        ref = _naive_moments(colors, weights, ids, 17)
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-2)

    def test_unweighted(self):
        colors, _, ids = _data()
        ours = np.asarray(M.segment_moments(colors, ids, 17))
        ref = _naive_moments(colors, None, ids, 17)
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-2)

    def test_chunked_equals_single(self):
        colors, weights, ids = _data(4096)
        a = np.asarray(M.segment_moments(colors, ids, 17, weights=weights, chunk=300))
        b = np.asarray(M.segment_moments(colors, ids, 17, weights=weights, chunk=8192))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-3)

    def test_shifted(self):
        colors, weights, ids = _data()
        shift = colors.mean(0)
        ours = np.asarray(
            M.segment_moments(colors, ids, 17, weights=weights, shift=shift)
        )
        ref = _naive_moments(colors, weights, ids, 17, shift=shift)
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-2)

    def test_total(self):
        colors, weights, _ = _data()
        ours = np.asarray(M.total_moments(colors, weights=weights))
        ids = np.zeros(len(colors), np.int32)
        ref = _naive_moments(colors, weights, ids, 1)[0]
        np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=1e-1)


class TestMomentQueries:
    def test_center_distortion_cov(self):
        colors, weights, ids = _data()
        m = M.segment_moments(colors, ids, 17, weights=weights)
        center = np.asarray(M.moments_center(m))
        dist = np.asarray(M.moments_distortion(m))
        cov = np.asarray(M.moments_cov(m))
        x, w = colors.astype(np.float64), weights.astype(np.float64)
        for s in range(17):
            sel = ids == s
            xs, ws = x[sel], w[sel]
            mu = (ws[:, None] * xs).sum(0) / ws.sum()
            np.testing.assert_allclose(center[s], mu, rtol=1e-4, atol=1e-3)
            d = (ws * ((xs - mu) ** 2).sum(-1)).sum()
            np.testing.assert_allclose(dist[s], d, rtol=2e-3, atol=1.0)
            c = np.einsum("n,ni,nj->ij", ws, xs - mu, xs - mu) / ws.sum()
            np.testing.assert_allclose(cov[s], c, rtol=2e-3, atol=0.5)

    def test_empty_segment(self):
        colors, weights, ids = _data()
        ids = np.clip(ids, 0, 10)
        m = M.segment_moments(colors, ids, 17, weights=weights)
        assert float(np.asarray(M.moments_distortion(m))[16]) == 0.0
        np.testing.assert_allclose(np.asarray(M.moments_cov(m))[16], 0.0)

    def test_shift_invariance(self):
        colors, weights, ids = _data()
        shift = np.array([30.0, -20.0, 55.0], np.float32)
        m0 = M.segment_moments(colors, ids, 17, weights=weights)
        m1 = M.segment_moments(colors, ids, 17, weights=weights, shift=shift)
        np.testing.assert_allclose(
            np.asarray(M.moments_distortion(m0)),
            np.asarray(M.moments_distortion(m1)),
            rtol=5e-3, atol=1.0,
        )
        np.testing.assert_allclose(
            np.asarray(M.moments_cov(m0)),
            np.asarray(M.moments_cov(m1)),
            rtol=5e-3, atol=0.5,
        )


class TestBucketize:
    def test_uniform_range(self):
        proj = np.linspace(0.0, 1.0, 1024).astype(np.float32)
        b = np.asarray(M.bucketize(proj, 512, proj.min(), proj.max()))
        assert b.min() == 0 and b.max() == 511
        assert np.all(np.diff(b) >= 0)

    def test_matches_reference_formula(self):
        rng = np.random.default_rng(7)
        proj = rng.normal(size=2048).astype(np.float32)
        pmin, pmax = np.float32(proj.min()), np.float32(proj.max())
        b = np.asarray(M.bucketize(proj, 512, pmin, pmax))
        s = 1.0 / (pmax - pmin)
        ref = np.minimum((512 * ((proj - pmin) * s)).astype(np.int64), 511)
        assert (b == ref).mean() > 0.999  # f32 boundary ties allowed

    def test_degenerate_round_robin(self):
        proj = np.full(1300, 3.25, np.float32)
        b = np.asarray(M.bucketize(proj, 512, np.float32(3.25), np.float32(3.25)))
        ref = np.arange(1300) % 512
        np.testing.assert_array_equal(b, ref)

    def test_degenerate_masked(self):
        proj = np.zeros(10, np.float32)
        mask = np.array([1, 0, 1, 1, 0, 1, 1, 1, 0, 1], bool)
        b = np.asarray(M.bucketize(proj, 4, np.float32(0), np.float32(0), mask=mask))
        assert list(b[mask]) == [0, 1, 2, 3, 0, 1, 2]
