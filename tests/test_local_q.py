"""LQ tests: blob recovery, stop condition, weighting, degenerate input."""

import numpy as np
import jax.numpy as jnp

from patolette_tpu.models import local_q as LQ
from patolette_tpu.models import palette as PAL


def _blobs(means, spread=0.5, per=400, seed=0):
    rng = np.random.default_rng(seed)
    pts, gid = [], []
    for i, m in enumerate(means):
        pts.append(rng.normal(m, spread, size=(per, 3)))
        gid.append(np.full(per, i))
    order = rng.permutation(len(means) * per)
    return (
        np.concatenate(pts)[order].astype(np.float32),
        np.concatenate(gid)[order],
    )


MEANS4 = [(0, 0, 0), (50, 0, 0), (0, 60, 0), (0, 0, 70)]


class TestLQ:
    def test_recovers_four_blobs(self):
        colors, gid = _blobs(MEANS4)
        labels0 = jnp.zeros(len(colors), jnp.int32)
        labels, count = LQ.lq_quantize(
            jnp.asarray(colors), None, labels0, 1, 4
        )
        labels, count = np.asarray(labels), int(count)
        assert count == 4
        # every ground-truth blob is (almost) pure in one label
        for g in range(4):
            vals, cnts = np.unique(labels[gid == g], return_counts=True)
            assert cnts.max() / cnts.sum() > 0.99
        centers, mass = PAL.centers_from_labels(
            jnp.asarray(colors), None, jnp.asarray(labels), 4
        )
        centers = np.asarray(centers)
        found = sorted(tuple(np.round(c)) for c in centers)
        expected = sorted(tuple(map(float, m)) for m in MEANS4)
        for f, e in zip(found, expected):
            assert np.linalg.norm(np.array(f) - np.array(e)) < 2.0

    def test_stop_on_zero_benefit(self):
        colors = np.full((500, 3), 7.0, np.float32)
        labels0 = jnp.zeros(500, jnp.int32)
        labels, count = LQ.lq_quantize(jnp.asarray(colors), None, labels0, 1, 8)
        assert int(count) == 1

    def test_multi_init_clusters(self):
        colors, gid = _blobs(MEANS4)
        # seed with the true split between blob {0,1} and {2,3}
        labels0 = jnp.asarray((gid >= 2).astype(np.int32))
        labels, count = LQ.lq_quantize(
            jnp.asarray(colors), None, labels0, 2, 4
        )
        assert int(count) == 4

    def test_weights_pull_splits(self):
        """Heavily weighted blob receives more palette entries
        (SURVEY.md section 4.4 weight monotonicity)."""
        rng = np.random.default_rng(1)
        a = rng.normal((0, 0, 0), 3.0, size=(2000, 3))
        b = rng.normal((100, 0, 0), 3.0, size=(2000, 3))
        colors = np.concatenate([a, b]).astype(np.float32)
        w_hi = np.concatenate(
            [np.full(2000, 100.0), np.ones(2000)]
        ).astype(np.float32)
        labels0 = jnp.zeros(4000, jnp.int32)
        labels, count = LQ.lq_quantize(
            jnp.asarray(colors), jnp.asarray(w_hi), labels0, 1, 6
        )
        labels = np.asarray(labels)
        # count labels used by each blob
        la = len(np.unique(labels[:2000]))
        lb = len(np.unique(labels[2000:]))
        assert la > lb

    def test_fewer_pixels_than_palette(self):
        colors = np.array(
            [[0, 0, 0], [10, 0, 0], [0, 10, 0]], np.float32
        )
        labels0 = jnp.zeros(3, jnp.int32)
        labels, count = LQ.lq_quantize(jnp.asarray(colors), None, labels0, 1, 8)
        assert int(count) == 3
        assert len(np.unique(np.asarray(labels))) == 3

    def test_palette_size_one(self):
        colors, _ = _blobs(MEANS4)
        labels0 = jnp.zeros(len(colors), jnp.int32)
        labels, count = LQ.lq_quantize(jnp.asarray(colors), None, labels0, 1, 1)
        assert int(count) == 1

    def test_exact_range_parity(self):
        """The reference-parity S7 knob (exact [min, max] projection range,
        sort.c:58-60) must stay functional: same blob recovery and centers
        as the default analytic range (ADVICE r3: the segmented
        segment_min/max path had no coverage)."""
        colors, gid = _blobs(MEANS4)
        labels0 = jnp.zeros(len(colors), jnp.int32)
        labels, count = LQ.lq_quantize(
            jnp.asarray(colors), None, labels0, 1, 4, exact_range=True
        )
        labels, count = np.asarray(labels), int(count)
        assert count == 4
        for g in range(4):
            _, cnts = np.unique(labels[gid == g], return_counts=True)
            assert cnts.max() / cnts.sum() > 0.99
        centers, _ = PAL.centers_from_labels(
            jnp.asarray(colors), None, jnp.asarray(labels), 4
        )
        found = sorted(tuple(np.round(c)) for c in np.asarray(centers))
        expected = sorted(tuple(map(float, m)) for m in MEANS4)
        for f, e in zip(found, expected):
            assert np.linalg.norm(np.array(f) - np.array(e)) < 2.0

    def test_exact_range_weighted_matches_default_blobs(self):
        """On well-separated blobs both range modes pick the same splits."""
        colors, _ = _blobs(MEANS4, spread=0.2, per=200, seed=3)
        w = np.abs(np.random.default_rng(4).normal(2.0, 0.5, len(colors)))
        labels0 = jnp.zeros(len(colors), jnp.int32)
        la, ca = LQ.lq_quantize(
            jnp.asarray(colors), jnp.asarray(w.astype(np.float32)),
            labels0, 1, 4, exact_range=True,
        )
        lb, cb = LQ.lq_quantize(
            jnp.asarray(colors), jnp.asarray(w.astype(np.float32)),
            labels0, 1, 4, exact_range=False,
        )
        assert int(ca) == int(cb) == 4
        # same partition up to label renaming
        pa = np.asarray(la)
        pb = np.asarray(lb)
        for g in np.unique(pa):
            vals = np.unique(pb[pa == g])
            assert len(vals) == 1
