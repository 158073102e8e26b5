"""GQ tests: DP optimality vs brute force, host/device agreement, labels."""

import numpy as np
import jax.numpy as jnp

from patolette_tpu.ops import eigen3, moments as M
from patolette_tpu.models import global_q as GQ


def _line_clusters(groups=8, per=200, spread=0.01, seed=0):
    """Tight groups along a line => GQ should isolate them.

    In-group spread is dominated by the y direction (perpendicular to the
    line) so each isolated cell's principal axis is deterministically
    unaligned with the global axis — the bias termination criterion then
    fires exactly when every cell holds one group. Isotropic in-group noise
    would make cell bias a coin flip (the robustness caveat the reference
    itself documents, global.c:113-131).
    """
    rng = np.random.default_rng(seed)
    centers = np.linspace(0, 100, groups)
    pts = []
    gid = []
    for i, c in enumerate(centers):
        p = np.zeros((per, 3))
        p[:, 0] = c + rng.normal(0, spread, per)
        p[:, 1] = rng.normal(0, 3.0 * spread, per)
        p[:, 2] = rng.normal(0, spread, per)
        pts.append(p)
        gid.append(np.full(per, i))
    order = rng.permutation(groups * per)
    return (
        np.concatenate(pts)[order].astype(np.float64),
        np.concatenate(gid)[order],
    )


def _stage(colors):
    tot = M.total_moments(colors)
    mean = M.moments_center(tot)
    cov = M.moments_cov(tot)
    axis, _ = eigen3.principal_axis(cov)
    proj = M.project(colors, axis)
    buckets = M.bucketize(proj, GQ.BUCKET_COUNT, jnp.min(proj), jnp.max(proj))
    bm = M.segment_moments(colors, buckets, GQ.BUCKET_COUNT, shift=mean)
    return np.asarray(buckets), np.asarray(bm, np.float64)


class TestGQHost:
    def test_isolates_line_groups(self):
        colors, gid = _line_clusters(groups=6)
        buckets, bm = _stage(colors)
        cuts = GQ.gq_host(bm, 256)
        k = len(cuts) - 1
        assert k == 6
        labels = np.asarray(
            GQ.labels_from_cuts(jnp.asarray(buckets), jnp.asarray(cuts))
        )
        # each group maps to exactly one label and vice versa
        for g in range(6):
            assert len(np.unique(labels[gid == g])) == 1
        assert len(np.unique(labels)) == 6

    def test_dp_beats_brute_force_never(self):
        """DP error == brute-force optimal error for k = 3."""
        colors, _ = _line_clusters(groups=8, spread=2.0, seed=3)
        _, bm = _stage(colors)
        prefix = np.zeros((GQ.BUCKET_COUNT + 1, 11))
        np.cumsum(bm, axis=0, out=prefix[1:])
        dmat = GQ._pairwise_cell_distortion(prefix, np)

        cuts = GQ.gq_host(bm, 3)
        k = len(cuts) - 1
        dp_err = sum(dmat[a, b] for a, b in zip(cuts[:-1], cuts[1:]))

        if k == 3:
            occupied = np.where(bm[:, 0] > 0)[0] + 1
            best = np.inf
            bounds = [0] + list(occupied)
            for i, t1 in enumerate(bounds):
                for t2 in bounds[i + 1:]:
                    if 0 < t1 < t2 < GQ.BUCKET_COUNT:
                        e = (
                            dmat[0, t1]
                            + dmat[t1, t2]
                            + dmat[t2, GQ.BUCKET_COUNT]
                        )
                        best = min(best, e)
            np.testing.assert_allclose(dp_err, best, rtol=1e-10)

    def test_single_color(self):
        colors = np.ones((1000, 3)) * 0.5
        buckets, bm = _stage(colors)
        cuts = GQ.gq_host(bm, 256)
        # zero distortion => immediate termination at k = 1
        assert len(cuts) - 1 == 1

    def test_respects_palette_size_bound(self):
        colors, _ = _line_clusters(groups=8, spread=2.0)
        _, bm = _stage(colors)
        cuts = GQ.gq_host(bm, 2)
        assert len(cuts) - 1 <= 2

    def test_max_k_cap(self):
        colors, _ = _line_clusters(groups=20, spread=1.5, seed=5)
        _, bm = _stage(colors)
        cuts = GQ.gq_host(bm, 256)
        assert len(cuts) - 1 <= GQ.MAX_K


class TestGQDevice:
    def test_agrees_with_host(self):
        for seed in range(3):
            colors, _ = _line_clusters(groups=5, spread=1.0, seed=seed)
            buckets, bm = _stage(colors)
            cuts_h = GQ.gq_host(bm, 64)
            cuts_d, k_d = GQ.gq_device(jnp.asarray(bm), 64)
            k_d = int(k_d)
            assert k_d == len(cuts_h) - 1
            np.testing.assert_array_equal(
                np.asarray(cuts_d)[: k_d + 1], cuts_h
            )

    def test_padding_is_bucket_count(self):
        colors, _ = _line_clusters(groups=4)
        _, bm = _stage(colors)
        cuts_d, k_d = GQ.gq_device(jnp.asarray(bm), 64)
        cuts_np = np.asarray(cuts_d)
        assert np.all(cuts_np[int(k_d):] == GQ.BUCKET_COUNT)


class TestLabels:
    def test_labels_definition(self):
        buckets = jnp.asarray(np.array([0, 5, 100, 101, 250, 511]))
        cuts = jnp.asarray(np.array([0, 101, 300, 512], np.int32))
        labels = np.asarray(GQ.labels_from_cuts(buckets, cuts))
        # bucket b in cell j iff q_j < b+1 <= q_{j+1}
        np.testing.assert_array_equal(labels, [0, 0, 0, 1, 1, 2])
