"""Pin the numpy parity oracle against the ACTUAL reference C.

tests/ref_oracle.py is a same-author transcription — a transcription error
that matched a framework error would be invisible to the ratio-based
parity gates (VERDICT r4 missing #1). Here the reference's own
global.c/local.c/cells.c/sort.c/cluster.c/pca.c are compiled unmodified
(tests/ref_native) and the oracle's GQ termination level, DP cut
partitions, and LQ split sequences are required to MATCH the real code on
fixed fixtures.

Comparison is on canonicalized partitions (labels remapped by first pixel
occurrence): cluster ids may legitimately differ in numbering between the
index-list C and the oracle's ordering, but the pixel partition after any
number of greedy splits must be identical. Multiple palette sizes pin the
split SEQUENCE (the partition at p is the state after p - k0 splits).
"""

import numpy as np
import pytest

import ref_native as RN
import ref_oracle as RO


def _canon(labels):
    """Remap labels by first occurrence so partitions compare exactly."""
    labels = np.asarray(labels)
    _, first = np.unique(labels, return_index=True)
    order = labels[np.sort(first)]
    remap = np.empty(order.max() + 1, np.int64)
    remap[order] = np.arange(len(order))
    return remap[labels]


def _fixture(seed, n=4096, clustered=True):
    rng = np.random.default_rng(seed)
    if not clustered:
        return rng.uniform(0, 1, (n, 3))
    # clustered colors: exercises the GQ termination path beyond k=2 and
    # gives LQ meaningful split structure
    centers = rng.uniform(0.1, 0.9, (12, 3))
    idx = rng.integers(0, 12, n)
    return np.clip(centers[idx] + 0.03 * rng.standard_normal((n, 3)), 0, 1)


def _require_native():
    if not RN.available():
        pytest.fail(f"reference build unavailable: {RN.build_error()}")


class TestOracleMatchesReferenceC:
    @pytest.mark.parametrize("seed,clustered", [(0, False), (1, True),
                                                (2, True)])
    def test_gq_partition_and_termination(self, seed, clustered):
        _require_native()
        colors = _fixture(seed, clustered=clustered)
        ref_labels, ref_k = RN.quantize_labels(colors, None, 16, do_lq=False)
        oracle_labels, oracle_k = RO.gq_quantize(colors, None, 16)
        assert oracle_k == ref_k, (
            f"GQ termination level differs: oracle {oracle_k} vs "
            f"reference C {ref_k}"
        )
        np.testing.assert_array_equal(
            _canon(oracle_labels), _canon(ref_labels),
            err_msg="GQ DP cut partition differs from the reference C",
        )

    @pytest.mark.parametrize("p", [8, 16, 32, 64])
    def test_lq_split_sequence_unweighted(self, p):
        _require_native()
        colors = _fixture(3, clustered=True)
        ref_labels, ref_k = RN.quantize_labels(colors, None, p, do_lq=True)
        gq_labels, k0 = RO.gq_quantize(colors, None, p)
        clusters = RO.lq_quantize(colors, None, gq_labels, k0, p)
        oracle_labels = np.empty(len(colors), np.int64)
        for i, c in enumerate(clusters):
            oracle_labels[c.indices] = i
        assert len(clusters) == ref_k
        np.testing.assert_array_equal(
            _canon(oracle_labels), _canon(ref_labels),
            err_msg=f"LQ split sequence diverges from the reference C "
                    f"at p={p}",
        )

    def test_lq_split_sequence_weighted(self):
        """Weighted LQ pins quirk Q2 (integer truncation of bucket masses,
        local.c:119,133) against the real code."""
        _require_native()
        colors = _fixture(4, clustered=True)
        rng = np.random.default_rng(7)
        weights = 1.0 + 9.0 * rng.random(len(colors))
        p = 24
        ref_labels, ref_k = RN.quantize_labels(colors, weights, p, do_lq=True)
        gq_labels, k0 = RO.gq_quantize(colors, weights, p)
        clusters = RO.lq_quantize(colors, weights, gq_labels, k0, p)
        oracle_labels = np.empty(len(colors), np.int64)
        for i, c in enumerate(clusters):
            oracle_labels[c.indices] = i
        assert len(clusters) == ref_k
        np.testing.assert_array_equal(
            _canon(oracle_labels), _canon(ref_labels),
            err_msg="weighted LQ split sequence diverges from the "
                    "reference C",
        )
