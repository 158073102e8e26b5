"""Batched-split LQ (divergence S6): B>1 must match B=1 quality."""

import numpy as np
import jax.numpy as jnp

from patolette_tpu.models import local_q as LQ
from patolette_tpu.models import palette as PAL


def _image(seed=0, n=1 << 14):
    rng = np.random.default_rng(seed)
    k = 10
    means = rng.uniform(0, 100, (k, 3))
    idx = rng.integers(0, k, n)
    return (means[idx] + rng.normal(0, 3.0, (n, 3))).astype(np.float32)


def _sse(colors, labels, count_bound):
    c, mass = PAL.centers_from_labels(
        jnp.asarray(colors), None, jnp.asarray(labels), count_bound
    )
    c = np.asarray(c)
    return float(((colors - c[labels]) ** 2).sum(-1).mean())


class TestBatchedSplits:
    def test_batch_matches_sequential_quality(self):
        colors = _image()
        labels0 = jnp.zeros(len(colors), jnp.int32)
        l1, c1 = LQ.lq_quantize(jnp.asarray(colors), None, labels0, 1, 64,
                                batch_splits=1)
        l8, c8 = LQ.lq_quantize(jnp.asarray(colors), None, labels0, 1, 64,
                                batch_splits=8)
        assert int(c1) == 64 and int(c8) == 64
        sse1 = _sse(colors, np.asarray(l1), 64)
        sse8 = _sse(colors, np.asarray(l8), 64)
        assert sse8 <= sse1 * 1.005 + 1e-6  # within 0.5% (quality budget)

    def test_batch_respects_stop(self):
        colors = np.full((4096, 3), 3.0, np.float32)
        labels0 = jnp.zeros(4096, jnp.int32)
        _, c = LQ.lq_quantize(jnp.asarray(colors), None, labels0, 1, 32,
                              batch_splits=8)
        assert int(c) == 1

    def test_batch_exact_count_cap(self):
        colors = _image(seed=2)
        labels0 = jnp.zeros(len(colors), jnp.int32)
        # batch size that doesn't divide P-1 evenly
        _, c = LQ.lq_quantize(jnp.asarray(colors), None, labels0, 1, 10,
                              batch_splits=4)
        assert int(c) == 10

    def test_batch_with_weights(self):
        colors = _image(seed=3)
        w = np.random.default_rng(0).uniform(1, 5, len(colors)).astype(np.float32)
        labels0 = jnp.zeros(len(colors), jnp.int32)
        l, c = LQ.lq_quantize(jnp.asarray(colors), jnp.asarray(w), labels0,
                              1, 16, batch_splits=4)
        assert int(c) == 16
        assert len(np.unique(np.asarray(l))) == 16

    def test_batch16_matches_sequential_quality(self):
        colors = _image(seed=5)
        labels0 = jnp.zeros(len(colors), jnp.int32)
        l1, c1 = LQ.lq_quantize(jnp.asarray(colors), None, labels0, 1, 256,
                                batch_splits=1)
        l16, c16 = LQ.lq_quantize(jnp.asarray(colors), None, labels0, 1, 256,
                                  batch_splits=16)
        assert int(c1) == 256 and int(c16) == 256
        sse1 = _sse(colors, np.asarray(l1), 256)
        sse16 = _sse(colors, np.asarray(l16), 256)
        assert sse16 <= sse1 * 1.005 + 1e-6
