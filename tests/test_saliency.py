"""Saliency (MBD + priors) tests vs a direct numpy port of the reference
raster scans (oracle reimplemented from pyx:54-156 semantics)."""

import numpy as np
import jax.numpy as jnp

from patolette_tpu.models import saliency as S


def _np_raster_scan(img, l, u, d):
    rows, cols = img.shape
    for x in range(1, rows - 1):
        for y in range(1, cols - 1):
            ix = img[x, y]
            dd = d[x, y]
            u1, l1 = u[x - 1, y], l[x - 1, y]
            u2, l2 = u[x, y - 1], l[x, y - 1]
            b1 = max(u1, ix) - min(l1, ix)
            b2 = max(u2, ix) - min(l2, ix)
            if dd <= b1 and dd <= b2:
                continue
            elif b1 < dd and b1 <= b2:
                d[x, y] = b1
                u[x, y] = max(u1, ix)
                l[x, y] = min(l1, ix)
            else:
                d[x, y] = b2
                u[x, y] = max(u2, ix)
                l[x, y] = min(l2, ix)


def _np_raster_scan_inv(img, l, u, d):
    rows, cols = img.shape
    for x in range(rows - 2, 1, -1):
        for y in range(cols - 2, 1, -1):
            ix = img[x, y]
            dd = d[x, y]
            u1, l1 = u[x + 1, y], l[x + 1, y]
            u2, l2 = u[x, y + 1], l[x, y + 1]
            b1 = max(u1, ix) - min(l1, ix)
            b2 = max(u2, ix) - min(l2, ix)
            if dd <= b1 and dd <= b2:
                continue
            elif b1 < dd and b1 <= b2:
                d[x, y] = b1
                u[x, y] = max(u1, ix)
                l[x, y] = min(l1, ix)
            else:
                d[x, y] = b2
                u[x, y] = max(u2, ix)
                l[x, y] = min(l2, ix)


def _np_mbd(img, iters=3):
    l = img.copy()
    u = img.copy()
    d = np.full(img.shape, np.inf, img.dtype)
    d[0, :] = d[-1, :] = d[:, 0] = d[:, -1] = 0
    for it in range(iters):
        if it % 2 == 1:
            _np_raster_scan(img, l, u, d)
        else:
            _np_raster_scan_inv(img, l, u, d)
    return d


class TestMBD:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (24, 31)).astype(np.float32)
        ours = np.asarray(S.mbd(jnp.asarray(img)))
        ref = _np_mbd(img.copy())
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_bright_center_is_salient(self):
        img = np.zeros((32, 32), np.float32)
        img[12:20, 12:20] = 1.0
        d = np.asarray(S.mbd(jnp.asarray(img)))
        assert d[15, 15] > 0.9
        assert d[2, 2] < 0.1


class TestWeights:
    def test_range_and_shape(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (40, 50, 3))
        w = np.asarray(S.get_weights(jnp.asarray(img), 512.0))
        assert w.shape == (40 * 50,)
        assert np.all(w >= 1.0)
        assert np.all(np.isfinite(w))

    def test_salient_object_upweighted(self):
        img = np.full((48, 48, 3), 0.2)
        img[18:30, 18:30] = np.array([0.9, 0.1, 0.1])  # salient red block
        w = np.asarray(S.get_weights(jnp.asarray(img), 64.0)).reshape(48, 48)
        assert w[24, 24] > w[4, 4]
        assert w[24, 24] > 1.5

    def test_tiny_image_returns_none(self):
        img = np.zeros((3, 10, 3))
        assert S.get_weights(jnp.asarray(img), 512.0) is None

    def test_weight_formula_scale(self):
        img = np.full((32, 32, 3), 0.2)
        img[10:22, 10:22] = 0.9
        w1 = np.asarray(S.get_weights(jnp.asarray(img), 512.0))
        w2 = np.asarray(S.get_weights(jnp.asarray(img), 32.0))
        # smaller tile_size => larger weights (pyx:313)
        assert w2.max() > w1.max()
