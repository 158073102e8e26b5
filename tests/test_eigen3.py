"""Closed-form 3x3 eigensolver vs numpy.linalg.eigh (SURVEY.md section 4.2)."""

import numpy as np

from patolette_tpu.ops import eigen3


def _rand_sym(batch, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(batch, 3, 3)) * scale
    return ((a + np.transpose(a, (0, 2, 1))) / 2).astype(np.float64)


def _rand_cov(batch, seed=1):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(batch, 64, 3))
    return np.einsum("bni,bnj->bij", x, x).astype(np.float64) / 64


class TestEigvals:
    def test_matches_numpy(self):
        a = _rand_sym(256)
        ours = np.asarray(eigen3.eigvals_sym3(a))
        ref = np.linalg.eigvalsh(a)
        np.testing.assert_allclose(ours, ref, atol=1e-10)

    def test_diagonal(self):
        a = np.zeros((1, 3, 3))
        a[0] = np.diag([3.0, 1.0, 2.0])
        ours = np.asarray(eigen3.eigvals_sym3(a))[0]
        np.testing.assert_allclose(ours, [1.0, 2.0, 3.0], atol=1e-12)

    def test_zero_matrix(self):
        ours = np.asarray(eigen3.eigvals_sym3(np.zeros((1, 3, 3))))[0]
        np.testing.assert_allclose(ours, 0.0)


class TestPrincipalAxis:
    def test_matches_numpy_direction(self):
        a = _rand_cov(256)
        axis, _ = eigen3.principal_axis(a)
        axis = np.asarray(axis)
        w, v = np.linalg.eigh(a)
        ref = v[:, :, 2]
        # direction is defined up to sign
        dots = np.abs(np.sum(axis * ref, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-7)
        np.testing.assert_allclose(np.sum(axis * axis, -1), 1.0, atol=1e-10)

    def test_eigen_equation(self):
        a = _rand_sym(128, seed=3)
        axis, evals = eigen3.principal_axis(a)
        axis, evals = np.asarray(axis), np.asarray(evals)
        lhs = np.einsum("bij,bj->bi", a, axis)
        rhs = evals[:, 2:3] * axis
        np.testing.assert_allclose(lhs, rhs, atol=1e-8)

    def test_degenerate_isotropic(self):
        a = np.tile(np.eye(3) * 2.0, (1, 1, 1))
        axis, evals = eigen3.principal_axis(a)
        np.testing.assert_allclose(np.asarray(evals)[0], 2.0)
        assert abs(np.linalg.norm(np.asarray(axis)[0]) - 1.0) < 1e-10

    def test_f32_stability(self):
        a = _rand_cov(64).astype(np.float32)
        axis, _ = eigen3.principal_axis(a)
        w, v = np.linalg.eigh(a.astype(np.float64))
        dots = np.abs(np.sum(np.asarray(axis) * v[:, :, 2], axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-3)


class TestPCA:
    def test_explained_variance(self):
        a = _rand_cov(64)
        _, ev = eigen3.pca_from_cov(a)
        w = np.linalg.eigvalsh(a)
        ref = w[:, 2] / np.sum(w, axis=-1)
        np.testing.assert_allclose(np.asarray(ev), ref, atol=1e-9)

    def test_zero_cov(self):
        _, ev = eigen3.pca_from_cov(np.zeros((1, 3, 3)))
        assert float(np.asarray(ev)[0]) == 0.0
