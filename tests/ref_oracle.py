"""Pure-numpy f64 golden oracle with exact reference semantics.

The CPU reference (/root/reference) cannot be built in this environment
(FLANN/Cython system deps), so this module re-derives its pipeline —
GQ Wu-DP, LQ greedy principal splitting, weighted Lloyd refinement, NN
mapping — in float64 numpy, faithful to the C sources *including their
quirks*, so end-to-end Delta-E parity (SURVEY.md section 4 item 1, the
0.5% north-star budget) can be asserted without the reference binary.

Faithfulness notes (each carries the reference citation):
  * GQ DP seeds each row's candidate with ``E[n-1]`` WITHOUT the
    ``D(n-1, n)`` term (global.c:270-276, quirk Q7) and scans cuts
    descending with strict-improvement updates (largest optimal cut wins).
  * GQ termination: distortion-weighted bias of cells with
    ``cell_bias >= 0.9`` against the global axis, threshold 0.1
    (global.c:99-187); moments cache and global PCA are UNWEIGHTED
    (global.c:407,418 — quirk Q1).
  * LQ accumulates weighted bucket masses into an integer accumulator,
    truncating on every add (local.c:119,133 ``size_t += double`` — quirk
    Q2); benefits use weighted distortions (cluster.c:111-152); greedy
    argmax takes the FIRST maximum (vector.c minmaxloc).
  * Degenerate axis projections round-robin buckets (sort.c:61-79).
  * KMeans: weighted Lloyd from the LQ centers, subsampled to
    ``k * (max(max_samples, 256^2) // k)`` points (refine.c:77-90), empty
    clusters split from a donor with eps = 1/1024 (Clustering.cpp:216-262).
    The reference runs this in f32 with faiss' RNG; the oracle runs f64
    with numpy RNG — parity is metric-level by design (SURVEY.md 4.1).
  * Colorspaces are independent f64 transcriptions of lib/src/color/*.c
    (constants cited inline), including the halved-Ct ICtCp (ICtCp.c:78).

This is NOT a translation of the reference into the framework — it lives
in tests/ as the parity yardstick the reference itself never shipped.
"""

from __future__ import annotations

import numpy as np

DELTA = 1e-16           # misc.h:5
BUCKET_COUNT = 512      # global.c:22, local.c:15
MAX_K = 12              # global.c:19
BIAS_THRESHOLD = 0.1    # global.c:20
CELL_BIAS_THRESHOLD = 0.9  # global.c:21
MIN_KMEANS_SAMPLES = 256 * 256  # refine.c:21
SPLIT_EPS = 1.0 / 1024.0        # Clustering.cpp:210


# ---------------------------------------------------------------------------
# Colorspaces, f64 (lib/src/color/*.c)
# ---------------------------------------------------------------------------

def srgb_gamma_decode(c):
    """sRGB.c:70-88 (clamped to [0, 1])."""
    out = np.where(c <= 0.0404500, c / 12.92,
                   np.power(np.clip((c + 0.055) / 1.055, 0, None), 2.4))
    return np.clip(out, 0.0, 1.0)


def srgb_gamma_encode(c):
    """sRGB.c:90-109 (clamped to [0, 1])."""
    out = np.where(c <= 0.0031308, c * 12.92,
                   1.055 * np.power(np.clip(c, 0, None), 1.0 / 2.4) - 0.055)
    return np.clip(out, 0.0, 1.0)


_SRGB_TO_XYZ = np.array([
    [0.4124564, 0.3575761, 0.1804375],
    [0.2126729, 0.7151522, 0.0721750],
    [0.0193339, 0.1191920, 0.9503041],
])  # xyz.c:37-39

_XYZ_TO_2020 = np.array([
    [1.71666343, -0.35567332, -0.25336809],
    [-0.66667384, 1.61645574, 0.0157683],
    [0.01764248, -0.04277698, 0.94224328],
])  # rec2020.c:99-101

# D65 white (CIELuv.c:19-21)
_RW = np.array([0.95047, 1.0, 1.08883])
_KE = 216.0 / 24389.0
_KK = 24389.0 / 27.0


def srgb_to_xyz(rgb):
    return srgb_gamma_decode(rgb) @ _SRGB_TO_XYZ.T


def srgb_to_cieluv(rgb):
    """CIELuv.c:52-88, 170-200."""
    xyz = srgb_to_xyz(np.asarray(rgb, np.float64))
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    den = x + 15.0 * y + 3.0 * z
    up = np.where(den > 0.0, 4.0 * x / np.where(den > 0.0, den, 1.0), 0.0)
    vp = np.where(den > 0.0, 9.0 * y / np.where(den > 0.0, den, 1.0), 0.0)
    rden = _RW[0] + 15.0 * _RW[1] + 3.0 * _RW[2]
    urp = 4.0 * _RW[0] / rden
    vrp = 9.0 * _RW[1] / rden
    yr = y / _RW[1]
    L = np.where(yr > _KE, 116.0 * np.cbrt(yr) - 16.0, _KK * yr)
    return np.stack([L, 13.0 * L * (up - urp), 13.0 * L * (vp - vrp)],
                    axis=-1)


# SMPTE ST 2084 PQ (eotf.c:13-18)
_PQ_M1 = 0.1593017578125
_PQ_M2 = 78.84375
_PQ_C1 = 0.8359375
_PQ_C2 = 18.8515625
_PQ_C3 = 18.6875
_PQ_LP = 10000.0


def _pq_inverse_eotf(c):
    """eotf.c:44-57."""
    y = np.power(np.clip(c, 0, None) / _PQ_LP, _PQ_M1)
    return np.power((_PQ_C1 + _PQ_C2 * y) / (1.0 + _PQ_C3 * y), _PQ_M2)


# LMS matrices (ICtCp.c:66-76)
_2020_TO_LMS = np.array([
    [1688.0, 2146.0, 262.0],
    [683.0, 2951.0, 462.0],
    [99.0, 309.0, 3688.0],
]) / 4096.0
_LMS_TO_ICTCP = np.array([
    [2048.0, 2048.0, 0.0],
    [6610.0, -13613.0, 7003.0],
    [17933.0, -17390.0, -543.0],
]) / 4096.0


def srgb_to_linear_rec2020(rgb):
    return srgb_to_xyz(np.asarray(rgb, np.float64)) @ _XYZ_TO_2020.T


def srgb_to_ictcp(rgb):
    """ICtCp.c:41-79: PQ-encoded LMS -> ICtCp with Ct HALVED."""
    lms = srgb_to_linear_rec2020(rgb) @ _2020_TO_LMS.T
    lms_ = _pq_inverse_eotf(lms)
    out = lms_ @ _LMS_TO_ICTCP.T
    out[..., 1] *= 0.5  # ICtCp.c:78
    return out


def srgb_to_working(rgb, color_space):
    """0 = sRGB (identity), 1 = CIELuv, 2 = ICtCp (patolette.c:201-207)."""
    rgb = np.asarray(rgb, np.float64)
    if color_space == 1:
        return srgb_to_cieluv(rgb)
    if color_space == 2:
        return srgb_to_ictcp(rgb)
    return rgb.copy()


# ---------------------------------------------------------------------------
# Shared machinery: PCA, axis sort (lib/src/math/pca.c, quantize/sort.c)
# ---------------------------------------------------------------------------

def weighted_pca_axis(colors, weights=None):
    """pca.c:33-101,122-168: weighted mean-centering + covariance / sum(w),
    principal axis = eigenvector of the largest eigenvalue (dsyev ascending,
    eigen.c:83-140 -> numpy.linalg.eigh ascending)."""
    w = np.ones(len(colors)) if weights is None else weights
    wsum = w.sum()
    if wsum <= 0:
        return None
    mu = (w[:, None] * colors).sum(0) / wsum
    xc = colors - mu
    cov = (w[:, None] * xc).T @ xc / wsum
    _, vecs = np.linalg.eigh(cov)
    return vecs[:, -1]


def axis_sort(colors, axis, bucket_count=BUCKET_COUNT):
    """sort.c:12-91 incl. the degenerate round-robin fallback."""
    dots = colors @ axis
    lo, hi = dots.min(), dots.max()
    if hi - lo < DELTA:
        return np.arange(len(colors)) % bucket_count
    ratio = (dots - lo) / (hi - lo)
    return np.minimum((bucket_count * ratio).astype(np.int64),
                      bucket_count - 1)


# ---------------------------------------------------------------------------
# GQ: Wu dynamic programming (lib/src/quantize/global.c, cells.c)
# ---------------------------------------------------------------------------

class _CellCache:
    """cells.c:53-139 — 1-based UNWEIGHTED prefix moments per bucket."""

    def __init__(self, colors, bucket_map, bucket_count=BUCKET_COUNT):
        size = bucket_count + 1
        w0 = np.zeros(size)
        w1 = np.zeros((size, 3))
        w2 = np.zeros(size)
        wrs = np.zeros((size, 3, 3))
        j = bucket_map + 1
        np.add.at(w0, j, 1.0)
        np.add.at(w1, j, colors)
        np.add.at(w2, j, (colors * colors).sum(-1))
        np.add.at(wrs, j, colors[:, :, None] * colors[:, None, :])
        self.w0 = np.cumsum(w0)
        self.w1 = np.cumsum(w1, axis=0)
        self.w2 = np.cumsum(w2)
        self.wrs = np.cumsum(wrs, axis=0)

    def distortion(self, a, b):
        """cells.c:141-182 (0 for empty cells)."""
        n = self.w0[b] - self.w0[a]
        if n == 0:
            return 0.0
        d1 = self.w1[b] - self.w1[a]
        return self.w2[b] - self.w2[a] - (d1 * d1).sum() / n

    def distortion_row(self, t_idx, n):
        """Vector of D(t, n) over an array of cut candidates t."""
        cnt = self.w0[n] - self.w0[t_idx]
        d1 = self.w1[n] - self.w1[t_idx]
        d = (self.w2[n] - self.w2[t_idx]
             - (d1 * d1).sum(-1) / np.where(cnt > 0, cnt, 1.0))
        return np.where(cnt > 0, d, 0.0)

    def pca_axis(self, a, b):
        """cells.c:184-278: cell covariance -> principal axis."""
        n = self.w0[b] - self.w0[a]
        if n == 0:
            return np.zeros(3)
        mu = (self.w1[b] - self.w1[a]) / n
        cov = (self.wrs[b] - self.wrs[a]) / n - np.outer(mu, mu)
        _, vecs = np.linalg.eigh(cov)
        return vecs[:, -1]

    def bias(self, a, b, axis):
        """cells.c:280-328: |cos(cell axis, global axis)| clipped to 1."""
        ca = self.pca_axis(a, b)
        norms = np.linalg.norm(axis) * np.linalg.norm(ca)
        if norms < DELTA:
            return 0.0
        return min(1.0, abs(float(ca @ axis) / norms))


def _should_terminate(quantizer, axis, cache):
    """global.c:99-187."""
    dist = sum(cache.distortion(quantizer[j], quantizer[j + 1])
               for j in range(len(quantizer) - 1))
    if dist < DELTA:
        return True
    bias = 0.0
    for j in range(len(quantizer) - 1):
        cd = cache.distortion(quantizer[j], quantizer[j + 1])
        cb = cache.bias(quantizer[j], quantizer[j + 1], axis)
        if cb < CELL_BIAS_THRESHOLD:
            continue
        bias += (cd / dist) * cb
    return bias < BIAS_THRESHOLD


def gq_quantize(colors, weights, palette_size):
    """global.c:388-443 -> per-pixel GQ cluster labels + cluster count.

    Returns ``(labels, k)``; the DP seeds each row candidate with
    ``E[n-1]`` WITHOUT the tail distortion (global.c:270-276, quirk Q7) and
    resolves cut ties to the largest t (strict-improvement descending scan).
    """
    axis = weighted_pca_axis(colors, None)  # UNWEIGHTED (global.c:407)
    bucket_map = axis_sort(colors, axis)
    cache = _CellCache(colors, bucket_map)
    n_buckets = BUCKET_COUNT

    E = np.array([cache.distortion(0, i) for i in range(n_buckets + 1)])
    L = np.zeros((MAX_K + 1, n_buckets + 1), dtype=np.int64)
    quantizer = [0, n_buckets]

    for k in range(2, min(MAX_K, palette_size) + 1):
        if _should_terminate(quantizer, axis, cache):
            break
        E_prev = E.copy()
        for n in range(k + 1, n_buckets + 1):
            t_arr = np.arange(k - 1, n - 1)  # k-1 .. n-2
            costs = E_prev[t_arr] + cache.distortion_row(t_arr, n)
            m = costs.min()
            if m < E_prev[n - 1]:  # initial candidate: cut=n-1, e=E[n-1]
                # descending strict-improvement scan -> largest optimal t
                cut = t_arr[np.flatnonzero(costs == m)[-1]]
                e = m
            else:
                cut, e = n - 1, E_prev[n - 1]
            L[k, n] = cut
            E[n] = e
        # l_chain (global.c:72-97)
        chain = [0] * (k + 1)
        chain[k] = n_buckets
        t = n_buckets
        for j in range(k - 1, 0, -1):
            t = L[j + 1, t]
            chain[j] = t
        quantizer = chain

    # bucket -> cell (global.c:324-340: first j with bucket+1 <= q[j+1])
    cell_of_bucket = np.searchsorted(
        np.asarray(quantizer[1:]), np.arange(n_buckets) + 1, side="left"
    )
    labels = cell_of_bucket[bucket_map]
    return labels, len(quantizer) - 1


# ---------------------------------------------------------------------------
# LQ: greedy principal splitting (lib/src/quantize/local.c, cluster.c)
# ---------------------------------------------------------------------------

def _weighted_center_distortion(colors, weights):
    w = np.ones(len(colors)) if weights is None else weights
    wsum = w.sum()
    if wsum <= 0:
        return np.zeros(3), 0.0
    mu = (w[:, None] * colors).sum(0) / wsum
    d = float((w * ((colors - mu) ** 2).sum(-1)).sum())
    return mu, d


def _optimal_bucket(colors, weights, bucket_map):
    """local.c:102-177 with the size_t truncation quirk Q2: the bucket-mass
    accumulator truncates ``(size_t)(old + w)`` on EVERY add."""
    sizes = np.zeros(BUCKET_COUNT, dtype=np.uint64)
    sums = np.zeros((BUCKET_COUNT, 3))
    w = np.ones(len(colors)) if weights is None else weights
    np.add.at(sums, bucket_map, w[:, None] * colors)
    if weights is None:
        np.add.at(sizes, bucket_map, 1)
    else:
        for b, wi in zip(bucket_map, w):  # truncation is order-dependent
            sizes[b] = np.uint64(float(sizes[b]) + wi)
    csum = np.cumsum(sums, axis=0)
    csize = np.cumsum(sizes.astype(np.float64))
    sl = csize
    sr = csize[-1] - csize
    csl = csum
    csr = csum[-1] - csum
    obj = (np.where(sl[:, None] != 0, csl**2 / np.where(sl[:, None] != 0, sl[:, None], 1), 0)
           + np.where(sr[:, None] != 0, csr**2 / np.where(sr[:, None] != 0, sr[:, None], 1), 0)).sum(-1)
    return int(np.argmax(obj))  # first max (vector.c:26-46)


class _Cluster:
    """cluster.c semantics: index list + lazy center/distortion/axis."""

    def __init__(self, dataset, dweights, indices):
        self.dataset = dataset
        self.dweights = dweights
        self.indices = indices
        c = dataset[indices]
        w = None if dweights is None else dweights[indices]
        self.center, self.distortion = _weighted_center_distortion(c, w)

    def split(self):
        """local.c:179-254."""
        if len(self.indices) <= 1:
            return None
        c = self.dataset[self.indices]
        w = None if self.dweights is None else self.dweights[self.indices]
        axis = weighted_pca_axis(c, w)
        if axis is None:
            return None
        bm = axis_sort(c, axis)
        s = _optimal_bucket(c, w, bm)
        left = bm <= s
        li, ri = self.indices[left], self.indices[~left]
        return (_Cluster(self.dataset, self.dweights, li),
                _Cluster(self.dataset, self.dweights, ri))


def lq_quantize(colors, weights, gq_labels, k0, palette_size):
    """local.c:318-404 -> list of clusters (index arrays)."""
    clusters = [
        _Cluster(colors, weights, np.flatnonzero(gq_labels == j))
        for j in range(k0)
    ]
    if len(clusters) >= palette_size:
        return clusters
    children = [c.split() for c in clusters]

    def benefit(i):
        if children[i] is None:
            return 0.0
        l, r = children[i]
        return clusters[i].distortion - (l.distortion + r.distortion)

    for i in range(len(clusters), palette_size):
        bens = [benefit(j) for j in range(i)]
        best = int(np.argmax(bens))  # first max
        if bens[best] < DELTA:
            break
        l, r = children[best]
        clusters.append(l)
        clusters[best] = r
        children.append(l.split())
        children[best] = r.split()
    return clusters


# ---------------------------------------------------------------------------
# KMeans refinement (refine.c + faiss Clustering.cpp, metric-level)
# ---------------------------------------------------------------------------

def kmeans_refine(colors, weights, centers, niter, max_samples, seed=1234):
    """Weighted Lloyd from seeded centers (Clustering.cpp:443-529).

    f64 with numpy RNG subsampling (the reference: f32 faiss, rand_perm) —
    metric-level parity by design. Empty clusters split the largest donor
    with the faiss eps=1/1024 symmetric perturbation (Clustering.cpp:216).
    """
    k = len(centers)
    cap = (max(int(max_samples), MIN_KMEANS_SAMPLES) // max(k, 1)) * k
    x, w = colors, weights
    if len(x) > cap:
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(x))[:cap]
        x = x[idx]
        w = None if w is None else w[idx]
    w = np.ones(len(x)) if w is None else w
    c = centers.copy()
    parity = np.array([1.0, -1.0, 1.0])
    for _ in range(niter):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        a = d.argmin(-1)
        hassign = np.zeros(k)
        np.add.at(hassign, a, w)
        sums = np.zeros((k, 3))
        np.add.at(sums, a, w[:, None] * x)
        nz = hassign > 0
        c[nz] = sums[nz] / hassign[nz, None]
        for ci in range(k):  # Clustering.cpp:216-262
            if hassign[ci] == 0:
                cj = int(np.argmax(hassign))
                base = c[cj].copy()
                c[ci] = base * (1.0 + SPLIT_EPS * parity)
                c[cj] = base * (1.0 - SPLIT_EPS * parity)
                hassign[ci] = hassign[cj] / 2.0
                hassign[cj] -= hassign[ci]
    return c


# ---------------------------------------------------------------------------
# NN mapping + orchestrator (patolette.c:157-343)
# ---------------------------------------------------------------------------

def nn_map(colors_work, palette_work):
    """nearest.c:150-209: exact NN, lowest index wins ties."""
    d = ((colors_work[:, None, :] - palette_work[None, :, :]) ** 2).sum(-1)
    return d.argmin(-1)


def quantize_ref(colors_srgb, palette_size, color_space=2, weights=None,
                 kmeans_niter=32, kmeans_max_samples=512**2,
                 dither_shape=None):
    """Reference pipeline: sRGB colors -> (palette_srgb, map).

    Mirrors patolette.c:157-343 with the Q4/Q5 *documented* behavior (NN map
    always in ICtCp; palette returned in sRGB) — the two conscious
    divergences of the framework under test (README table).

    ``dither_shape``: an optional ``(width, height)`` — runs the exact
    serial Riemersma dither (patolette.c:268-299: colors + palette to
    linear Rec2020, then riemersma.c:437) via the native oracle
    (patolette_tpu/native/oracle.cpp) instead of the NN map.
    """
    colors_srgb = np.asarray(colors_srgb, np.float64)
    x = srgb_to_working(colors_srgb, color_space)
    w = None if weights is None else np.asarray(weights, np.float64)

    gq_labels, k0 = gq_quantize(x, w, palette_size)
    clusters = lq_quantize(x, w, gq_labels, k0, palette_size)
    centers = np.stack([c.center for c in clusters])

    if kmeans_niter > 0:
        centers = kmeans_refine(x, w, centers, kmeans_niter,
                                kmeans_max_samples)

    pal_srgb = working_to_srgb(centers, color_space)
    if dither_shape is not None:
        from patolette_tpu import native

        assert native.available(), native.build_error()
        width, height = dither_shape
        cw = np.array([0.51254268114958, 0.8234075540095561,
                       0.2435159132377184])  # riemersma.c:38-42
        pmap = native.riemersma_dither(
            srgb_to_linear_rec2020(colors_srgb),
            width, height,
            srgb_to_linear_rec2020(np.clip(pal_srgb, 0.0, 1.0)), cw,
        )
        return pal_srgb, pmap

    # NN map in ICtCp (patolette.c:140 documented semantics / quirk Q4)
    ci = srgb_to_ictcp(colors_srgb)
    pi = srgb_to_ictcp(pal_srgb)
    pmap = nn_map(ci, pi)
    return pal_srgb, pmap


def working_to_srgb(x, color_space):
    """Inverse transforms for palette output (rec2020.c, CIELuv.c, xyz.c)."""
    x = np.asarray(x, np.float64)
    if color_space == 0:
        return x.copy()
    if color_space == 1:
        return _cieluv_to_srgb(x)
    return _ictcp_to_srgb(x)


def _cieluv_to_srgb(luv):
    """CIELuv.c:100-167 -> XYZ, then XYZ -> linear sRGB -> gamma."""
    L, u, v = luv[..., 0], luv[..., 1], luv[..., 2]
    y = np.where(L > 8.0, ((L + 16.0) / 116.0) ** 3, L / _KK)
    rden = _RW[0] + 15.0 * _RW[1] + 3.0 * _RW[2]
    u0 = 4.0 * _RW[0] / rden
    v0 = 9.0 * _RW[1] / rden
    a_den = u + 13.0 * L * u0
    a = np.where(a_den != 0.0,
                 ((52.0 * L) / np.where(a_den != 0.0, a_den, 1.0) - 1.0) / 3.0,
                 0.0)
    b = -5.0 * y
    cc = -1.0 / 3.0
    d_den = v + 13.0 * L * v0
    d = np.where(d_den != 0.0,
                 y * ((39.0 * L) / np.where(d_den != 0.0, d_den, 1.0) - 5.0),
                 0.0)
    x_den = a - cc
    x = np.where(x_den != 0.0, (d - b) / np.where(x_den != 0.0, x_den, 1.0),
                 0.0)
    z = x * a + b
    xyz = np.stack([x, y, z], axis=-1)
    lin = xyz @ np.linalg.inv(_SRGB_TO_XYZ).T
    return srgb_gamma_encode(lin)


def _ictcp_to_srgb(ictcp):
    """rec2020.c:32-69 (doubles Ct back) -> 2020 -> XYZ -> sRGB."""
    v = np.asarray(ictcp, np.float64).copy()
    v[..., 1] *= 2.0  # rec2020.c:51-56
    lms_ = v @ np.linalg.inv(_LMS_TO_ICTCP).T
    # PQ forward EOTF (eotf.c:29-42)
    vp = np.power(np.clip(lms_, 0, None), 1.0 / _PQ_M2)
    n = np.clip(vp - _PQ_C1, 0, None)
    lms = _PQ_LP * np.power(n / (_PQ_C2 - _PQ_C3 * vp), 1.0 / _PQ_M1)
    lin2020 = lms @ np.linalg.inv(_2020_TO_LMS).T
    xyz = lin2020 @ np.linalg.inv(_XYZ_TO_2020).T
    lin_srgb = xyz @ np.linalg.inv(_SRGB_TO_XYZ).T
    return srgb_gamma_encode(lin_srgb)
