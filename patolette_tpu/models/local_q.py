"""Local quantization (LQ): greedy weighted principal-axis splitting.

Reference: /root/reference/lib/src/quantize/local.c. Turns the K <= 12 GQ
clusters into up to ``palette_size`` clusters by repeatedly splitting the
cluster whose candidate split yields the largest weighted-SSE benefit
``d - (dl + dr)`` (local.c:256-307), where each candidate split projects the
cluster on its own weighted principal axis and picks the 512-bucket cut that
maximizes the between-cluster objective ``sum_ch csl^2/sl + csr^2/sr``
(local.c:102-177).

TPU-native reformulation (SURVEY.md section 7, stage 4):
  * index-list clusters (reference cluster.h:40-52) become a dense ``(N,)``
    int32 labels array; every gather becomes a masked reduction and every
    bucket histogram a one-hot segment matmul on the MXU.
  * the candidate split of a cluster is summarized by
    ``(mu, axis, pmin, pmax, split_bucket)`` so applying a cached split later
    is a recomputation of bucket ids, bit-identical to candidate time.
  * the greedy loop runs as a fixed-trip-count ``lax.fori_loop``
    (palette_size - 1 iterations) with no-op rounds once the stop condition
    hits (benefit < DELTA, local.c:364-370), keeping the whole thing
    jittable with a traced initial cluster count.

Conscious divergences (SURVEY.md H4):
  * Q2: the reference accumulates weighted bucket masses into a ``size_t``
    array, truncating fractional weights per bucket (local.c:119,133); we
    keep float masses.
  * degenerate clusters (flat projection) use plain linear binning
    (everything lands in bucket 0 => zero benefit => never split) instead
    of the reference's round-robin fallback (sort.c:61-79). Round-robin is
    only reachable for point-mass clusters whose split benefit is ~0, so
    the greedy selection is unaffected, and dropping it removes an O(N)
    prefix scan from every round (see ops.moments.bucketize_linear).

Numerics: all cluster statistics are computed on colors shifted by the
cluster's weighted mean (translation-invariant), so f32 accumulation holds
the 0.5% Delta-E budget (SURVEY.md H3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from patolette_tpu.ops import eigen3
from patolette_tpu.ops import moments as M

BUCKET_COUNT = 512
DELTA = 1e-16
_EPS = 1e-30


class LQState(NamedTuple):
    labels: jnp.ndarray        # (N,) int32 cluster id per pixel
    count: jnp.ndarray         # scalar int32, current cluster count
    done: jnp.ndarray          # scalar bool, stop flag
    benefit: jnp.ndarray       # (P,) candidate split benefit per cluster
    mu: jnp.ndarray            # (P, 3) cluster weighted mean (= split shift)
    axis: jnp.ndarray          # (P, 3) cluster principal axis
    pmin: jnp.ndarray          # (P,) projection min at candidate time
    pmax: jnp.ndarray          # (P,) projection max at candidate time
    split_bucket: jnp.ndarray  # (P,) int32 optimal split bucket
    mu_child: jnp.ndarray      # (P, 2, 3) cached means of the candidate's
                               # left/right children (from the cumulative
                               # bucket sums -- saves the mean pass when the
                               # split is applied)


def _psum(x, axis_name):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _candidate(colors, w, labels, cid, bucket_count=BUCKET_COUNT,
               axis_name=None, mu_known=None):
    """Candidate split of cluster ``cid``.

    Mirrors split_cluster + get_optimal_bucket_index + get_split_benefit
    (reference local.c:102-275). Returns a tuple of per-cluster values
    matching LQState fields (benefit, mu, axis, pmin, pmax, split_bucket,
    mu_child).

    ``mu_known``: the cluster's weighted mean when already available (a
    freshly-split child's mean comes free from the parent's cumulative
    bucket sums) — skips the dedicated mean pass.
    """
    mask = labels == cid
    wm = jnp.where(mask, w, 0.0)

    if mu_known is None:
        # Pass 1: weighted mean (cluster.c:171-189).
        w0p = _psum(jnp.sum(wm), axis_name)
        mu = _psum(jnp.sum(wm[:, None] * colors, axis=0), axis_name)
        mu = mu / jnp.maximum(w0p, _EPS)
    else:
        mu = mu_known

    # Pass 2: central moments -> covariance, distortion, principal axis
    # (cluster.c:111-152, 191-217; pca.c:62-149 weighted). The moment tuple
    # also yields w0; the raw pixel count rides the same fused pass.
    x = colors - mu
    mom = M.total_moments(x, weights=wm, axis_name=axis_name)
    npix = _psum(jnp.sum(mask.astype(jnp.int32)), axis_name)
    w0 = mom[M.IDX_W0]
    d = M.moments_distortion(mom)
    cov = M.moments_cov(mom)
    axis, _ = eigen3.principal_axis(cov)

    # Pass 3: projection range on own axis (sort.c:12-92).
    proj = M.project(x, axis)
    pmin = jnp.min(jnp.where(mask, proj, jnp.inf))
    pmax = jnp.max(jnp.where(mask, proj, -jnp.inf))
    if axis_name is not None:
        pmin = jax.lax.pmin(pmin, axis_name)
        pmax = jax.lax.pmax(pmax, axis_name)
    pmin = jnp.where(jnp.isfinite(pmin), pmin, 0.0)
    pmax = jnp.where(jnp.isfinite(pmax), pmax, 0.0)
    buckets = M.bucketize_linear(proj, bucket_count, pmin, pmax)

    # Pass 4: per-bucket weighted sums (local.c:119-146), shifted by mu.
    # The objective's argmax is invariant to the shift: substituting
    # csl = csl' + sl*mu into sum_ch csl^2/sl + csr^2/sr adds a
    # split-independent constant.
    feats = jnp.concatenate(
        [
            wm[:, None],
            wm[:, None] * x,
            jnp.sum(wm[:, None] * x * x, axis=-1, keepdims=True),
        ],
        axis=-1,
    )  # (N, 5): [w, w*x', w*|x'|^2]
    bstats = M.segment_matmul(feats, buckets, bucket_count,
                              axis_name=axis_name)
    cum = jnp.cumsum(bstats, axis=0)
    sl = cum[:, 0]
    csl = cum[:, 1:4]
    cw2l = cum[:, 4]
    st = cum[-1, 0]
    cst = cum[-1, 1:4]
    w2t = cum[-1, 4]
    sr = st - sl
    csr = cst - csl

    sl_ok = sl > 0.0
    sr_ok = sr > 0.0
    obj = jnp.where(
        sl_ok, jnp.sum(csl * csl, -1) / jnp.where(sl_ok, sl, 1.0), 0.0
    ) + jnp.where(
        sr_ok, jnp.sum(csr * csr, -1) / jnp.where(sr_ok, sr, 1.0), 0.0
    )
    s = jnp.argmax(obj).astype(jnp.int32)  # first max, like Vector_maxloc

    # Child distortions from the cumulative sums at the chosen cut.
    dl = jnp.where(
        sl_ok[s],
        jnp.maximum(cw2l[s] - jnp.sum(csl[s] ** 2) / jnp.maximum(sl[s], _EPS), 0.0),
        0.0,
    )
    w2r = w2t - cw2l[s]
    dr = jnp.where(
        sr_ok[s],
        jnp.maximum(w2r - jnp.sum(csr[s] ** 2) / jnp.maximum(sr[s], _EPS), 0.0),
        0.0,
    )
    benefit = jnp.maximum(d - (dl + dr), 0.0)
    # size <= 1 cannot be split (local.c:186-190); empty clusters neither.
    benefit = jnp.where((npix <= 1) | (w0 <= 0.0), 0.0, benefit)

    # Child means from the cumulative shifted sums (linearity of the
    # weighted mean): free when this split is later applied.
    mu_l = mu + csl[s] / jnp.maximum(sl[s], _EPS)
    mu_r = mu + (cst - csl[s]) / jnp.maximum(sr[s], _EPS)
    mu_child = jnp.stack([mu_l, mu_r])
    return benefit, mu, axis, pmin, pmax, s, mu_child


def lq_quantize(colors, weights, init_labels, k0, palette_size: int,
                bucket_count=BUCKET_COUNT, axis_name=None):
    """Greedy splitting from ``k0`` initial clusters up to ``palette_size``.

    Args:
      colors: (N, 3) working-space colors.
      weights: (N,) or None.
      init_labels: (N,) int32 labels in [0, k0).
      k0: traced or static scalar, initial cluster count (<= 12).
      palette_size: static int.

    Returns ``(labels, count)`` — final labels in [0, count).
    """
    n = colors.shape[0]
    p = int(palette_size)
    dtype = colors.dtype
    w = (
        jnp.ones((n,), dtype)
        if weights is None
        else weights.astype(dtype)
    )
    k0 = jnp.asarray(k0, jnp.int32)

    max_k0 = min(12, p)

    # Batched candidate computation: one vmapped trace instead of 12 (or 2)
    # unrolled copies — keeps the compiled program small.
    def cand_many(labels_arr, ids, mu_known=None):
        if mu_known is None:
            return jax.vmap(
                lambda cid: _candidate(
                    colors, w, labels_arr, cid, bucket_count,
                    axis_name=axis_name,
                )
            )(ids)
        return jax.vmap(
            lambda cid, mk: _candidate(
                colors, w, labels_arr, cid, bucket_count,
                axis_name=axis_name, mu_known=mk,
            )
        )(ids, mu_known)

    ids0 = jnp.arange(max_k0, dtype=jnp.int32)
    b0, mu0, ax0, pm0, px0, s0, mc0 = cand_many(init_labels, ids0)
    live = ids0 < k0
    b0 = jnp.where(live, b0, 0.0)

    def pad(vals, fill_shape, fill_dtype):
        padding = jnp.zeros((p - max_k0,) + fill_shape, fill_dtype)
        return jnp.concatenate([vals.astype(fill_dtype), padding], axis=0)

    state = LQState(
        labels=init_labels.astype(jnp.int32),
        count=k0,
        done=jnp.asarray(False),
        benefit=pad(b0, (), dtype),
        mu=pad(mu0, (3,), dtype),
        axis=pad(ax0, (3,), dtype),
        pmin=pad(pm0, (), dtype),
        pmax=pad(px0, (), dtype),
        split_bucket=pad(s0, (), jnp.int32),
        mu_child=pad(mc0, (2, 3), dtype),
    )

    def round_body(_, st):
        def do_split(st):
            c_star = jnp.argmax(st.benefit).astype(jnp.int32)
            best = st.benefit[c_star]

            def stop(st):
                return st._replace(done=jnp.asarray(True))

            def split(st):
                new_id = st.count
                parent_mask = st.labels == c_star
                proj = M.project(colors - st.mu[c_star], st.axis[c_star])
                buckets = M.bucketize_linear(
                    proj, bucket_count, st.pmin[c_star], st.pmax[c_star]
                )
                left = parent_mask & (buckets <= st.split_bucket[c_star])
                labels = jnp.where(left, new_id, st.labels)

                # Left child takes the NEW slot, right child keeps the old
                # slot (local.c:372-379). Both candidates in one vmap; their
                # means come free from the parent's cached bucket sums.
                bc, muc, axc, pminc, pmaxc, sc, mcc = cand_many(
                    labels, jnp.stack([new_id, c_star]),
                    mu_known=st.mu_child[c_star],
                )

                def upd(arr, vals):
                    return arr.at[new_id].set(vals[0]).at[c_star].set(vals[1])

                return st._replace(
                    labels=labels,
                    count=st.count + 1,
                    benefit=upd(st.benefit, bc),
                    mu=upd(st.mu, muc),
                    axis=upd(st.axis, axc),
                    pmin=upd(st.pmin, pminc),
                    pmax=upd(st.pmax, pmaxc),
                    split_bucket=upd(st.split_bucket, sc),
                    mu_child=upd(st.mu_child, mcc),
                )

            return jax.lax.cond(best < DELTA, stop, split, st)

        active = (~st.done) & (st.count < p)
        return jax.lax.cond(active, do_split, lambda s: s, st)

    state = jax.lax.fori_loop(0, p - 1, round_body, state)
    return state.labels, state.count
