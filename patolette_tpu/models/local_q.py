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
               axis_name=None, mu_known=None, exact_range=False):
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
    w0 = mom[M.IDX_W0]
    d = M.moments_distortion(mom)
    cov = M.moments_cov(mom)
    axis, evals = eigen3.principal_axis(cov)

    # Projection range (sort.c:12-92). The reference uses the exact
    # [min, max] of the projections (an extra O(N) reduce); the default
    # analytic range +-4 sigma comes free from the top eigenvalue
    # (projections of the mean-centered cluster have mean 0 and variance
    # lambda_max). Outliers clip into the edge buckets — which CONCENTRATES
    # the 512-bucket resolution where the mass is instead of letting
    # outliers stretch the range (divergence S7; exact_range=True restores
    # reference behavior).
    proj = M.project(x, axis)
    if exact_range:
        pmin = jnp.min(jnp.where(mask, proj, jnp.inf))
        pmax = jnp.max(jnp.where(mask, proj, -jnp.inf))
        if axis_name is not None:
            pmin = jax.lax.pmin(pmin, axis_name)
            pmax = jax.lax.pmax(pmax, axis_name)
        pmin = jnp.where(jnp.isfinite(pmin), pmin, 0.0)
        pmax = jnp.where(jnp.isfinite(pmax), pmax, 0.0)
    else:
        sigma = jnp.sqrt(jnp.maximum(evals[2], 0.0))
        pmax = 4.0 * sigma
        pmin = -pmax
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
    # chunk >= default sample size: the single-einsum path avoids nesting a
    # scan inside the (vmap in cond in fori) loop body — significantly
    # smaller XLA graph and compile time.
    bstats = M.segment_matmul(feats, buckets, bucket_count,
                              axis_name=axis_name, fast=True,
                              chunk=1 << 18)
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
    # A size<=1 or empty cluster has zero distortion, hence zero benefit —
    # the reference's explicit size guard (local.c:186-190) is implied, and
    # skipping the count saves a full reduction pass per candidate.
    benefit = jnp.where(w0 <= 0.0, 0.0, benefit)

    # Child means from the cumulative shifted sums (linearity of the
    # weighted mean): free when this split is later applied.
    mu_l = mu + csl[s] / jnp.maximum(sl[s], _EPS)
    mu_r = mu + (cst - csl[s]) / jnp.maximum(sr[s], _EPS)
    mu_child = jnp.stack([mu_l, mu_r])
    return benefit, mu, axis, pmin, pmax, s, mu_child


def lq_quantize(colors, weights, init_labels, k0, palette_size: int,
                bucket_count=BUCKET_COUNT, axis_name=None,
                batch_splits: int = 1, exact_range: bool = False):
    """Greedy splitting from ``k0`` initial clusters up to ``palette_size``.

    Args:
      colors: (N, 3) working-space colors.
      weights: (N,) or None.
      init_labels: (N,) int32 labels in [0, k0).
      k0: traced or static scalar, initial cluster count (<= 12).
      palette_size: static int.
      batch_splits: clusters split per round. 1 reproduces the reference's
        strictly sequential greedy (local.c:347-390). B > 1 splits the top-B
        benefit clusters per round — a documented divergence (S6) that cuts
        the sequential round count ~B-fold with quality validated to be
        neutral (the top-B by benefit are almost always what B successive
        greedy rounds would have picked).

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
                    axis_name=axis_name, exact_range=exact_range,
                )
            )(ids)
        return jax.vmap(
            lambda cid, mk: _candidate(
                colors, w, labels_arr, cid, bucket_count,
                axis_name=axis_name, mu_known=mk, exact_range=exact_range,
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

    # Cap the batch relative to the palette: with B comparable to the live
    # cluster count, batching degrades into balanced splitting (every
    # cluster splits regardless of benefit). ~P/32 keeps the split order
    # near-greedy where it matters.
    bsz = max(1, min(int(batch_splits), (p + 31) // 32, p - 1))

    def round_body(_, st):
        def do_round(st):
            vals, sel = jax.lax.top_k(st.benefit, bsz)
            sel = sel.astype(jnp.int32)
            # top_k is value-sorted, so the valid entries form a prefix:
            # benefit >= DELTA and room left in the palette.
            room = p - st.count
            j_idx = jnp.arange(bsz, dtype=jnp.int32)
            valid = (vals >= DELTA) & (j_idx < room)
            m = jnp.sum(valid, dtype=jnp.int32)

            def stop(st):
                return st._replace(done=jnp.asarray(True))

            def split(st):
                # sel_map: cluster id -> its rank j among this round's
                # splits (or -1). One gather-pass relabels every selected
                # cluster's left side to slot count + j simultaneously
                # (disjoint parents => no conflicts).
                sel_map = jnp.full((p,), -1, jnp.int32)
                sel_map = sel_map.at[sel].set(
                    jnp.where(valid, j_idx, -1), mode="drop"
                )
                jpix = sel_map[st.labels]                 # (N,)
                active_px = jpix >= 0
                lsafe = st.labels
                proj = jnp.sum(
                    (colors - st.mu[lsafe]) * st.axis[lsafe], axis=-1
                )
                span = st.pmax[lsafe] - st.pmin[lsafe]
                scale = jnp.where(span > 0.0, 1.0 / jnp.where(span > 0.0, span, 1.0), 0.0)
                ratio = (proj - st.pmin[lsafe]) * scale
                buckets = jnp.clip(
                    (ratio * bucket_count).astype(jnp.int32), 0,
                    bucket_count - 1,
                )
                left = active_px & (buckets <= st.split_bucket[lsafe])
                labels = jnp.where(left, st.count + jpix, st.labels)

                # Left child takes the NEW slot (count + j), right child
                # keeps the old slot (local.c:372-379). All 2B candidates in
                # one vmap; means come free from the parents' bucket sums.
                left_ids = st.count + j_idx
                ids2b = jnp.concatenate([left_ids, sel])
                mu_known = jnp.concatenate(
                    [st.mu_child[sel, 0], st.mu_child[sel, 1]]
                )
                bc, muc, axc, pminc, pmaxc, sc, mcc = cand_many(
                    labels, ids2b, mu_known=mu_known
                )

                valid2 = jnp.concatenate([valid, valid])
                # Invalid selections can collide with valid left-child slots
                # (top_k picks arbitrary zero-benefit indices); route their
                # writes out of bounds so mode="drop" discards them.
                ids2b_w = jnp.where(valid2, ids2b, p)

                def upd(arr, vals_new):
                    return arr.at[ids2b_w].set(vals_new, mode="drop")

                return st._replace(
                    labels=labels,
                    count=st.count + m,
                    benefit=upd(st.benefit, bc),
                    mu=upd(st.mu, muc),
                    axis=upd(st.axis, axc),
                    pmin=upd(st.pmin, pminc),
                    pmax=upd(st.pmax, pmaxc),
                    split_bucket=upd(st.split_bucket, sc),
                    mu_child=upd(st.mu_child, mcc),
                )

            return jax.lax.cond(m == 0, stop, split, st)

        active = (~st.done) & (st.count < p)
        return jax.lax.cond(active, do_round, lambda s: s, st)

    # Ramp-up headroom: early rounds can split at most count clusters, so
    # from k0 = 1 it takes ~log2(bsz) doubling rounds before bsz splits per
    # round are possible. Extra rounds no-op once count reaches p.
    ramp = max(1, bsz).bit_length()
    rounds = -(-(p - 1) // bsz) + ramp
    state = jax.lax.fori_loop(0, rounds, round_body, state)
    return state.labels, state.count
