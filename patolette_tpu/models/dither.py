"""Riemersma (Hilbert-curve) error-diffusion dithering.

Reference: /root/reference/lib/src/dither/riemersma.c. Semantics kept:

  * dithering runs in linear Rec2020 (riemersma.c:3-7; conversion handled by
    the caller / pipeline, patolette.c:268-298)
  * 16-deep error queue with exponentially decaying weights, ratio 16
    (riemersma.c:62-66, 360-373)
  * error-corrected colors are NOT clamped (riemersma.c:303-312)
  * nearest-palette search in luminance-weighted space with channel scale
    factors sqrt(Rec2020 Y coefficients) (riemersma.c:37-42)

TPU-native reformulation (SURVEY.md section 7, stage 8):
  * the serial recursive curve walk becomes a precomputed Hilbert
    permutation + gather (:mod:`patolette_tpu.ops.hilbert`)
  * the pixel chain becomes ``lax.scan`` with the error queue as carry; the
    FLANN query per pixel becomes a (K,3) distance argmin inside the scan
  * for parallel throughput the curve is tiled into fixed-length segments
    scanned in lock-step lanes (vmap); the error queue resets at segment
    seams (per-shard dither, BASELINE config 5). ``segment=0`` gives the
    fully serial chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from patolette_tpu.ops import colorspace as cs
from patolette_tpu.ops import hilbert

# sqrt of Rec2020 luma coefficients (riemersma.c:38-42)
R_WEIGHT = 0.51254268114958
G_WEIGHT = 0.8234075540095561
B_WEIGHT = 0.2435159132377184

QUEUE = 16   # error queue depth (riemersma.c:66)
QRATIO = 16  # first/last weight ratio (riemersma.c:63)


def _queue_weights(dtype):
    """w_i = m^i / QR, m = exp(ln(QR)/(Q-1)); oldest entry first
    (riemersma.c:360-373)."""
    m = jnp.exp(jnp.log(jnp.asarray(QRATIO, dtype)) / (QUEUE - 1))
    return jnp.power(m, jnp.arange(QUEUE, dtype=dtype)) / QRATIO


@functools.partial(jax.jit, static_argnames=("width", "height", "segment"))
def _dither_stream(colors2020, palette2020, valid, width, height, segment):
    n = width * height
    dtype = colors2020.dtype
    chan_w = jnp.asarray([R_WEIGHT, G_WEIGHT, B_WEIGHT], dtype)
    qw = _queue_weights(dtype)

    perm = hilbert.pixel_visit_order(width, height)
    stream = jnp.take(colors2020, perm, axis=0)  # (n, 3) in curve order

    pal_scaled = palette2020 * chan_w[None, :]
    pal_valid = valid

    seg = int(segment) if segment else n
    seg = max(1, min(seg, n))
    lanes = -(-n // seg)
    pad = lanes * seg - n
    if pad:
        stream = jnp.concatenate(
            [stream, jnp.zeros((pad, 3), dtype)], axis=0
        )
    stream = stream.reshape(lanes, seg, 3).transpose(1, 0, 2)  # (seg, lanes, 3)

    def step(queue, px):
        # queue: (lanes, QUEUE, 3); px: (lanes, 3)
        err = jnp.einsum("q,lqc->lc", qw, queue)
        corrected = px + err  # unclamped (riemersma.c:303-312)
        q = corrected * chan_w[None, :]
        d = (
            jnp.sum(pal_scaled * pal_scaled, axis=-1)[None, :]
            - 2.0 * jnp.dot(q, pal_scaled.T, precision="highest")
        )
        d = jnp.where(pal_valid[None, :], d, jnp.inf)
        idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
        chosen = jnp.take(palette2020, idx, axis=0)
        new_err = px - chosen
        queue = jnp.concatenate([queue[:, 1:], new_err[:, None, :]], axis=1)
        return queue, idx

    queue0 = jnp.zeros((lanes, QUEUE, 3), dtype)
    # unroll: the per-step body is tiny (a (lanes, K) distance + argmin), so
    # the scan is step-overhead-bound on TPU (~0.25 ms/step measured);
    # unrolling amortizes it 8x with bit-identical results.
    _, idx_stream = jax.lax.scan(
        step, queue0, stream, unroll=8
    )  # (seg, lanes)
    idx_flat = idx_stream.transpose(1, 0).reshape(-1)[:n]

    pmap = jnp.zeros((n,), jnp.int32).at[perm].set(idx_flat)
    return pmap


def riemersma_dither(colors_working, palette_working, valid, width, height,
                     color_space, segment=4096):
    """Dither the image against the palette; returns the palette map (N,).

    Converts colors and palette from the working space to linear Rec2020
    (patolette.c:274-287) and runs the segmented scan.
    """
    c2020 = cs.working_to_linear_rec2020(colors_working, color_space)
    p2020 = cs.working_to_linear_rec2020(palette_working, color_space)
    return _dither_stream(
        c2020, p2020, valid, int(width), int(height), int(segment)
    )


@functools.partial(jax.jit, static_argnames=("width", "height", "segment"))
def _dither_stream_planar(ch2020, palette2020, valid, width, height,
                          segment):
    """Channel-planar segmented dither scan.

    Same math as :func:`_dither_stream`, but pixels stay as three (N,)
    channel vectors: streams are (lanes, seg) per channel, the error queue
    is (QUEUE, lanes) per channel (queue depth in SUBLANES — the minor dim
    is the lane axis), and the per-step distance matrix is built from
    rank-1 channel broadcasts. No lane-padded (N, 3) intermediates.
    """
    n = width * height
    dtype = ch2020[0].dtype
    chan_w = (R_WEIGHT, G_WEIGHT, B_WEIGHT)
    qw = _queue_weights(dtype)[:, None]  # (QUEUE, 1)

    perm = hilbert.pixel_visit_order(width, height)

    seg = int(segment) if segment else n
    seg = max(1, min(seg, n))
    lanes = -(-n // seg)
    pad = lanes * seg - n

    streams = []
    for ch in ch2020:
        s = jnp.take(ch, perm)
        if pad:
            s = jnp.concatenate([s, jnp.zeros((pad,), dtype)])
        streams.append(s.reshape(lanes, seg))

    pal_scaled = [palette2020[:, k] * chan_w[k] for k in range(3)]
    ps2 = sum(p * p for p in pal_scaled)  # (K,)

    def step(queues, px):
        # queues: 3 x (QUEUE, lanes); px: 3 x (lanes,)
        corrected = [
            px[k] + jnp.sum(qw * queues[k], axis=0) for k in range(3)
        ]
        d = ps2[None, :] - 2.0 * sum(
            (corrected[k] * chan_w[k])[:, None] * pal_scaled[k][None, :]
            for k in range(3)
        )
        d = jnp.where(valid[None, :], d, jnp.inf)
        idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
        new_queues = []
        for k in range(3):
            err = px[k] - jnp.take(palette2020[:, k], idx)
            new_queues.append(
                jnp.concatenate([queues[k][1:], err[None, :]], axis=0)
            )
        return tuple(new_queues), idx

    queues0 = tuple(jnp.zeros((QUEUE, lanes), dtype) for _ in range(3))
    xs = tuple(s.T for s in streams)  # (seg, lanes) each
    # unroll=8: amortize TPU scan-step overhead (see _dither_stream)
    _, idx_stream = jax.lax.scan(
        step, queues0, xs, unroll=8
    )  # (seg, lanes)
    idx_flat = idx_stream.T.reshape(-1)[:n]

    return jnp.zeros((n,), jnp.int32).at[perm].set(idx_flat)


def riemersma_dither_planar(channels_working, palette_working, valid,
                            width, height, color_space, segment=4096):
    """Planar-channel variant of :func:`riemersma_dither`."""
    ch2020 = cs.working_to_linear_rec2020(
        tuple(channels_working), color_space
    )
    p2020 = cs.working_to_linear_rec2020(palette_working, color_space)
    return _dither_stream_planar(
        tuple(ch2020), p2020, valid, int(width), int(height), int(segment)
    )
