"""Pallas TPU kernel: fused nearest-centroid assignment.

The XLA path materializes the (chunk, K) distance matrix in HBM
(~1 KB/pixel at K=256). This kernel keeps the distance tile in VMEM and
writes only the argmin labels (+ distances), so HBM traffic is the pixel
read + 8 B/pixel write.

Layout: pixels are fed TRANSPOSED as (3, N). A (tile, 3) narrow block would
make Mosaic pad the 3-lane dimension to 128 (42x wasted VMEM and DMA); with
(3, tile) the pixel axis rides the 128-lane dimension at full density and
the distance tile is (K, tile) with argmin over the sublane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 8192


def _kernel(xt_ref, cen_ref, c2_ref, lab_ref, dist_ref):
    xt = xt_ref[:]                     # (3, tile)
    cen = cen_ref[:]                   # (K, 3)
    c2 = c2_ref[:]                     # (K, 1) |c|^2, +inf for invalid slots
    prod = jax.lax.dot_general(
        cen, xt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                  # (K, tile)
    d = c2 - 2.0 * prod
    lab_ref[:] = jnp.argmin(d, axis=0, keepdims=True).astype(jnp.int32)
    x2 = jnp.sum(xt * xt, axis=0, keepdims=True)   # (1, tile)
    dist_ref[:] = jnp.maximum(jnp.min(d, axis=0, keepdims=True) + x2, 0.0)


@functools.partial(jax.jit, static_argnames=("tile",))
def assign_tpu(colors, centers, valid=None, tile: int = _TILE):
    """Nearest centroid per pixel, fused (labels, sq-distances).

    Ties resolve to the lowest index (argmin semantics), matching faiss /
    FLANN exact search. ``valid`` masks out dead palette slots.
    """
    n = colors.shape[0]
    k = centers.shape[0]
    c2 = jnp.sum(centers * centers, axis=-1)
    if valid is not None:
        c2 = jnp.where(valid, c2, jnp.inf)
    c2 = c2.reshape(k, 1)

    xt = colors.T                      # (3, N)
    pad = (-n) % tile
    if pad:
        xt = jnp.concatenate([xt, jnp.zeros((3, pad), colors.dtype)], axis=1)
    n_pad = xt.shape[1]

    labels, dists = pl.pallas_call(
        _kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
    )(xt, centers, c2)
    return labels[0, :n], dists[0, :n]
