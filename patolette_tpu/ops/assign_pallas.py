"""Pallas TPU kernel: fused nearest-centroid assignment.

The XLA path materializes the (chunk, K) distance matrix in HBM
(~1 KB/pixel at K=256). This kernel keeps the distance tile in VMEM and
writes only the argmin labels (+ optional distances), so HBM traffic is the
pixel read + 4-8 B/pixel write — speed-of-light for the op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024


def _kernel(x_ref, cen_ref, c2_ref, lab_ref, dist_ref):
    x = x_ref[:]                       # (tile, 3)
    cen = cen_ref[:]                   # (K, 3)
    c2 = c2_ref[:]                     # (1, K) |c|^2 with +inf for invalid
    prod = jax.lax.dot_general(
        x, cen,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                  # (tile, K)
    d = c2 - 2.0 * prod
    lab_ref[:] = jnp.argmin(d, axis=-1, keepdims=True).astype(jnp.int32)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    dist_ref[:] = jnp.maximum(jnp.min(d, axis=-1, keepdims=True) + x2, 0.0)


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
    c2 = c2.reshape(1, k)

    pad = (-n) % tile
    x = colors
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, 3), colors.dtype)], axis=0)
    n_pad = x.shape[0]

    labels, dists = pl.pallas_call(
        _kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ),
    )(x, centers, c2)
    return labels[:n, 0], dists[:n, 0]
