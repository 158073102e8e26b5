"""Pallas TPU kernel: segment-sum as an MXU one-hot matmul, VMEM-resident.

The XLA formulation of ``segment_matmul`` materializes a (chunk, S) one-hot
in HBM per chunk (~2 GB of traffic per LQ round at 1M pixels). This kernel
builds the one-hot inside VMEM per tile and accumulates the (S, F) output
across sequential grid steps, so HBM traffic is just the features + ids.

Used for every per-bucket / per-cluster moment accumulation on TPU
(LQ candidate stats, KMeans updates, palette centers); the XLA chunked-scan
path remains the fallback for CPU and oversized segment counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 2048


def _kernel(ids_ref, feats_ref, out_ref, *, num_segments):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:]  # (tile, 1) int32
    seg = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], num_segments), 1)
    onehot = (ids == seg).astype(feats_ref.dtype)
    contrib = jax.lax.dot_general(
        onehot,
        feats_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] += contrib


@functools.partial(jax.jit, static_argnames=("num_segments", "tile"))
def segment_matmul_tpu(feats, segment_ids, num_segments: int, tile: int = _TILE):
    """(N, F) features summed into (num_segments, F) by id — Pallas path.

    Zero-pads N to a tile multiple (padded rows carry zero features).
    """
    n, f = feats.shape
    pad = (-n) % tile
    if pad:
        feats = jnp.concatenate(
            [feats, jnp.zeros((pad, f), feats.dtype)], axis=0
        )
        segment_ids = jnp.concatenate(
            [segment_ids, jnp.zeros((pad,), segment_ids.dtype)], axis=0
        )
    n_pad = feats.shape[0]
    ids2 = segment_ids.reshape(-1, 1).astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, num_segments=num_segments),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_segments, f), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_segments, f), jnp.float32),
    )(ids2, feats)
    return out.astype(feats.dtype)
