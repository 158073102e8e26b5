"""Device-mesh scale-out for the quantization pipeline.

The reference is a single-process CPU library (SURVEY.md section 2.3); its
only parallelism is OpenMP loops inside vendored faiss. Here the pixel axis
``N`` — the structural "long axis" of this workload — is sharded over a 1-D
``pixels`` mesh (chips within a host over ICI, hosts over DCN), and:

  * all weighted moment tuples (11 floats per bucket/cluster) ride ``psum``
  * the 512-bucket GQ dynamic program and the greedy LQ/KMeans control run
    replicated on the all-reduced moments — only moments cross the wire
  * dithering runs per-shard on each shard's contiguous row strip with an
    error-queue reset at strip seams (BASELINE config 5: per-shard dither)

Everything is expressed with ``shard_map`` so the collective schedule is
explicit and testable on a virtual CPU mesh
(``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from patolette_tpu.models import pipeline as PIPE
from patolette_tpu.models import dither as DITH
from patolette_tpu.ops import colorspace as cs

AXIS = "pixels"


def make_mesh(devices=None):
    """1-D pixel mesh over the given (or all) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (AXIS,))


def shard_pixels(x, mesh):
    """Place a (N, ...) array row-sharded over the pixel axis."""
    return jax.device_put(x, NamedSharding(mesh, P(AXIS)))


def pad_to_shards(n: int, n_shards: int) -> int:
    return -(-n // n_shards) * n_shards


def quantize_palette_sharded(mesh, palette_size: int, color_space: int = 2,
                             kmeans_niter: int = 0,
                             kmeans_max_samples: int = 512**2,
                             seed: int = 1234):
    """Build the jitted sharded palette pipeline for a mesh.

    Returns ``fn(colors, weights) -> (palette_working, valid, palette_map)``
    where ``colors`` is (N, 3) row-sharded (N divisible by the mesh size)
    and ``weights`` is (N,) row-sharded (use ones for unweighted — a None
    static branch would double the compile cache).
    """

    def body(colors, weights):
        return PIPE.palette_pipeline_device(
            colors, weights, palette_size, color_space,
            kmeans_niter, kmeans_max_samples, seed, axis_name=AXIS,
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=(P(), P(), P(AXIS)),
        check_vma=False,
    )
    return jax.jit(mapped)


def dither_sharded(mesh, width: int, height: int, color_space: int,
                   segment: int = 4096):
    """Per-shard Riemersma dither over contiguous row strips.

    The image is split into ``n_shards`` horizontal strips (height must be
    divisible); each shard runs the full Hilbert dither on its strip with a
    fresh error queue — the documented per-shard dither semantics.
    """
    n_shards = mesh.devices.size
    assert height % n_shards == 0, "height must divide over the mesh"
    strip_h = height // n_shards

    def body(colors_working, palette_working, valid):
        c2020 = cs.working_to_linear_rec2020(colors_working, color_space)
        p2020 = cs.working_to_linear_rec2020(palette_working, color_space)
        return DITH._dither_stream(
            c2020, p2020, valid, width, strip_h, segment
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(AXIS), P(), P()),
        out_specs=P(AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)
