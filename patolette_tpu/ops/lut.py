"""24-bit palette-map LUT: device build + host-side fused gather.

For uint8 images the palette map is a pure function of the pixel *value*:
the reference's exact NN mapping (/root/reference/lib/src/palette/
nearest.c:150-209, ICtCp per /root/reference/lib/src/patolette.c:140) sends
two equal pixels to the same palette entry, and a uint8 sRGB pixel has only
2^24 possible values. So instead of shipping N pixels to the device and N
indices back (4 bytes/pixel — 400 MB at 100 MP through a ~40 MB/s link),
the device enumerates all 16.7M codes with an on-device iota (nothing is
uploaded), maps each to its nearest palette entry, and ships ONE 16.7 MB
uint8 table back; the host then resolves every pixel with a fused 24-bit
pack + gather (native C++ in ``patolette_tpu/native``, numpy fallback).

The result is bit-identical to mapping each pixel directly (same distance
formula and lowest-index tie-breaking as :mod:`patolette_tpu.ops.assign`),
while the wire cost becomes independent of the image size.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from patolette_tpu.ops import colorspace as cs

LUT_SIZE = 1 << 24
_CHUNK = 1 << 17  # 128 scan steps; (chunk, 256) f32 transient = 134 MB


def lut_dtype(palette_size: int):
    """Narrowest wire dtype that can hold a palette index."""
    if palette_size <= 256:
        return jnp.uint8
    if palette_size <= 65536:
        return jnp.uint16
    return jnp.int32


@functools.partial(jax.jit, static_argnames=("color_space", "out_dtype"))
def build_lut_device(palette_working, valid, color_space: int,
                     out_dtype=jnp.uint8):
    """(2^24,) nearest-palette-index table over all uint8 sRGB colors.

    ``palette_working``: (P, 3) palette in the working color space;
    ``valid``: (P,) bool live-slot mask (invalid slots never win). Mapping
    happens in ICtCp regardless of working space (quirk Q4 semantics,
    patolette.c:140), exactly like :func:`pipeline._nn_map_stage_planar`.
    """
    dtype = palette_working.dtype
    pi = cs.working_to_ictcp(palette_working, color_space)
    c2 = jnp.sum(pi * pi, axis=-1)
    pa, pb, pc = pi[:, 0], pi[:, 1], pi[:, 2]
    inv = jnp.asarray(1.0 / 255.0, dtype)

    def body(_, start):
        codes = start + jax.lax.iota(jnp.int32, _CHUNK)
        r = ((codes >> 16) & 0xFF).astype(dtype) * inv
        g = ((codes >> 8) & 0xFF).astype(dtype) * inv
        b = (codes & 0xFF).astype(dtype) * inv
        xw = cs.srgb_to_working((r, g, b), color_space)
        xa, xb, xc = cs.working_to_ictcp(xw, color_space)
        d = c2[None, :] - 2.0 * (
            xa[:, None] * pa[None, :]
            + xb[:, None] * pb[None, :]
            + xc[:, None] * pc[None, :]
        )
        d = jnp.where(valid[None, :], d, jnp.inf)
        return None, jnp.argmin(d, axis=-1).astype(out_dtype)

    starts = jnp.arange(0, LUT_SIZE, _CHUNK, dtype=jnp.int32)
    _, lut = jax.lax.scan(body, None, starts)
    return lut.reshape(-1)


def lut_map_host(colors_u8: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Resolve (N, 3) uint8 pixels through the 24-bit LUT on the host.

    Uses the threaded native pack+gather when available; otherwise numpy.
    Returns int32 on BOTH paths (the public palette-map dtype; the native
    path fuses the widen into the gather, the numpy path widens explicitly).
    """
    from patolette_tpu import native

    out = native.lut_map_u8(colors_u8, lut)
    if out is not None:
        return out
    codes = (
        (colors_u8[:, 0].astype(np.int32) << 16)
        | (colors_u8[:, 1].astype(np.int32) << 8)
        | colors_u8[:, 2].astype(np.int32)
    )
    return lut[codes].astype(np.int32, copy=False)
