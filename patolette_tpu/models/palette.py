"""Palette creation from cluster labels.

Mirrors PALETTE_create (/root/reference/lib/src/palette/create.c:11-33):
palette entry i = weighted center of cluster i. Formulated as one weighted
segment matmul over the labels array instead of per-cluster gathers.
"""

from __future__ import annotations

import jax.numpy as jnp

from patolette_tpu.ops import moments as M


def centers_from_labels(colors, weights, labels, num_slots: int,
                        axis_name=None):
    """Weighted cluster centers.

    Returns ``(centers (P,3), mass (P,))``; empty slots get zero centers and
    zero mass (the caller masks them out — the reference would emit NaN for
    an empty cluster's center, a latent edge case we do not reproduce).
    """
    n = colors.shape[0]
    w = jnp.ones((n,), colors.dtype) if weights is None else weights
    mom = M.segment_matmul(
        jnp.concatenate([w[:, None], w[:, None] * colors], axis=-1),
        labels,
        num_slots,
        axis_name=axis_name,
    )
    mass = mom[:, 0]
    ok = mass > 0.0
    centers = jnp.where(
        ok[:, None], mom[:, 1:4] / jnp.where(ok, mass, 1.0)[:, None], 0.0
    )
    return centers, mass
