"""Halo exchange along the spatial mesh axis (inside shard_map).

Each shard holds a contiguous band of plane rows; iterative kernels (median
window, CCL neighbor steps) need ``halo`` rows from each neighbor every
step.  Implemented with ``jax.lax.ppermute`` shifts over ICI; global plane
edges receive a fill value (or symmetric reflection for filter padding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from particle_col_image_segmentation_tpu.parallel.mesh import SPACE_AXIS

__all__ = ["exchange_rows", "pad_with_halo"]


def exchange_rows(x: jnp.ndarray, halo: int, axis_name: str = SPACE_AXIS):
    """Fetch ``halo`` boundary rows from the up/down neighbors of this shard.

    Args:
      x: [..., h_local, W] local band.
    Returns:
      (top, bottom): rows arriving from the previous / next shard; zeros at
      the global plane edges (non-participating ppermute receivers).
    """
    n = jax.lax.axis_size(axis_name)
    down_perm = [(i, i + 1) for i in range(n - 1)]  # send to next shard
    up_perm = [(i + 1, i) for i in range(n - 1)]  # send to previous shard
    top = jax.lax.ppermute(x[..., -halo:, :], axis_name, down_perm)
    bottom = jax.lax.ppermute(x[..., :halo, :], axis_name, up_perm)
    return top, bottom


def pad_with_halo(
    x: jnp.ndarray,
    halo: int,
    axis_name: str = SPACE_AXIS,
    edge_mode: str = "symmetric",
    fill=0,
):
    """[..., h, W] → [..., h+2·halo, W]: neighbor rows where available,
    ``edge_mode`` ('symmetric' reflection or 'constant' fill) at the global
    plane edges."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top, bottom = exchange_rows(x, halo, axis_name)
    if edge_mode == "symmetric":
        edge_top = jnp.flip(x[..., :halo, :], axis=-2)
        edge_bottom = jnp.flip(x[..., -halo:, :], axis=-2)
    else:
        edge_top = jnp.full_like(x[..., :halo, :], fill)
        edge_bottom = jnp.full_like(x[..., -halo:, :], fill)
    top = jnp.where((idx == 0), edge_top, top)
    bottom = jnp.where((idx == n - 1), edge_bottom, bottom)
    return jnp.concatenate([top, x, bottom], axis=-2)
