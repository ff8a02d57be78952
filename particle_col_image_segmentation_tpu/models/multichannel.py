"""Multi-channel fusion device ops (reference tiff_analysis.py:224-249).

Label-space remaps are pure ``jnp.where`` stamping — cheap, fused by XLA.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from particle_col_image_segmentation_tpu.config import BASE_TYPE_MAP, STRAIN_MAP

__all__ = ["rfp_base_remap", "combine_channels_device", "fuse_channels"]


@partial(jax.jit, static_argnames=("six_b07_base",))
def rfp_base_remap(rfp: jnp.ndarray, six_b07_base: bool) -> jnp.ndarray:
    """Remap RFP channel values into BASE_TYPE space (reference :224-231).

    six_b07_base=True for strain sets ["6B07"] / ["6B07","C3M10"] (RFP plane
    has no cell class: 1→Particle, 2→Background); otherwise 2→Particle,
    3→Background with 3D05 cells staying 1.
    """
    if six_b07_base:
        out = jnp.where(rfp == 1, jnp.uint8(4), rfp)
        out = jnp.where(rfp == 2, jnp.uint8(5), out)
    else:
        out = jnp.where(rfp == 2, jnp.uint8(4), rfp)
        out = jnp.where(rfp == 3, jnp.uint8(5), out)
    return out


@partial(jax.jit, static_argnames=("strain_vals",))
def combine_channels_device(
    base: jnp.ndarray,
    channel_planes: Tuple[jnp.ndarray, ...],
    strain_vals: Tuple[int, ...],
) -> jnp.ndarray:
    """Stamp each channel's cell pixels (value 1) with its strain's BASE_TYPE
    value (reference :233-249; 3D05 skipped by the caller since it is already
    the base)."""
    out = base
    for plane, val in zip(channel_planes, strain_vals):
        out = jnp.where(plane == 1, jnp.uint8(val), out)
    return out


def fuse_channels(
    channel_ds_arrs: Dict[str, jnp.ndarray], cell_strains
) -> jnp.ndarray:
    """Host convenience: full reference fusion — RFP base remap + stamping of
    every non-3D05 strain present (reference :202-204)."""
    cell_strains = list(cell_strains)
    six_b07_base = cell_strains in (["6B07"], ["6B07", "C3M10"])
    base = rfp_base_remap(jnp.asarray(channel_ds_arrs["RFP"]), six_b07_base)
    planes, vals = [], []
    strain_of_val = {name: val for val, name in BASE_TYPE_MAP.items()}
    for strain in cell_strains:
        if strain == "3D05":
            continue
        planes.append(jnp.asarray(channel_ds_arrs[STRAIN_MAP[strain]]))
        vals.append(strain_of_val[strain])
    if not planes:
        return base
    return combine_channels_device(base, tuple(planes), tuple(vals))
