"""Region properties via segment reductions (TPU-native regionprops).

Replaces the reference's skimage ``regionprops`` Python loop
(tiff_analysis.py:746-773) with fixed-shape ``jax.ops.segment_*`` reductions
over compact label ids: area = count, centroid = Σcoords/area,
bbox = per-segment min/max, class = per-segment max of the (component-
homogeneous) class image.  Everything is static-shaped for jit: tables have
``max_regions + 1`` rows, row 0 being the background segment.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["RegionTable", "region_props"]


class RegionTable(NamedTuple):
    """Fixed-size per-region property table; row 0 = background/padding."""

    area: jnp.ndarray  # [R+1] int32
    cy: jnp.ndarray  # [R+1] float32 centroid row
    cx: jnp.ndarray  # [R+1] float32 centroid col
    bbox: jnp.ndarray  # [R+1, 4] int32 (minr, minc, maxr, maxc) half-open
    class_id: jnp.ndarray  # [R+1] int32 pixel value of the component
    valid: jnp.ndarray  # [R+1] bool (area>0 and not background row)


@partial(jax.jit, static_argnames=("max_regions",))
def region_props(seg: jnp.ndarray, img: jnp.ndarray, max_regions: int) -> RegionTable:
    """Compute RegionTable from compact ids ``seg`` (0 = background) and the
    class image ``img``."""
    H, W = seg.shape
    R = max_regions + 1
    ids = seg.ravel()
    ones = jnp.ones_like(ids)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).ravel()
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).ravel()

    area = jax.ops.segment_sum(ones, ids, num_segments=R)
    sum_r = jax.ops.segment_sum(rows, ids, num_segments=R)
    sum_c = jax.ops.segment_sum(cols, ids, num_segments=R)
    minr = jax.ops.segment_min(rows, ids, num_segments=R)
    minc = jax.ops.segment_min(cols, ids, num_segments=R)
    maxr = jax.ops.segment_max(rows, ids, num_segments=R)
    maxc = jax.ops.segment_max(cols, ids, num_segments=R)
    class_id = jax.ops.segment_max(img.ravel().astype(jnp.int32), ids, num_segments=R)

    safe_area = jnp.maximum(area, 1).astype(jnp.float32)
    cy = sum_r.astype(jnp.float32) / safe_area
    cx = sum_c.astype(jnp.float32) / safe_area
    bbox = jnp.stack([minr, minc, maxr + 1, maxc + 1], axis=-1)
    valid = (area > 0) & (jnp.arange(R) > 0)
    return RegionTable(
        area=area, cy=cy, cx=cx, bbox=bbox, class_id=class_id, valid=valid
    )
