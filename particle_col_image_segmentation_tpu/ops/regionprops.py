"""Region properties via segment reductions (TPU-native regionprops).

Replaces the reference's skimage ``regionprops`` Python loop
(tiff_analysis.py:746-773) with fixed-shape ``jax.ops.segment_*`` reductions
over compact label ids: area = count, centroid = Σcoords/area,
bbox = per-segment min/max, class = per-segment max of the (component-
homogeneous) class image.  Everything is static-shaped for jit: tables have
``max_regions + 1`` rows, row 0 being the background segment.

Precision note: Σrow over a 2048² component can reach ~8.6e9, overflowing
int32 and losing float32 ulps.  Coordinate sums are therefore kept as exact
(hi, lo) int32 pairs with total = HILO_BASE·hi + lo; ``centroids_int`` floors
the exact quotient on device (for the reference's truncated-centroid lookups)
and ``centroids_f64`` reconstructs exact float64 centroids on host (ROI float
parity ≤1e-6 per BASELINE.json).  The base is 128 so both digits of any
coordinate ≤ 16383 fit the MXU's int8 operand range
(ops/regionprops_tiles.py); overflow check at base 128: lo-sums ≤ 4.2e6·127
≈ 5.3e8 and the floor-div intermediate 128·r1 + lo ≤ 1.1e9, both < 2³¹.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "HILO_BASE",
    "RegionTable",
    "CentroidTable",
    "region_props",
    "centroid_sums",
    "centroids_int",
    "centroids_f64",
]

HILO_BASE = 128  # (hi, lo) digit base; 128 keeps both digits int8-exact


class RegionTable(NamedTuple):
    """Fixed-size per-region property table; row 0 = background/padding."""

    area: jnp.ndarray  # [R+1] int32
    sr_hi: jnp.ndarray  # [R+1] int32   Σrow = HILO_BASE*sr_hi + sr_lo (exact)
    sr_lo: jnp.ndarray  # [R+1] int32
    sc_hi: jnp.ndarray  # [R+1] int32   Σcol = HILO_BASE*sc_hi + sc_lo (exact)
    sc_lo: jnp.ndarray  # [R+1] int32
    bbox: jnp.ndarray  # [R+1, 4] int32 (minr, minc, maxr, maxc) half-open
    class_id: jnp.ndarray  # [R+1] int32 pixel value of the component
    valid: jnp.ndarray  # [R+1] bool (area>0 and not background row)


class CentroidTable(NamedTuple):
    """Area + exact (hi, lo) centroid sums only — the 5 columns the refine
    pipeline consumes (``centroids_f64`` duck-types on these fields).  A
    full ``RegionTable`` also carries bbox extremes and the class channel,
    which cost a second (transposed) table pass the refine graph never
    reads (refine cells are all class 1)."""

    area: jnp.ndarray  # [..., R+1] int32
    sr_hi: jnp.ndarray  # [..., R+1] int32   Σrow = HILO_BASE*sr_hi + sr_lo
    sr_lo: jnp.ndarray  # [..., R+1] int32
    sc_hi: jnp.ndarray  # [..., R+1] int32   Σcol = HILO_BASE*sc_hi + sc_lo
    sc_lo: jnp.ndarray  # [..., R+1] int32


@partial(jax.jit, static_argnames=("max_regions",))
def centroid_sums(seg: jnp.ndarray, max_regions: int) -> CentroidTable:
    """CentroidTable from compact ids ``seg`` [H, W] (0 = background) — the
    scatter path (one fused 5-column segment_sum; non-TPU backends)."""
    H, W = seg.shape
    R = max_regions + 1
    ids = seg.ravel()
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).ravel()
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).ravel()
    add_cols = jnp.stack(
        [
            jnp.ones_like(ids),
            rows // HILO_BASE,
            rows % HILO_BASE,
            cols // HILO_BASE,
            cols % HILO_BASE,
        ],
        axis=-1,
    )
    sums = jax.ops.segment_sum(add_cols, ids, num_segments=R)
    return CentroidTable(*(sums[:, k] for k in range(5)))


def _exact_floor_div(hi: jnp.ndarray, lo: jnp.ndarray, d: jnp.ndarray):
    """floor((HILO_BASE*hi + lo) / d) in pure int32 (d ≥ 1; see module
    precision note for the no-overflow argument)."""
    q1 = hi // d
    r1 = hi - q1 * d
    t = HILO_BASE * r1 + lo
    q2 = t // d
    return HILO_BASE * q1 + q2


@partial(jax.jit, static_argnames=("max_regions",))
def region_props(seg: jnp.ndarray, img: jnp.ndarray, max_regions: int) -> RegionTable:
    """Compute RegionTable from compact ids ``seg`` (0 = background) and the
    class image ``img``.

    All reductions ride three fused scatters (one add, one min, one max of
    stacked columns) instead of nine separate segment ops — scatter passes
    over 4M ids dominate this op's cost on TPU.
    """
    H, W = seg.shape
    R = max_regions + 1
    ids = seg.ravel()
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).ravel()
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).ravel()

    add_cols = jnp.stack(
        [
            jnp.ones_like(ids),
            rows // HILO_BASE,
            rows % HILO_BASE,
            cols // HILO_BASE,
            cols % HILO_BASE,
        ],
        axis=-1,
    )
    sums = jax.ops.segment_sum(add_cols, ids, num_segments=R)
    area, sr_hi, sr_lo, sc_hi, sc_lo = (sums[:, k] for k in range(5))

    # bbox mins ride the same scatter-max as the maxes (min r = −max(−r))
    maxs = jax.ops.segment_max(
        jnp.stack(
            [rows, cols, img.ravel().astype(jnp.int32), -rows, -cols], axis=-1
        ),
        ids,
        num_segments=R,
    )
    bbox = jnp.stack(
        [-maxs[:, 3], -maxs[:, 4], maxs[:, 0] + 1, maxs[:, 1] + 1], axis=-1
    )
    class_id = maxs[:, 2]
    valid = (area > 0) & (jnp.arange(R) > 0)
    return RegionTable(
        area=area,
        sr_hi=sr_hi,
        sr_lo=sr_lo,
        sc_hi=sc_hi,
        sc_lo=sc_lo,
        bbox=bbox,
        class_id=class_id,
        valid=valid,
    )


@partial(jax.jit, static_argnames=("max_regions",))
def region_counts(seg: jnp.ndarray, img: jnp.ndarray, max_regions: int):
    """Light-weight variant for the throughput path: (area [R+1],
    class_id [R+1]) only — one scalar scatter-add + one scalar scatter-max,
    ~5× less scatter traffic than the full RegionTable."""
    R = max_regions + 1
    ids = seg.ravel()
    area = jax.ops.segment_sum(jnp.ones_like(ids), ids, num_segments=R)
    class_id = jax.ops.segment_max(
        img.ravel().astype(jnp.int32), ids, num_segments=R
    )
    return area, class_id


def centroids_int(table: RegionTable) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact truncated centroids ⌊Σrow/area⌋, ⌊Σcol/area⌋ (device int32) —
    the reference's ``int(r.centroid[...])`` lookup coordinates
    (tiff_analysis.py:844,851)."""
    d = jnp.maximum(table.area, 1)
    return (
        _exact_floor_div(table.sr_hi, table.sr_lo, d),
        _exact_floor_div(table.sc_hi, table.sc_lo, d),
    )


def centroids_f64(table) -> Tuple[np.ndarray, np.ndarray]:
    """Exact float64 centroids from a host-fetched table (NumPy arrays)."""
    area = np.maximum(np.asarray(table.area, dtype=np.int64), 1)
    sr = HILO_BASE * np.asarray(table.sr_hi, np.int64) + np.asarray(
        table.sr_lo, np.int64
    )
    sc = HILO_BASE * np.asarray(table.sc_hi, np.int64) + np.asarray(
        table.sc_lo, np.int64
    )
    return sr / area, sc / area
