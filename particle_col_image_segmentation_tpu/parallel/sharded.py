"""Spatially + batch-sharded segmentation step (shard_map over the mesh).

The scale-out path for BASELINE config #5 (100× 2048²×50 stacks): planes are
sharded batch-wise over the "data" axis and row-wise over the "space" axis.
Windowed ops use halo exchange; the distributed CCL runs the same
min-propagation fixpoint as the single-chip kernel with per-iteration halo
exchange of boundary labels (cross-shard components converge through the
boundary each round) and shard-local pointer jumping.  Convergence is a
global ``psum`` of the per-shard change flag, so every shard exits together.

Design notes (SURVEY.md §2.8): collectives are ppermute/psum over ICI —
the TPU-native replacement for the reference's nonexistent distributed
backend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from particle_col_image_segmentation_tpu.config import AnalysisConfig
from particle_col_image_segmentation_tpu.ops.edt import edt_sq
from particle_col_image_segmentation_tpu.ops.filters import median_label_filter_padded
from particle_col_image_segmentation_tpu.ops.scans import seg_min_scan_bidi
from particle_col_image_segmentation_tpu.parallel.halo import pad_with_halo
from particle_col_image_segmentation_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS

_INF = jnp.iinfo(jnp.int32).max

__all__ = ["sharded_segment_batch", "make_sharded_segment_fn"]


def _neighbor_min_padded(lab_p, img_p):
    """8-neighbor masked min where inputs carry a 1-px halo on rows/cols."""
    out = None
    H = lab_p.shape[-2] - 2
    W = lab_p.shape[-1] - 2
    center_img = img_p[..., 1 : 1 + H, 1 : 1 + W]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            lab_s = lab_p[..., 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            img_s = img_p[..., 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            cand = jnp.where(img_s == center_img, lab_s, _INF)
            out = cand if out is None else jnp.minimum(out, cand)
    return out


def _scan_masks(img):
    """Loop-invariant same-value masks for the row/column segmented scans
    (hoisted out of the fixpoint bodies — they depend only on the value
    image, not on the evolving labels)."""
    same_row = jnp.concatenate(
        [jnp.zeros(img.shape[:-1] + (1,), bool), img[..., :, 1:] == img[..., :, :-1]],
        axis=-1,
    )
    same_col = jnp.concatenate(
        [
            jnp.zeros(img.shape[:-2] + (1,) + img.shape[-1:], bool),
            img[..., 1:, :] == img[..., :-1, :],
        ],
        axis=-2,
    )
    return same_row, jnp.swapaxes(same_col, -1, -2)


def _local_scans(lab, masks):
    same_row, same_col_t = masks
    lab = seg_min_scan_bidi(lab, same_row, axis=-1)
    lab = jnp.swapaxes(
        seg_min_scan_bidi(jnp.swapaxes(lab, -1, -2), same_col_t, axis=-1),
        -1,
        -2,
    )
    return lab


def _local_pointer_jump(lab, base):
    """Jump only through targets resident on this shard (labels are global
    linear indices; base = first global index of the local band)."""
    shape = lab.shape
    flat = lab.reshape(shape[:-2] + (-1,))
    size = flat.shape[-1]
    local = flat - base
    ok = (local >= 0) & (local < size)
    idx = jnp.clip(local, 0, size - 1)
    jumped = jnp.take_along_axis(flat, idx, axis=-1)
    return jnp.minimum(flat, jnp.where(ok, jumped, _INF)).reshape(shape)


def _value_jump(vals, lab, base):
    """vals[p] ← min(vals[p], vals[root of p]) for on-shard roots (labels are
    global linear indices; base = first global index of the local band)."""
    shape = vals.shape
    flat_v = vals.reshape(shape[:-2] + (-1,))
    flat_l = lab.reshape(shape[:-2] + (-1,))
    size = flat_v.shape[-1]
    local = flat_l - base
    ok = (local >= 0) & (local < size)
    idx = jnp.clip(local, 0, size - 1)
    jumped = jnp.take_along_axis(flat_v, idx, axis=-1)
    return jnp.minimum(flat_v, jnp.where(ok, jumped, _INF)).reshape(shape)


def _compact_and_tables_shard(lab, lin, den, base, max_regions, max_iters):
    """Global compact ids + region tables from converged global root labels.

    Shards hold contiguous row bands in space-axis order, so the global
    raster rank of a root = (roots on earlier shards) + (local raster rank):
    one all_gather of per-shard root counts + a local cumsum.  Ranks then
    min-propagate from roots through their components with the same halo-
    exchange fixpoint as the CCL (value image = the root labels themselves,
    exactly component-constant), accelerated by root-gather jumps.  Tables
    are shard-local segment sums psum-reduced over the space axis.
    """
    is_root = lab == lin
    local_counts = jnp.sum(is_root.astype(jnp.int32), axis=(-2, -1))  # [b_loc]
    sidx = jax.lax.axis_index(SPACE_AXIS)
    all_counts = jax.lax.all_gather(local_counts, SPACE_AXIS)  # [n_space, b_loc]
    shard_ids = jax.lax.broadcasted_iota(jnp.int32, all_counts.shape, 0)
    before = jnp.sum(jnp.where(shard_ids < sidx, all_counts, 0), axis=0)

    ir = is_root.astype(jnp.int32)
    row_tot = jnp.sum(ir, axis=-1)  # [b_loc, h_loc]
    row_base = jnp.cumsum(row_tot, axis=-1) - row_tot
    rank = before[..., None, None] + row_base[..., None] + jnp.cumsum(ir, axis=-1)

    seed0 = jnp.where(is_root, rank, _INF)

    # value image (lab) is fixed under the loop: exchange its halo and build
    # the scan masks ONCE, not per iteration (one ppermute saved per round)
    l_p = pad_with_halo(lab, 1, edge_mode="constant", fill=-7)
    l_p = jnp.pad(l_p, [(0, 0)] * (lab.ndim - 1) + [(1, 1)], constant_values=-7)
    masks = _scan_masks(lab)
    b_planes = lab.shape[0]

    def body(state):
        s, _, _, i = state
        s_p = pad_with_halo(s, 1, edge_mode="constant", fill=_INF)
        s_p = jnp.pad(s_p, [(0, 0)] * (s.ndim - 1) + [(1, 1)], constant_values=_INF)
        new = _neighbor_min_padded(s_p, l_p)
        new = _local_scans(new, masks)
        new = _value_jump(new, lab, base)
        # per-plane change count over the space axis (planes on other DATA
        # shards are independent); the loop itself must exit in lockstep on
        # every device (collectives inside), hence the global any
        ch_planes = jax.lax.psum(
            jnp.any(new != s, axis=(-2, -1)).astype(jnp.int32), SPACE_AXIS
        )
        changed = jax.lax.psum(
            jax.lax.psum(jnp.any(ch_planes > 0).astype(jnp.int32), SPACE_AXIS),
            DATA_AXIS,
        )
        return new, ch_planes, changed > 0, i + 1

    def cond(state):
        _, _, changed, i = state
        return changed & (i < max_iters)

    ch0 = jax.lax.pcast(
        jnp.ones((b_planes,), jnp.int32), (DATA_AXIS,), to="varying"
    )
    seed, ch_planes, _, _ = jax.lax.while_loop(
        cond, body, (seed0, ch0, jnp.bool_(True), 0)
    )
    converged = ch_planes == 0  # [b_loc] per plane
    seg = jnp.where(seed == _INF, 0, seed)

    R = max_regions + 1
    b_loc = seg.shape[0]

    def tables_one(s2, v2):
        ids = s2.ravel()
        area = jax.ops.segment_sum(jnp.ones_like(ids), ids, num_segments=R)
        csum = jax.ops.segment_sum(v2.ravel().astype(jnp.int32), ids, num_segments=R)
        return area, csum

    area_l, csum_l = jax.vmap(tables_one)(seg, den)
    area = jax.lax.psum(area_l, SPACE_AXIS)
    csum = jax.lax.psum(csum_l, SPACE_AXIS)
    class_id = csum // jnp.maximum(area, 1)
    del b_loc
    return seg, area, class_id, converged


def _segment_shard(
    img, cfg: AnalysisConfig, particle_val: int, cell_vals, max_iters: int,
    with_tables: bool = False,
):
    """Body run per shard: [b_loc, h_loc, W] →
    (den, lab, particle_ct, n_comp, filled, overlap_ct[, seg, area, class_id])."""
    h_loc, W = img.shape[-2:]
    half = cfg.denoise_size // 2
    img_h = pad_with_halo(img, half, edge_mode="symmetric")
    img_h = jnp.pad(img_h, [(0, 0)] * (img.ndim - 1) + [(half, half)], mode="symmetric")
    den = median_label_filter_padded(img_h, cfg.denoise_size, cfg.num_classes)

    sidx = jax.lax.axis_index(SPACE_AXIS)
    row_offset = sidx * h_loc
    base = row_offset * W
    rows = jax.lax.broadcasted_iota(jnp.int32, den.shape, den.ndim - 2)
    cols = jax.lax.broadcasted_iota(jnp.int32, den.shape, den.ndim - 1)
    lin = (rows + row_offset) * W + cols
    # the while carry becomes data-varying inside the body (it mixes with
    # den); mark the seed accordingly for shard_map's vma type system
    lin = jax.lax.pcast(lin, (DATA_AXIS,), to="varying")

    # den is fixed under the loop — exchange its halo and build the scan
    # masks ONCE (one ppermute collective saved per iteration)
    img_p = pad_with_halo(den.astype(jnp.int32), 1, edge_mode="constant", fill=-1)
    img_p = jnp.pad(
        img_p, [(0, 0)] * (den.ndim - 1) + [(1, 1)], constant_values=-1
    )
    masks = _scan_masks(den)
    b_planes = den.shape[0]

    def body(state):
        lab, _, _, i = state
        lab_p = pad_with_halo(lab, 1, edge_mode="constant", fill=_INF)
        lab_p = jnp.pad(
            lab_p, [(0, 0)] * (lab.ndim - 1) + [(1, 1)], constant_values=_INF
        )
        new = _neighbor_min_padded(lab_p, img_p)
        new = _local_scans(new, masks)
        new = _local_pointer_jump(new, base)
        new = _local_pointer_jump(new, base)
        ch_planes = jax.lax.psum(
            jnp.any(new != lab, axis=(-2, -1)).astype(jnp.int32), SPACE_AXIS
        )
        changed = jax.lax.psum(
            jax.lax.psum(jnp.any(ch_planes > 0).astype(jnp.int32), SPACE_AXIS),
            DATA_AXIS,
        )
        return new, ch_planes, changed > 0, i + 1

    def cond(state):
        _, _, changed, i = state
        return changed & (i < max_iters)

    ch0 = jax.lax.pcast(
        jnp.ones((b_planes,), jnp.int32), (DATA_AXIS,), to="varying"
    )
    lab, ch_planes, _, _ = jax.lax.while_loop(
        cond, body, (lin, ch0, jnp.bool_(True), 0)
    )
    ccl_converged = ch_planes == 0  # [b_loc]

    particle_local = jnp.sum(
        (den == particle_val).astype(jnp.int32), axis=(-2, -1)
    )
    particle_ct = jax.lax.psum(particle_local, SPACE_AXIS)
    n_comp_local = jnp.sum((lab == lin).astype(jnp.int32), axis=(-2, -1))
    n_comp = jax.lax.psum(n_comp_local, SPACE_AXIS)

    # --- particle fill across shards (labels/analysis.py:95-113 semantics) -
    # The bounded EDT's influence range is ≤ cap rows, so exchanging a
    # cap-row halo and computing locally is exact.
    cap = max(cfg.dilation_radius, cfg.distance_threshold)
    dt2 = cfg.distance_threshold * cfg.distance_threshold
    dr2 = cfg.dilation_radius * cfg.dilation_radius
    filled = den
    overlap_ct = jnp.zeros(den.shape[:-2], jnp.int32)
    for sval in cell_vals:
        pm_ext = pad_with_halo(
            filled == particle_val, cap, edge_mode="constant", fill=False
        )
        d2 = edt_sq(pm_ext, cap=cap)[..., cap:-cap, :]
        overlap = (filled == sval) & ((d2 < dt2) | (d2 <= dr2))
        ov_local = jnp.sum(overlap.astype(jnp.int32), axis=(-2, -1))
        overlap_ct = overlap_ct + jax.lax.psum(ov_local, SPACE_AXIS)
        filled = jnp.where(overlap, jnp.asarray(particle_val, den.dtype), filled)
    if not with_tables:
        return den, lab, particle_ct, n_comp, filled, overlap_ct, ccl_converged
    seg, area, class_id, cmp_converged = _compact_and_tables_shard(
        lab, lin, den, base, cfg.max_regions, max_iters
    )
    return (den, lab, particle_ct, n_comp, filled, overlap_ct,
            ccl_converged & cmp_converged, seg, area, class_id)


def make_sharded_segment_fn(
    mesh,
    cfg: AnalysisConfig,
    particle_val: int = 2,
    cell_vals=(1,),
    max_iters: int = 128,
    with_tables: bool = False,
):
    """Build the jitted sharded step: [B,H,W] uint8 →
    (den [B,H,W], labels [B,H,W] global-root ids, particle_px [B],
     n_comp [B], filled [B,H,W], overlap_px [B], converged [B]).

    ``converged`` is per-plane: False means the distributed fixpoint hit its
    ``max_iters`` budget with labels still changing — the labels/tables for
    that plane are invalid and callers must surface the failure.

    With ``with_tables`` the step additionally returns the same per-region
    outputs as the single-chip fused pass (models/batch.py):
    seg [B,H,W] global compact ids (skimage raster order), area [B,R+1],
    class_id [B,R+1] — tables replicated across the space axis.

    B shards over "data", H over "space"; the full per-plane pipeline
    (denoise → CCL → compaction → tables → particle fill) runs inside one
    shard_map.
    """
    plane_specs = (
        P(DATA_AXIS, SPACE_AXIS, None),
        P(DATA_AXIS, SPACE_AXIS, None),
        P(DATA_AXIS),
        P(DATA_AXIS),
        P(DATA_AXIS, SPACE_AXIS, None),
        P(DATA_AXIS),
        P(DATA_AXIS),  # converged
    )
    if with_tables:
        plane_specs = plane_specs + (
            P(DATA_AXIS, SPACE_AXIS, None),
            P(DATA_AXIS),
            P(DATA_AXIS),
        )
    fn = jax.shard_map(
        partial(
            _segment_shard,
            cfg=cfg,
            particle_val=particle_val,
            cell_vals=tuple(cell_vals),
            max_iters=max_iters,
            with_tables=with_tables,
        ),
        mesh=mesh,
        in_specs=P(DATA_AXIS, SPACE_AXIS, None),
        out_specs=plane_specs,
    )
    return jax.jit(fn)


def sharded_segment_batch(
    batch, mesh, cfg: AnalysisConfig, particle_val: int = 2, cell_vals=(1,)
):
    """Convenience wrapper: run the sharded step on a host batch."""
    fn = make_sharded_segment_fn(mesh, cfg, particle_val, cell_vals)
    return fn(jnp.asarray(batch))
