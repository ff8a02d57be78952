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


def _local_scans(lab, img):
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
    lab = seg_min_scan_bidi(lab, same_row, axis=-1)
    lab = jnp.swapaxes(
        seg_min_scan_bidi(
            jnp.swapaxes(lab, -1, -2), jnp.swapaxes(same_col, -1, -2), axis=-1
        ),
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


def _segment_shard(
    img, cfg: AnalysisConfig, particle_val: int, cell_vals, max_iters: int
):
    """Body run per shard: [b_loc, h_loc, W] →
    (den, lab, particle_ct, n_comp, filled, overlap_ct)."""
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

    def body(state):
        lab, _, i = state
        lab_p = pad_with_halo(lab, 1, edge_mode="constant", fill=_INF)
        img_p = pad_with_halo(den.astype(jnp.int32), 1, edge_mode="constant", fill=-1)
        lab_p = jnp.pad(
            lab_p, [(0, 0)] * (lab.ndim - 1) + [(1, 1)], constant_values=_INF
        )
        img_p = jnp.pad(
            img_p, [(0, 0)] * (lab.ndim - 1) + [(1, 1)], constant_values=-1
        )
        new = _neighbor_min_padded(lab_p, img_p)
        new = _local_scans(new, den)
        new = _local_pointer_jump(new, base)
        new = _local_pointer_jump(new, base)
        changed_local = jnp.any(new != lab).astype(jnp.int32)
        changed = jax.lax.psum(
            jax.lax.psum(changed_local, SPACE_AXIS), DATA_AXIS
        )
        return new, changed > 0, i + 1

    def cond(state):
        _, changed, i = state
        return changed & (i < max_iters)

    lab, _, _ = jax.lax.while_loop(cond, body, (lin, jnp.bool_(True), 0))

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
    return den, lab, particle_ct, n_comp, filled, overlap_ct


def make_sharded_segment_fn(
    mesh,
    cfg: AnalysisConfig,
    particle_val: int = 2,
    cell_vals=(1,),
    max_iters: int = 128,
):
    """Build the jitted sharded step: [B,H,W] uint8 →
    (den [B,H,W], labels [B,H,W] global-root ids, particle_px [B],
     n_comp [B], filled [B,H,W], overlap_px [B]).

    B shards over "data", H over "space"; the full per-plane pipeline
    (denoise → CCL → stats → particle fill) runs inside one shard_map.
    """
    fn = jax.shard_map(
        partial(
            _segment_shard,
            cfg=cfg,
            particle_val=particle_val,
            cell_vals=tuple(cell_vals),
            max_iters=max_iters,
        ),
        mesh=mesh,
        in_specs=P(DATA_AXIS, SPACE_AXIS, None),
        out_specs=(
            P(DATA_AXIS, SPACE_AXIS, None),
            P(DATA_AXIS, SPACE_AXIS, None),
            P(DATA_AXIS),
            P(DATA_AXIS),
            P(DATA_AXIS, SPACE_AXIS, None),
            P(DATA_AXIS),
        ),
    )
    return jax.jit(fn)


def sharded_segment_batch(
    batch, mesh, cfg: AnalysisConfig, particle_val: int = 2, cell_vals=(1,)
):
    """Convenience wrapper: run the sharded step on a host batch."""
    fn = make_sharded_segment_fn(mesh, cfg, particle_val, cell_vals)
    return fn(jnp.asarray(batch))
