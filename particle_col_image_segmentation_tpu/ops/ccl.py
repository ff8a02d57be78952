"""Connected-component labeling on TPU.

Replaces the reference's skimage union-find CCL (call sites:
tiff_analysis.py:744, 829, 260; refine_boundaries.py:63) with an iterative
min-label propagation that XLA compiles to pure vector work:

  label₀ = linear pixel index
  repeat until fixpoint:
    1. 8-neighbor masked min        (bridges diagonals, one hop)
    2. row + column segmented scans (log-depth, propagates along runs)
    3. pointer jumping  lab ← lab[lab]  ×2  (collapses long chains)

The min over same-valued neighbors is a semilattice update, so the fixpoint is
iteration-order independent (determinism by construction; SURVEY.md §5).
At convergence every pixel holds the minimum linear index of its component —
compacting those roots in ascending order reproduces skimage's raster-order
label ids exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from particle_col_image_segmentation_tpu.ops.scans import seg_min_scan_bidi

__all__ = ["connected_components", "compact_labels", "label_image"]

_INF = jnp.iinfo(jnp.int32).max


def _window_min_same(x, connectivity: int):
    """3×3 (or cross) windowed min via fused reduce_window; SAME padding
    supplies the +INF boundary directly (no pre-pad, layouts stay aligned)."""
    n = x.ndim
    if connectivity == 8:
        return jax.lax.reduce_window(
            x,
            jnp.int32(_INF),
            jax.lax.min,
            window_dimensions=(1,) * (n - 2) + (3, 3),
            window_strides=(1,) * n,
            padding="SAME",
        )
    xr = jax.lax.reduce_window(
        x, jnp.int32(_INF), jax.lax.min,
        window_dimensions=(1,) * (n - 2) + (1, 3),
        window_strides=(1,) * n, padding="SAME",
    )
    xc = jax.lax.reduce_window(
        x, jnp.int32(_INF), jax.lax.min,
        window_dimensions=(1,) * (n - 2) + (3, 1),
        window_strides=(1,) * n, padding="SAME",
    )
    return jnp.minimum(xr, xc)


def _neighbor_min(lab, img, connectivity: int, num_classes: int):
    """Min label over same-valued neighbors (and self).

    Class-decomposed with all classes stacked on one leading axis, so a
    single fused windowed min covers every class (stacking is nearly free;
    per-class separate reduce_windows are ~num_classes× slower).  Pixels
    whose value is outside [0, num_classes) — the uniquified background
    sentinels — take no neighbors and keep their own label.
    """
    stacked = jnp.stack(
        [jnp.where(img == v, lab, _INF) for v in range(num_classes)]
    )
    mins = _window_min_same(stacked, connectivity)
    out = lab
    for v in range(num_classes):
        out = jnp.where(img == v, jnp.minimum(out, mins[v]), out)
    return out


def _pointer_jump(lab):
    flat = lab.reshape(lab.shape[:-2] + (-1,))
    idx = jnp.clip(flat, 0, flat.shape[-1] - 1)
    jumped = jnp.take_along_axis(flat, idx, axis=-1)
    return jnp.minimum(flat, jumped).reshape(lab.shape)


@partial(
    jax.jit,
    static_argnames=("connectivity", "max_iters", "num_classes", "with_flag"),
)
def connected_components(
    img: jnp.ndarray,
    background: Optional[jnp.ndarray] = None,
    connectivity: int = 8,
    max_iters: int = 64,
    num_classes: int = 8,
    with_flag: bool = False,
) -> jnp.ndarray:
    """Label components of equal-valued pixels.

    Args:
      img: [..., H, W] integer class image with values in [0, num_classes).
      background: optional scalar — pixels with this value get label -1
        (skimage background=0 semantics). None labels every pixel.
      connectivity: 8 (skimage 2D default) or 4.
      max_iters: safety bound on the fixpoint loop.
      num_classes: exclusive upper bound on pixel values (static; drives the
        class-decomposed neighbor-min).
      with_flag: also return a per-plane bool ``converged`` ([...] batch
        shape) — False means ``max_iters`` ran out with labels still
        changing; the labels are then NOT a valid CCL and callers must
        surface the failure rather than use them.

    Returns:
      [..., H, W] int32; each foreground pixel holds the minimum linear index
      (row-major, per plane) of its component; background pixels hold -1.
    """
    H, W = img.shape[-2:]
    img = img.astype(jnp.int32)
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, img.shape, img.ndim - 2) * W
        + jax.lax.broadcasted_iota(jnp.int32, img.shape, img.ndim - 1)
    )
    if background is not None:
        fg = img != background
        # unique negative value per background pixel prevents bg-bg merging
        img = jnp.where(fg, img, -2 - lin)
    else:
        fg = jnp.ones(img.shape, bool)

    same_row = jnp.concatenate(
        [jnp.zeros(img.shape[:-1] + (1,), bool), img[..., :, 1:] == img[..., :, :-1]],
        axis=-1,
    )
    same_col = jnp.concatenate(
        [jnp.zeros(img.shape[:-2] + (1, W), bool), img[..., 1:, :] == img[..., :-1, :]],
        axis=-2,
    )

    batch_shape = img.shape[:-2]

    def body(state):
        lab, _, i = state
        new = _neighbor_min(lab, img, connectivity, num_classes)
        new = seg_min_scan_bidi(new, same_row, axis=-1)
        new = seg_min_scan_bidi(new, same_col, axis=-2)
        # Pointer jumping is only an accelerator — at the neighbor-min
        # fixpoint labels are already component-constant (min-update between
        # every neighbor pair forces equality).  Random gathers are the most
        # expensive step on TPU, so jump every 4th round only: worst-case
        # chains still collapse log-fast, common blobs converge on scans
        # alone.
        new = jax.lax.cond(i % 4 == 3, _pointer_jump, lambda l: l, new)
        changed = jnp.any(new != lab, axis=(-2, -1))  # per plane
        return new, changed, i + 1

    def cond(state):
        _, changed, i = state
        return jnp.any(changed) & (i < max_iters)

    lab0 = lin
    lab, changed, _ = jax.lax.while_loop(
        cond, body, (lab0, jnp.ones(batch_shape, bool), 0)
    )
    out = jnp.where(fg, lab, -1)
    if with_flag:
        return out, ~changed
    return out


@partial(jax.jit, static_argnames=("max_regions",))
def compact_labels(
    raw: jnp.ndarray, max_regions: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact root labels to skimage-style ids — sort-free.

    Every component's label is the linear index of its root (first) pixel, so
    the compact id of a component is simply the number of roots at or before
    its root position: one prefix-sum over the root-indicator plane plus one
    gather, instead of a 4M-element sort-unique.

    Args:
      raw: [H, W] output of connected_components (single plane).
      max_regions: static capacity hint (kept in the signature so callers pin
        table sizes; ``num`` is always the true count — callers must check it
        against their capacity).

    Returns:
      seg: [H, W] int32 ids — 0 for background (-1), 1..N in raster order of
        each component's first pixel (skimage ordering).
      num: true number of components (may exceed max_regions).
    """
    del max_regions  # shape-independent now; kept for API stability
    H, W = raw.shape
    flat = raw.ravel()
    lin = jnp.arange(H * W, dtype=jnp.int32)
    fg = flat >= 0
    is_root = (flat == lin) & fg
    prefix = jnp.cumsum(is_root.astype(jnp.int32))  # rank of each root, 1-based
    num = prefix[-1]
    seg = jnp.where(fg, prefix[jnp.clip(flat, 0, H * W - 1)], 0)
    return seg.reshape(H, W), num


@partial(
    jax.jit,
    static_argnames=("max_regions", "tile", "interpret", "with_flag", "max_sweeps"),
)
def compact_labels_sweeps(
    raw: jnp.ndarray,
    max_regions: int,
    tile: int = 64,
    interpret: bool = False,
    val: jnp.ndarray = None,
    with_flag: bool = False,
    max_sweeps: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """compact_labels without the 4M-element gather (TPU band-sweep path).

    ``prefix[flat]`` in compact_labels is a whole-plane random gather —
    slower on TPU than the CCL that produced the labels.  This variant
    computes the same ids gather-free:

      1. root-rank image: rank[p] = #roots at-or-before p in raster order —
         the within-row cumsum rides the MXU as ``is_root @ upper_tri``
         (0/1 bf16 operands, f32 accumulation; counts ≤ W < 2²⁴, exact),
         the across-row base is a cumsum over H scalars per plane;
      2. seed L = rank at root pixels, +INF elsewhere, and min-propagate
         through each component with the same Gauss-Seidel band sweeps as
         the CCL itself (ops/ccl_tiles.min_propagate, value image = raw:
         component-constant, so propagation never crosses components).

    Ids are identical to compact_labels (rank of the component's root in
    raster order, skimage ordering).  Accepts [H, W] or [B, H, W].

    ``val``: optional value image to propagate through instead of ``raw`` —
    any image whose neighbor-equality relation is "same component" works,
    and the denoised uint8 class plane (for background=None labelings)
    rides HBM at ¼ the traffic.  Pixels where raw < 0 never seed either way.
    """
    del max_regions
    from particle_col_image_segmentation_tpu.ops.ccl_tiles import min_propagate

    batched = raw.ndim == 3
    raw3 = raw if batched else raw[None]
    B, H, W = raw3.shape
    # Seeding, ranks, and root counting all happen INSIDE the first down
    # sweep (init="rank", ops/ccl_tiles._rank_init_kernel): a running root
    # count in SMEM across the raster-ordered band grid replaces the
    # whole-plane cumsum/einsum, and ``raw`` is read exactly once.
    # Background (raw < 0) seeds 0 — it shares no value with fg, so 0 never
    # leaks, and every non-fg pixel is non-INF from the start.  Propagated
    # values can only ever be a component's OWN seed, so the fixpoint is
    # reached exactly when no +INF remains (converge_on="inf" — no confirm
    # sweep).
    vimg = raw3 if val is None else val.reshape(raw3.shape)
    res = min_propagate(
        raw3, vimg, tile=tile, interpret=interpret, converge_on="inf",
        init="rank", with_flag=with_flag, max_sweeps=max_sweeps,
    )
    seg, band_counts = res[0], res[1]
    num = jnp.sum(band_counts, axis=-1)
    if not batched:
        seg, num = seg[0], num[0]
    else:
        num = num.reshape(raw.shape[:-2])
    if with_flag:
        conv = res[2]
        return seg, num, (conv.reshape(raw.shape[:-2]) if batched else conv[0])
    return seg, num


def compact_labels_auto(
    raw: jnp.ndarray, max_regions: int, val: jnp.ndarray = None,
    with_flag: bool = False, max_sweeps: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backend dispatch: band-sweep compaction on TPU, gather path elsewhere.

    ``with_flag=True`` appends a per-plane ``converged`` bool (the gather
    path is non-iterative and always converged)."""
    H, W = raw.shape[-2:]
    tile = _pick_band_tile(H)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu and tile is not None and W % 128 == 0:
        return compact_labels_sweeps(
            raw, max_regions, tile=tile, val=val, with_flag=with_flag,
            max_sweeps=max_sweeps,
        )
    if raw.ndim == 3:
        seg, num = jax.vmap(lambda r: compact_labels(r, max_regions))(raw)
    else:
        seg, num = compact_labels(raw, max_regions)
    if with_flag:
        return seg, num, jnp.ones(raw.shape[:-2], bool)
    return seg, num


def _pick_band_tile(H: int):
    import os

    override = os.environ.get("PCIS_BAND_TILE")  # tuning knob (scripts/)
    if override and H % int(override) == 0:
        return int(override)
    # 128 needs the raised Mosaic scoped-vmem cap (ccl_tiles._VMEM_LIMIT)
    # and measures ~2x faster than 64 at 2048x2048 on v5e (fewer, taller
    # bands amortize per-band DMA + loop overhead)
    for t in (128, 64, 32, 16, 8):
        if H % t == 0:
            return t
    return None


def connected_components_auto(
    img: jnp.ndarray,
    background: Optional[int] = None,
    connectivity: int = 8,
    num_classes: int = 8,
    with_flag: bool = False,
    max_iters: int = 64,
    max_sweeps: int = 16,
) -> jnp.ndarray:
    """connected_components with automatic kernel selection.

    On TPU backends, 2D (or leading-batched) planes with band-divisible
    heights use the Pallas Gauss-Seidel band sweeps (ops/ccl_tiles.py,
    ~7× faster); everything else falls back to the XLA fixpoint.  Both
    produce identical labels.  ``with_flag=True`` appends a per-plane
    ``converged`` bool — False means the kernel's iteration budget ran out
    (pathological worst-case geometry) and the labels are invalid.
    """
    import jax as _jax

    backend = _jax.default_backend()
    H, W = img.shape[-2:]
    tile = _pick_band_tile(H)
    on_tpu = backend not in ("cpu", "gpu")
    # band DMAs need lane-aligned widths (Mosaic memref slicing)
    if tile is None or W % 128 != 0 or not on_tpu:
        return connected_components(
            img, background=background, connectivity=connectivity,
            num_classes=num_classes, with_flag=with_flag,
            max_iters=max_iters,
        )
    from particle_col_image_segmentation_tpu.ops.ccl_tiles import ccl_sweeps

    return ccl_sweeps(
        img, background=background, connectivity=connectivity, tile=tile,
        with_flag=with_flag, max_sweeps=max_sweeps,
    )


def label_image(
    img: jnp.ndarray,
    background: Optional[int] = None,
    connectivity: int = 8,
    max_regions: int = 16384,
    num_classes: int = 8,
):
    """skimage.measure.label parity: (ids [H,W], num_components)."""
    raw = connected_components(
        img, background=background, connectivity=connectivity, num_classes=num_classes
    )
    return compact_labels(raw, max_regions)
