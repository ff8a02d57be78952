"""Region tables on the MXU (Pallas): scatter-free segment reductions.

`jax.ops.segment_sum/max` over 4M pixel ids lower to scatters — the single
most expensive step of the fused pass (~38 ms/plane at 2048², more than the
CCL itself).  This kernel reformulates the per-region tables as matmuls:

  split each compact id into  q = id // 128,  m = id % 128
  counts[q, m]    = Σ_p 1[q_p = q] · 1[m_p = m]
  class_sum[q, m] = Σ_p 1[q_p = q] · 1[m_p = m] · img_p

i.e. one ``A @ Bᵀ`` per pixel row, where A = one-hot(q) [Q, W] and
B stacks one-hot(m) and digit·one-hot(m) rows [k·128, W].  One-hots are
generated in VMEM and consumed immediately by the MXU — the only HBM
traffic is reading ``seg``/``img`` once.  Operands ride the MXU's native
**int8 path with int32 accumulation** (2× the bf16 rate on v5e, and ~8×
end-to-end for these kernels once the f32→int32 conversion traffic goes
away): every operand is 0/1 or a base-128 (hi, lo) digit — the class/value
channel and the coordinates are both digit-split, so any value in
[-16384, 16383] is int8-exact and each digit's int32 accumulator is exact
for any plane size — no float rounding argument needed at all.  The final
``128·Σhi + Σlo`` recombination is int32 too: a region whose value-sum
exceeds int32 (|Σvals| ≥ 2³¹ — needs large values over multi-megapixel
regions) **saturates to ±INT32_MAX detectably** instead of wrapping
(`_recombine_saturating`).

Because every component is value-homogeneous (CCL labels within equal
classes, SURVEY.md §2.6), ``class_id = class_sum / area`` exactly —
recovering the segment-max semantics of ops.regionprops.region_counts
(reference regionprops call site: tiff_analysis.py:746, get_type :1041).

Out-of-capacity ids (id ≥ table size) match no one-hot row and are dropped,
mirroring XLA scatter's out-of-bounds-drop semantics.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particle_col_image_segmentation_tpu.ops.regionprops import HILO_BASE as _HL

__all__ = [
    "region_counts_mxu",
    "region_counts_auto",
    "centroid_sums_mxu",
    "centroid_sums_auto",
]

_M = 128  # lane width of the m = id % 128 axis


def _round_up(x: int, to: int) -> int:
    return (x + to - 1) // to * to


def _recombine_saturating(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """``128·hi + lo`` with detectable int32 saturation.

    The per-digit sums are int32-exact, but the recombined value-sum can
    exceed int32 for huge regions × large values; wrapping would be a
    silently-wrong table entry.  Fold ``lo``'s carry into ``hi`` (both
    |·| ≤ 128·plane_px, no overflow) so the residual digit is < 128, then
    the exact overflow test is a pure hi-digit bound.  ``lo ≥ 0`` by
    construction (it accumulates ``img % 128``).
    """
    h2 = hi + lo // _HL  # carry-folded hi digit
    ll = lo % _HL
    imax = jnp.int32(2**31 - 1)
    imin = jnp.int32(-(2**31))
    s = _HL * h2 + ll  # wraps on the lanes the wheres replace
    s = jnp.where(h2 > (2**31 - 1) // _HL, imax, s)
    return jnp.where(h2 < -(2**31) // _HL, imin, s)


def _counts_kernel(seg_ref, img_ref, out_ref, *, T: int, Qp: int, split: bool):
    """One [T, W] pixel chunk: accumulate [Qp, k*_M] int32.

    ``split=True`` (general-exact): counts ‖ val_hi ‖ val_lo — the value
    channel rides as base-128 (hi, lo) digits so any value in
    [-16384, 16383] stays int8-exact.  ``split=False`` (narrow fast path,
    only chosen when the caller statically bounds |values| ≤ 127):
    counts ‖ val_sum — one fewer matmul channel.

    The output block is the same for every chunk of a plane (revisited), so
    it persists in VMEM across the chunk grid and acts as the accumulator.
    """
    chunk = pl.program_id(1)
    nch = 3 if split else 2

    @pl.when(chunk == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    W = seg_ref.shape[-1]
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (Qp, W), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (nch * _M, W), 0)
    blk = c_iota // _M

    acc = out_ref[:, :]
    for r in range(T):
        ids = seg_ref[0, r : r + 1, :]  # [1, W]
        img = img_ref[0, r : r + 1, :].astype(jnp.int32)
        q = ids // _M
        m = ids % _M
        a = (q_iota == q).astype(jnp.int8)  # [Qp, W] one-hot of q
        hit = (c_iota % _M) == m
        if split:
            # counts rows ‖ value hi digit ‖ value lo digit (floor-div/mod,
            # so _HL·hi + lo == img exactly, negatives included)
            scale = jnp.where(
                blk == 0, 1, jnp.where(blk == 1, img // _HL, img % _HL)
            )
        else:
            scale = jnp.where(blk == 0, 1, img)
        b = jnp.where(hit, scale, 0).astype(jnp.int8)  # [nch*M, W]
        partial = jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + partial
    out_ref[:, :] = acc


def _run_counts(seg3, img3, R, rows_per_chunk, interpret, val_bound=None):
    """[B,H,W] ids + values → (area [B,R], val_sum [B,R]) int32 — exact for
    values in [-16384, 16383] (base-128 digit split keeps operands int8).
    ``val_bound``: static promise that |values| ≤ val_bound; ≤ 127 selects
    the narrower single-channel matmul (the hot fused path passes its
    num_classes here)."""
    B, H, W = seg3.shape
    T = rows_per_chunk
    assert H % T == 0, (H, T)
    Qp = _round_up(-(-R // _M), 16)  # bf16 sublane tile = 16
    split = val_bound is None or val_bound > 127
    nch = 3 if split else 2

    kernel = partial(_counts_kernel, T=T, Qp=Qp, split=split)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // T),
        in_specs=[
            pl.BlockSpec((1, T, W), lambda b, c: (b, c, 0)),
            pl.BlockSpec((1, T, W), lambda b, c: (b, c, 0)),
        ],
        out_specs=pl.BlockSpec((1, Qp, nch * _M), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Qp, nch * _M), jnp.int32),
        interpret=interpret,
    )(seg3.astype(jnp.int32), img3.astype(jnp.int32))

    area = out[:, :, :_M].reshape(B, Qp * _M)[:, :R]
    if not split:
        return area, out[:, :, _M:].reshape(B, Qp * _M)[:, :R]
    hi = out[:, :, _M : 2 * _M].reshape(B, Qp * _M)[:, :R]
    lo = out[:, :, 2 * _M :].reshape(B, Qp * _M)[:, :R]
    return area, _recombine_saturating(hi, lo)


@partial(jax.jit, static_argnames=(
    "max_regions", "rows_per_chunk", "interpret", "val_bound",
))
def region_counts_mxu(
    seg: jnp.ndarray,
    img: jnp.ndarray,
    max_regions: int,
    rows_per_chunk: int = 32,
    interpret: bool = False,
    val_bound: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(area [..., R+1], class_id [..., R+1]) from compact ids — MXU path.

    Drop-in for ops.regionprops.region_counts; accepts [H, W] or [B, H, W].
    Exact for class values in [-16384, 16383] (base-128 digit split);
    ``val_bound`` ≤ 127 is a static caller promise that selects a narrower
    matmul.  Empty rows hold class 0 (the scatter path's segment_max
    identity is INT32_MIN there) — callers mask by area > 0.
    """
    batched = seg.ndim == 3
    seg3 = seg if batched else seg[None]
    img3 = img if batched else img[None]
    area, class_sum = _run_counts(
        seg3, img3, max_regions + 1, rows_per_chunk, interpret,
        val_bound=val_bound,
    )
    class_id = class_sum // jnp.maximum(area, 1)
    if not batched:
        area, class_id = area[0], class_id[0]
    return area, class_id


@partial(jax.jit, static_argnames=(
    "max_regions", "rows_per_chunk", "interpret", "val_bound",
))
def region_sums_mxu(
    seg: jnp.ndarray,
    vals: jnp.ndarray,
    max_regions: int,
    rows_per_chunk: int = 32,
    interpret: bool = False,
    val_bound: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(area [..., R+1], Σvals [..., R+1]) per region — exact for int
    ``vals`` in [-16384, 16383] (base-128 digit split; int8 operands).
    ``val_bound`` ≤ 127 statically selects the narrower matmul."""
    batched = seg.ndim == 3
    seg3 = seg if batched else seg[None]
    val3 = vals if batched else vals[None]
    area, vsum = _run_counts(
        seg3, val3, max_regions + 1, rows_per_chunk, interpret,
        val_bound=val_bound,
    )
    if not batched:
        area, vsum = area[0], vsum[0]
    return area, vsum


_BIG = jnp.iinfo(jnp.int32).max


def _table_kernel(
    seg_ref, img_ref, out_ref, *, T: int, Qp: int, track_cols: bool,
    split_val: bool,
):
    """One [T, W] chunk of the full-table pass.

    Output columns (blocks of 128): area | cls_hi | cls_lo | sc_hi | sc_lo |
    sr_hi | sr_lo | -min_r | max_r.  The class/value channel rides as
    base-128 (hi, lo) digits — int8-exact for values in [-16384, 16383],
    same split as the column coordinates (``split_val=False``, chosen only
    under a static ≤ 127 caller bound, keeps it as one channel: area |
    class_sum | sc_hi | sc_lo | …).  Row sums ride the tiny [Qp, 128]
    count table (row index is constant within a row); column sums ride two
    extra one-hot channels in the matmul.  ``track_cols=False`` (the
    transposed bbox pass) keeps only area | -min_r | max_r.
    """
    chunk = pl.program_id(1)
    n_sum = out_ref.shape[-1] - 2 * _M  # sum channels; last two are -min/max

    @pl.when(chunk == 0)
    def _init():
        out_ref[0, :, :n_sum] = jnp.zeros((Qp, n_sum), jnp.int32)
        out_ref[0, :, n_sum:] = jnp.full((Qp, 2 * _M), -_BIG, jnp.int32)

    W = seg_ref.shape[-1]
    nch = (5 if split_val else 4) if track_cols else 1
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (Qp, W), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (nch * _M, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    acc = out_ref[0, :, :n_sum]
    neg_minr = out_ref[0, :, n_sum : n_sum + _M]
    maxr = out_ref[0, :, n_sum + _M :]
    for r in range(T):
        r_glob = chunk * T + r
        ids = seg_ref[0, r : r + 1, :]
        q = ids // _M
        m = ids % _M
        a = (q_iota == q).astype(jnp.int8)
        hit = (c_iota % _M) == m
        if track_cols:
            img = img_ref[0, r : r + 1, :].astype(jnp.int32)
            blk = c_iota // _M
            # (hi, lo) digits split at base 128 so both fit int8 — for the
            # class/value channel AND the column coordinates
            if split_val:
                scale = jnp.where(
                    blk == 0,
                    1,
                    jnp.where(
                        blk == 1,
                        img // _HL,
                        jnp.where(
                            blk == 2,
                            img % _HL,
                            jnp.where(blk == 3, col // _HL, col % _HL),
                        ),
                    ),
                )
            else:
                scale = jnp.where(
                    blk == 0,
                    1,
                    jnp.where(
                        blk == 1,
                        img,
                        jnp.where(blk == 2, col // _HL, col % _HL),
                    ),
                )
        else:
            scale = 1
        b = jnp.where(hit, scale, 0).astype(jnp.int8)
        sums = jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        counts = sums[:, :_M]
        if track_cols:
            acc = acc + jnp.concatenate(
                [sums, (r_glob // _HL) * counts, (r_glob % _HL) * counts], axis=-1
            )
        else:
            acc = acc + counts
        present = counts > 0
        neg_minr = jnp.maximum(neg_minr, jnp.where(present, -r_glob, -_BIG))
        maxr = jnp.maximum(maxr, jnp.where(present, r_glob, -_BIG))
    out_ref[0, :, :n_sum] = acc
    out_ref[0, :, n_sum : n_sum + _M] = neg_minr
    out_ref[0, :, n_sum + _M :] = maxr


def _run_table(seg3, img3, R, rows_per_chunk, interpret, track_cols,
               val_bound=None):
    B, H, W = seg3.shape
    T = rows_per_chunk
    assert H % T == 0, (H, T)
    Qp = _round_up(-(-R // _M), 16)
    split_val = val_bound is None or val_bound > 127
    n_sum = ((7 if split_val else 6) if track_cols else 1)
    n_out = n_sum + 2  # sum channels + (-min, max)

    operands = [seg3.astype(jnp.int32)]
    in_specs = [pl.BlockSpec((1, T, W), lambda b, c: (b, c, 0))]
    if track_cols:
        operands.append(img3.astype(jnp.int32))
        in_specs.append(pl.BlockSpec((1, T, W), lambda b, c: (b, c, 0)))
    else:
        operands.append(seg3[:, :1, :1].astype(jnp.int32))  # unused stub
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda b, c: (b, 0, 0)))

    kernel = partial(
        _table_kernel, T=T, Qp=Qp, track_cols=track_cols, split_val=split_val
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, H // T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Qp, n_out * _M), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Qp, n_out * _M), jnp.int32),
        interpret=interpret,
    )(*operands)

    def tab(k):
        return out[:, :, k * _M : (k + 1) * _M].reshape(B, Qp * _M)[:, :R]

    return [tab(k) for k in range(n_out)]


@partial(jax.jit, static_argnames=(
    "max_regions", "rows_per_chunk", "interpret", "val_bound",
))
def region_table_mxu(
    seg: jnp.ndarray,
    img: jnp.ndarray,
    max_regions: int,
    rows_per_chunk: int = 32,
    interpret: bool = False,
    val_bound: int | None = None,
):
    """Full RegionTable via the MXU — drop-in for ops.regionprops.region_props.

    Two passes: the natural orientation accumulates area, class, exact
    (hi, lo) centroid sums, and row extremes; a pass over the transposed
    plane reuses the same kernel for column extremes.  Exact for class
    values in [-16384, 16383]; a static ``val_bound`` ≤ 127 drops one
    matmul channel.  Identical tables to region_props on valid rows (empty
    rows: zeros here vs scatter identities there; ``valid`` masks both).
    """
    from particle_col_image_segmentation_tpu.ops.regionprops import RegionTable

    R = max_regions + 1
    batched = seg.ndim == 3
    seg3 = seg if batched else seg[None]
    img3 = img if batched else img[None]

    cols = _run_table(
        seg3, img3, R, rows_per_chunk, interpret, track_cols=True,
        val_bound=val_bound,
    )
    if len(cols) == 9:  # value digit-split
        (area, cls_hi, cls_lo, sc_hi, sc_lo, sr_hi, sr_lo, neg_minr,
         maxr) = cols
        class_sum = _recombine_saturating(cls_hi, cls_lo)
    else:  # narrow path under a static ≤ 127 bound
        area, class_sum, sc_hi, sc_lo, sr_hi, sr_lo, neg_minr, maxr = cols
    segT = jnp.swapaxes(seg3, -1, -2)
    _, neg_minc, maxc = _run_table(
        segT, img3, R, rows_per_chunk, interpret, track_cols=False
    )

    class_id = class_sum // jnp.maximum(area, 1)
    bbox = jnp.stack([-neg_minr, -neg_minc, maxr + 1, maxc + 1], axis=-1)
    valid = (area > 0) & (jnp.arange(R)[None, :] > 0)
    table = RegionTable(
        area=area,
        sr_hi=sr_hi,
        sr_lo=sr_lo,
        sc_hi=sc_hi,
        sc_lo=sc_lo,
        bbox=bbox,
        class_id=class_id,
        valid=valid,
    )
    if not batched:
        table = RegionTable(*(t[0] for t in table))
    return table


def region_props_auto(seg: jnp.ndarray, img: jnp.ndarray, max_regions: int,
                      val_bound: int | None = None):
    """Backend dispatch for the full table: MXU on TPU, scatters elsewhere.

    Both paths are exact for class values in [-16384, 16383]; a static
    ``val_bound`` ≤ 127 lets the MXU path drop one matmul channel."""
    from particle_col_image_segmentation_tpu.ops.regionprops import region_props

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    H, W = seg.shape[-2:]
    if on_tpu and H % 8 == 0 and W % 8 == 0:
        rpc = 32 if (H % 32 == 0 and W % 32 == 0) else 8
        return region_table_mxu(seg, img, max_regions, rows_per_chunk=rpc,
                                val_bound=val_bound)
    if seg.ndim == 3:
        return jax.vmap(lambda s, d: region_props(s, d, max_regions))(seg, img)
    return region_props(seg, img, max_regions)


def _centroid_kernel(seg_ref, out_ref, *, T: int, Qp: int):
    """One [T, W] chunk of the centroid-sums pass — ONE dot per chunk.

    Output columns (blocks of 128): area | sc_hi | sc_lo | sr_hi | sr_lo.
    The T rows flatten into a single K = T·W contraction (per-ROW dots at
    W ≤ 512 waste the MXU on tiny K tiles — 512 dispatches/plane measured
    ~4× the matmul floor at [16, 512²]).  Per-pixel column digits and the
    row LO digit ride matmul channels (base-128 split, int8-exact for
    W ≤ 16383); the row HI digit is CONSTANT within a chunk (T divides
    128 and chunks are T-aligned, so a chunk never crosses a 128-row
    boundary) and scales the count block after the dot.  No value
    channel, no bbox extremes, no transposed pass — the minimal table the
    refine graph consumes (models/refine.py)."""
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        out_ref[0, :, :] = jnp.zeros_like(out_ref[0])

    W = seg_ref.shape[-1]
    K = T * W
    ids = seg_ref[0].reshape(1, K)
    q = ids // _M
    m = ids % _M
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (Qp, K), 0)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    col = pos % W
    row_lo = (chunk * T + pos // W) % _HL  # per-pixel r % 128
    a = (q_iota == q).astype(jnp.int8)  # [Qp, K] one-hot of q
    # b = the four column blocks [m-one-hot | ·col_hi | ·col_lo | ·row_lo]:
    # ONE [128, K] compare + three [1, K]-broadcast scalings, instead of the
    # iota/compare/3-deep-where cascade over the full [4·128, K] — ~5× less
    # VPU build work per chunk (the build, not the dot, dominates this
    # kernel; chip A/B in docs/PERF.md, outputs bit-identical).  Scaling
    # rides int32 (8-bit vector ops are restricted in Mosaic) and casts to
    # int8 at the end — every factor is < 128 so the cast is exact.
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (_M, K), 0)
    m1h = (m_iota == m).astype(jnp.int32)  # [128, K]
    b = jnp.concatenate(
        [m1h, m1h * (col // _HL), m1h * (col % _HL), m1h * row_lo], axis=0
    ).astype(jnp.int8)  # [4M, K]
    sums = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [Qp, 4M]: counts | sc_hi | sc_lo | sr_lo
    counts = sums[:, :_M]
    r_hi = (chunk * T) // _HL  # constant across the chunk (T | 128)
    out_ref[0, :, :] += jnp.concatenate(
        [sums[:, : 3 * _M], r_hi * counts, sums[:, 3 * _M :]], axis=-1
    )


@partial(jax.jit, static_argnames=("max_regions", "rows_per_chunk", "interpret"))
def centroid_sums_mxu(
    seg: jnp.ndarray,
    max_regions: int,
    rows_per_chunk: int = 32,
    interpret: bool = False,
):
    """CentroidTable (area + exact (hi, lo) centroid sums) via the MXU.

    The 5-column subset of ``region_table_mxu`` the refine pipeline reads —
    drops the value channel, bbox extremes, and the whole transposed pass
    (~2.5× the table work at max_regions=4096).  Identical columns to
    ``ops.regionprops.centroid_sums`` on every row (parity-tested)."""
    from particle_col_image_segmentation_tpu.ops.regionprops import (
        CentroidTable,
    )

    R = max_regions + 1
    batched = seg.ndim == 3
    seg3 = seg if batched else seg[None]
    B, H, W = seg3.shape
    T = rows_per_chunk
    assert H % T == 0, (H, T)
    # the kernel hoists the row HI digit out of the dot, which needs every
    # chunk inside one 128-row block: T must divide 128
    assert 128 % T == 0, T
    Qp = _round_up(-(-R // _M), 16)
    kernel = partial(_centroid_kernel, T=T, Qp=Qp)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // T),
        in_specs=[pl.BlockSpec((1, T, W), lambda b, c: (b, c, 0))],
        out_specs=pl.BlockSpec((1, Qp, 5 * _M), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Qp, 5 * _M), jnp.int32),
        interpret=interpret,
    )(seg3.astype(jnp.int32))

    def tab(k):
        cols = out[:, :, k * _M : (k + 1) * _M].reshape(B, Qp * _M)[:, :R]
        return cols if batched else cols[0]

    return CentroidTable(
        area=tab(0), sc_hi=tab(1), sc_lo=tab(2), sr_hi=tab(3), sr_lo=tab(4)
    )


def centroid_sums_auto(seg: jnp.ndarray, max_regions: int):
    """Backend dispatch for the centroid-sums table: MXU on TPU, the fused
    5-column scatter elsewhere."""
    from particle_col_image_segmentation_tpu.ops.regionprops import (
        centroid_sums,
    )

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    H, W = seg.shape[-2:]
    if on_tpu and H % 8 == 0 and W % 8 == 0:
        # largest 128-divisor chunk that divides H, capped so one chunk's
        # flattened contraction stays VMEM-friendly (b is [4·128, T·W] int8)
        rpc = 8
        for t in (32, 16, 8):
            if H % t == 0 and t * W <= 32768:
                rpc = t
                break
        return centroid_sums_mxu(seg, max_regions, rows_per_chunk=rpc)
    if seg.ndim == 3:
        return jax.vmap(lambda s: centroid_sums(s, max_regions))(seg)
    return centroid_sums(seg, max_regions)


def _lookup_kernel(seg_ref, tab_ref, out_ref, *, T: int, Qp: int):
    """out[p] = table[seg[p]] for one [T, W] chunk, gather-free.

    U = table-as-[2·Qp,128] @ one-hot(m) puts T[q, m_p] in every q-row of a
    [2·Qp, W] tile; a q-match select + sublane reduction picks each pixel's
    own row.  The MXU does the "gather"; no random addressing anywhere.
    The table arrives as two base-128 digit planes stacked on the Q axis
    (hi rows 0..Qp, lo rows Qp..2Qp) so the operands stay int8-exact for
    values up to 255.
    """
    W = seg_ref.shape[-1]
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * Qp, W), 0)
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (_M, W), 0)
    tab = tab_ref[0].astype(jnp.int8)  # [2*Qp, 128] digit planes, ≤ 127
    for r in range(T):
        ids = seg_ref[0, r : r + 1, :]
        q = ids // _M
        m = ids % _M
        m1h = (m_iota == m).astype(jnp.int8)  # [128, W]
        u = jax.lax.dot_general(
            tab,
            m1h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [2*Qp, W]: hi digit in row q, lo digit in row Qp+q
        # ids outside capacity must read 0: without the q < Qp gate,
        # q_iota == q would match a LO-digit row (row q is the lo plane of
        # q - Qp), returning 128·table[id - Qp·128] instead of 0; without
        # the q >= 0 gate, a negative id (raw CCL background = -1 gives
        # q = -1) would match hit_lo at row Qp-1 — the last HI-digit row
        in_cap = (q >= 0) & (q < Qp)
        hit_hi = (q_iota == q) & in_cap
        hit_lo = (q_iota == (q + Qp)) & in_cap
        picked = jnp.sum(
            jnp.where(hit_hi, _HL * u, jnp.where(hit_lo, u, 0)),
            axis=0,
            keepdims=True,
        )
        out_ref[0, r : r + 1, :] = picked


@partial(jax.jit, static_argnames=("rows_per_chunk", "interpret"))
def table_lookup_mxu(
    seg: jnp.ndarray,
    table: jnp.ndarray,
    rows_per_chunk: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Scatter/gather-free ``table[seg]`` broadcast of a per-region table
    back to pixels.  Exact for int table values in [0, 255] (two base-128
    int8 digit planes); ids outside [0, len(table)) read 0.

    ``seg``: [H, W] or [B, H, W] int ids; ``table``: [R] or [B, R] int.
    """
    batched = seg.ndim == 3
    seg3 = seg if batched else seg[None]
    tab2 = table if table.ndim == 2 else table[None]
    B, H, W = seg3.shape
    R = tab2.shape[-1]
    T = rows_per_chunk
    assert H % T == 0, (H, T)
    Qp = _round_up(-(-R // _M), 16)
    tab_pad = jnp.zeros((B, Qp * _M), jnp.int32).at[:, :R].set(
        tab2.astype(jnp.int32)
    ).reshape(B, Qp, _M)
    tab_digits = jnp.concatenate([tab_pad // _HL, tab_pad % _HL], axis=1)

    kernel = partial(_lookup_kernel, T=T, Qp=Qp)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // T),
        in_specs=[
            pl.BlockSpec((1, T, W), lambda b, c: (b, c, 0)),
            pl.BlockSpec((1, 2 * Qp, _M), lambda b, c: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, W), lambda b, c: (b, c, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        interpret=interpret,
    )(seg3.astype(jnp.int32), tab_digits)
    return out if batched else out[0]


def table_lookup_auto(seg: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Backend dispatch for table[seg]: MXU broadcast on TPU, gather elsewhere.

    Ids outside [0, len(table)) read 0 on both paths (a raw gather would
    CLAMP past-capacity ids to the last row and WRAP negative ids — both
    clipped + masked here to match the MXU kernel)."""
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu and seg.shape[-2] % 8 == 0:
        rpc = 32 if seg.shape[-2] % 32 == 0 else 8
        return table_lookup_mxu(seg, table, rows_per_chunk=rpc)
    R = table.shape[-1]
    idx = jnp.clip(seg, 0, R - 1)
    if seg.ndim == 3 and table.ndim == 2:
        out = jax.vmap(lambda s, t: t[s])(idx, table.astype(jnp.int32))
    else:
        out = table.astype(jnp.int32)[idx]
    return jnp.where((seg >= 0) & (seg < R), out, 0)


def region_counts_auto(
    seg: jnp.ndarray, img: jnp.ndarray, max_regions: int,
    val_bound: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backend dispatch: MXU histogram kernel on TPU, scatter path elsewhere.

    Both paths are exact for values in [-16384, 16383]; a static
    ``val_bound`` ≤ 127 lets the MXU path drop one matmul channel."""
    from particle_col_image_segmentation_tpu.ops.regionprops import region_counts

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    H = seg.shape[-2]
    if on_tpu and H % 8 == 0:
        rpc = 32 if H % 32 == 0 else 8
        return region_counts_mxu(
            seg, img, max_regions, rows_per_chunk=rpc, val_bound=val_bound
        )
    if seg.ndim == 3:
        return jax.vmap(lambda s, d: region_counts(s, d, max_regions))(seg, img)
    return region_counts(seg, img, max_regions)
