"""Region tables on the MXU (Pallas): scatter-free segment reductions.

`jax.ops.segment_sum/max` over 4M pixel ids lower to scatters — the single
most expensive step of the fused pass (~38 ms/plane at 2048², more than the
CCL itself).  This kernel reformulates the per-region tables as matmuls:

  split each compact id into  q = id // 128,  m = id % 128
  counts[q, m]    = Σ_p 1[q_p = q] · 1[m_p = m]
  class_sum[q, m] = Σ_p 1[q_p = q] · 1[m_p = m] · img_p

i.e. one ``A @ Bᵀ`` per pixel row, where A = one-hot(q) [Q, W] and
B stacks one-hot(m) and img·one-hot(m) [2·128, W].  One-hots are generated
in VMEM and consumed immediately by the MXU — the only HBM traffic is
reading ``seg``/``img`` once.  Products are 0/1 (or 0..num_classes) exactly
representable in bf16; the MXU accumulates in f32 and per-row partials are
≤ 7·W, so converting each partial to int32 and accumulating in int32 keeps
the tables exact for any plane size.

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

__all__ = ["region_counts_mxu", "region_counts_auto"]

_M = 128  # lane width of the m = id % 128 axis


def _round_up(x: int, to: int) -> int:
    return (x + to - 1) // to * to


def _counts_kernel(seg_ref, img_ref, out_ref, *, T: int, Qp: int):
    """One [T, W] pixel chunk: accumulate [Qp, 2*_M] int32 (counts ‖ class_sum).

    The output block is the same for every chunk of a plane (revisited), so
    it persists in VMEM across the chunk grid and acts as the accumulator.
    """
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    W = seg_ref.shape[-1]
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (Qp, W), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * _M, W), 0)

    acc = out_ref[:, :]
    for r in range(T):
        ids = seg_ref[0, r : r + 1, :]  # [1, W]
        img = img_ref[0, r : r + 1, :].astype(jnp.int32)
        q = ids // _M
        m = ids % _M
        a = (q_iota == q).astype(jnp.bfloat16)  # [Qp, W] one-hot of q
        hit = (c_iota % _M) == m
        scale = jnp.where(c_iota < _M, 1, img)  # counts rows ‖ img rows
        b = jnp.where(hit, scale, 0).astype(jnp.bfloat16)  # [2M, W]
        partial = jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + partial.astype(jnp.int32)
    out_ref[:, :] = acc


@partial(jax.jit, static_argnames=("max_regions", "rows_per_chunk", "interpret"))
def region_counts_mxu(
    seg: jnp.ndarray,
    img: jnp.ndarray,
    max_regions: int,
    rows_per_chunk: int = 32,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(area [..., R+1], class_id [..., R+1]) from compact ids — MXU path.

    Drop-in for ops.regionprops.region_counts; accepts [H, W] or [B, H, W].
    """
    R = max_regions + 1
    batched = seg.ndim == 3
    seg3 = seg if batched else seg[None]
    img3 = img if batched else img[None]
    B, H, W = seg3.shape
    T = rows_per_chunk
    assert H % T == 0, (H, T)
    Qp = _round_up(-(-R // _M), 16)  # bf16 sublane tile = 16

    kernel = partial(_counts_kernel, T=T, Qp=Qp)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // T),
        in_specs=[
            pl.BlockSpec((1, T, W), lambda b, c: (b, c, 0)),
            pl.BlockSpec((1, T, W), lambda b, c: (b, c, 0)),
        ],
        out_specs=pl.BlockSpec((1, Qp, 2 * _M), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Qp, 2 * _M), jnp.int32),
        interpret=interpret,
    )(seg3.astype(jnp.int32), img3.astype(jnp.int32))

    area = out[:, :, :_M].reshape(B, Qp * _M)[:, :R]
    class_sum = out[:, :, _M:].reshape(B, Qp * _M)[:, :R]
    class_id = class_sum // jnp.maximum(area, 1)
    if not batched:
        area, class_id = area[0], class_id[0]
    return area, class_id


def region_counts_auto(
    seg: jnp.ndarray, img: jnp.ndarray, max_regions: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backend dispatch: MXU histogram kernel on TPU, scatter path elsewhere."""
    from particle_col_image_segmentation_tpu.ops.regionprops import region_counts

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    H = seg.shape[-2]
    if on_tpu and H % 8 == 0:
        rpc = 32 if H % 32 == 0 else 8
        return region_counts_mxu(seg, img, max_regions, rows_per_chunk=rpc)
    if seg.ndim == 3:
        return jax.vmap(lambda s, d: region_counts(s, d, max_regions))(seg, img)
    return region_counts(seg, img, max_regions)
