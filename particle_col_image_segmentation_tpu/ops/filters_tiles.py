"""Pallas median filter for label planes (scipy-exact, VMEM-resident).

The XLA path (ops/filters.py) materializes packed threshold planes through
``reduce_window`` — int32 intermediates many times the plane size.  This
kernel reads the uint8 plane once, packs/windows/unpacks entirely in VMEM,
and writes the uint8 result once (reference call sites:
tiff_analysis.py:122,643).

Semantics identical to ``scipy.ndimage.median_filter(img, size=5,
mode='reflect')``: rows are pre-reflected into each plane's slot at the XLA
level; column reflection is applied as per-edge-column corrections inside
the kernel (reflect: index −1 → 0, −2 → 1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particle_col_image_segmentation_tpu.ops.filters import (
    _threshold_packing,
    median_from_counts,
    pack_thresholds,
)

__all__ = ["median_label_filter_pallas", "median_label_filter_auto"]


_VHALO = 4  # VMEM window halo rows each side (≥ half; keeps windows 8-aligned)


def _median_kernel(img_hbm, out_ref, *, T, half, size, num_classes, slot):
    """One [T, W] output chunk from a [T+2·_VHALO, W] input window (DMA row
    counts must be 8-aligned on TPU, so the halo is 4 even though the 5×5
    window only needs 2 — the outermost halo rows are never read)."""
    chunk = pl.program_id(1)
    plane = pl.program_id(0)
    start = plane * slot + chunk * T  # window top (slot rows are pre-padded)
    W = img_hbm.shape[-1]
    win = T + 2 * _VHALO
    half_rank = (size * size) // 2 + 1
    bits, groups = _threshold_packing(size, num_classes)
    off = _VHALO - half  # first row feeding the vertical window sum

    def run(img_s, sem):
        cp = pltpu.make_async_copy(img_hbm.at[pl.ds(start, win), :], img_s, sem)
        cp.start()
        cp.wait()
        x = img_s[:, :].astype(jnp.int32)
        col = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
        med = None
        for group in groups:
            packed = pack_thresholds(x, group, bits)
            # vertical window sum: static sublane slices (rows pre-reflected)
            rs = None
            for d in range(size):
                piece = packed[off + d : off + d + T, :]
                rs = piece if rs is None else rs + piece
            # horizontal window sum with reflect corrections at the ``half``
            # edge columns each side (reflect: src −k → col k−1, mirrored at W)
            cs = rs
            for dc in range(1, half + 1):
                cs = cs + jnp.roll(rs, dc, axis=1) + jnp.roll(rs, -dc, axis=1)
            # jnp.roll wraps: at edge column c the roll-by-dc term brought a
            # wrapped column instead of the reflected one — swap them
            wrap = jnp.zeros_like(rs)
            for dc in range(1, half + 1):
                rolled_l = jnp.roll(rs, dc, 1)
                rolled_r = jnp.roll(rs, -dc, 1)
                for c in range(dc):
                    wrap = wrap + jnp.where(
                        col == c, rs[:, dc - c - 1 : dc - c] - rolled_l, 0
                    )
                    wrap = wrap + jnp.where(
                        col == W - 1 - c,
                        rs[:, W - (dc - c) : W - (dc - c) + 1] - rolled_r,
                        0,
                    )
            cs = cs + wrap
            med = median_from_counts(med, cs, group, bits, half_rank)
        out_ref[0, :, :] = med.astype(jnp.uint8)

    pl.run_scoped(
        run,
        pltpu.VMEM((win, W), jnp.uint8),
        pltpu.SemaphoreType.DMA,
    )


@partial(jax.jit, static_argnames=("size", "num_classes", "tile", "interpret"))
def median_label_filter_pallas(
    img: jnp.ndarray,
    size: int = 5,
    num_classes: int = 8,
    tile: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """scipy.ndimage.median_filter(img, size, mode='reflect') on uint8 label
    planes via one Pallas pass.  [H, W] or [B, H, W]; H % tile == 0."""
    half = size // 2
    assert 1 <= half <= _VHALO, f"size={size} needs half≤{_VHALO} (the VMEM halo)"
    batched = img.ndim == 3
    img3 = (img if batched else img[None]).astype(jnp.uint8)
    B, H, W = img3.shape
    T = tile
    assert H % T == 0, (H, T)

    # per-plane slot: [junk ‖ half reflected ‖ H rows ‖ half reflected ‖ pad];
    # _VHALO rows of lead/tail so every window is 8-row aligned (the junk
    # rows sit outside the 5×5 reach of any valid output row)
    lead = _VHALO - half
    slot = ((H + 2 * _VHALO + 7) // 8) * 8
    tail = slot - H - _VHALO - half
    top = jnp.flip(img3[:, :half, :], axis=1)
    bot = jnp.flip(img3[:, H - half :, :], axis=1)
    img_p = jnp.concatenate(
        [
            jnp.zeros((B, lead, W), jnp.uint8),
            top,
            img3,
            bot,
            jnp.zeros((B, tail, W), jnp.uint8),
        ],
        axis=1,
    ).reshape(B * slot, W)

    kernel = partial(
        _median_kernel, T=T, half=half, size=size, num_classes=num_classes,
        slot=slot,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, H // T),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, T, W), lambda b, c: (b, c, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.uint8),
        interpret=interpret,
    )(img_p)
    out = out.astype(img.dtype)
    return out if batched else out[0]


def median_label_filter_auto(
    img: jnp.ndarray, size: int = 5, num_classes: int = 8
) -> jnp.ndarray:
    """Backend dispatch: Pallas median on TPU, packed reduce_window elsewhere."""
    from particle_col_image_segmentation_tpu.ops.filters import (
        median_label_filter,
    )

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    H, W = img.shape[-2:]
    if (
        on_tpu
        and img.ndim <= 3  # the Pallas kernel packs [H,W]/[B,H,W] only;
        # deeper leading batch dims take the any-rank XLA path
        and size % 2 == 1
        and 1 <= size // 2 <= _VHALO
        and num_classes <= 8
        and W % 128 == 0
    ):
        for t in (32, 16, 8):
            if H % t == 0:
                return median_label_filter_pallas(
                    img, size=size, num_classes=num_classes, tile=t
                )
    return median_label_filter(img, size=size, num_classes=num_classes)
