"""Pallas particle-fill step (reference fill_particle_area semantics).

One kernel fuses the whole per-strain criterion of tiff_analysis.py:982-1015:
bounded EDT of the particle mask, the two OR-ed overlap tests
(EDT < distance_threshold, EDT ≤ dilation_radius — both squared-int exact),
the pixel reassignment, and the overlap count.  The XLA path (ops/edt.py +
masks + sums in labels/analysis._stage_fill) moves several int32 planes
through HBM per strain; here the traffic is one uint8 read + one uint8
write.

Reads the ORIGINAL plane and writes a fresh buffer (Jacobi), exactly like
the reference computes each strain's overlap against the pre-update state;
the caller loops strains sequentially for its cumulative semantics.

Phase 1 (row distance, capped): symmetric min-plus doubling — after m
rounds d[x] = min(|dx| : feature at x+dx, |dx| < 2^m), so ⌈log₂(cap+1)⌉
rounds reach the cap.  Phase 2: 2·cap+1 sublane taps of dx² + row-dist².
Exact wherever the true distance ≤ cap (ops/edt.py's identity).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["particle_fill_step_pallas", "particle_fill_step_auto"]


def _round_up(x: int, to: int) -> int:
    return (x + to - 1) // to * to


def _fill_kernel(
    img_hbm, out_ref, cnt_ref, *, T, H, halo, cap, particle_val, sval,
    dt2, dr2,
):
    chunk = pl.program_id(1)
    plane = pl.program_id(0)
    start = plane * H + chunk * T
    win = T + 2 * halo
    W = img_hbm.shape[-1]
    c1 = cap + 1
    inf = c1 * c1

    def run(img_s, sem):
        cp = pltpu.make_async_copy(img_hbm.at[pl.ds(start, win), :], img_s, sem)
        cp.start()
        cp.wait()
        x = img_s[:, :].astype(jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (win, W), 0)
        row_in_plane = chunk * T + rows - halo
        in_plane = (row_in_plane >= 0) & (row_in_plane < H)

        pm = (x == particle_val) & in_plane
        # phase 1: capped row distance via symmetric min-plus doubling
        d = jnp.where(pm, 0, c1)
        k = 1
        while k < c1:
            cols = jax.lax.broadcasted_iota(jnp.int32, (win, W), 1)
            dl = jnp.where(cols >= k, jnp.roll(d, k, 1), c1)
            dr = jnp.where(cols < W - k, jnp.roll(d, -k, 1), c1)
            d = jnp.minimum(d, jnp.minimum(dl, dr) + k)
            k *= 2
        dh2 = jnp.minimum(d * d, inf)

        # phase 2: vertical min-plus taps (window halo ≥ cap by construction)
        d2 = jnp.full((T, W), inf, jnp.int32)
        for dy in range(-cap, cap + 1):
            sl = dh2[halo + dy : halo + dy + T, :]
            d2 = jnp.minimum(d2, sl + dy * dy)

        center = x[halo : halo + T, :]
        overlap = (center == sval) & ((d2 < dt2) | (d2 <= dr2))
        out_ref[0, :, :] = jnp.where(
            overlap, jnp.uint8(particle_val), center.astype(jnp.uint8)
        )
        cnt_ref[0, :, :] = jnp.broadcast_to(
            jnp.sum(overlap.astype(jnp.int32)), cnt_ref.shape[-2:]
        )

    pl.run_scoped(
        run,
        pltpu.VMEM((win, W), jnp.uint8),
        pltpu.SemaphoreType.DMA,
    )


@partial(
    jax.jit,
    static_argnames=(
        "particle_val", "sval", "cap", "dt2", "dr2", "tile", "interpret"
    ),
)
def particle_fill_step_pallas(
    filled: jnp.ndarray,
    particle_val: int,
    sval: int,
    cap: int,
    dt2: int,
    dr2: int,
    tile: int = 32,
    interpret: bool = False,
):
    """One strain's fill step: (updated plane, overlap pixel count).

    [H, W] or [B, H, W] uint8; H % tile == 0, W % 128 == 0.
    """
    batched = filled.ndim == 3
    img3 = (filled if batched else filled[None]).astype(jnp.uint8)
    B, H, W = img3.shape
    T = tile
    assert H % T == 0, (H, T)
    halo = _round_up(cap, 8)

    pad = jnp.zeros((halo, W), jnp.uint8)  # value 0 is never particle/cell
    img_p = jnp.concatenate([pad, img3.reshape(B * H, W), pad], axis=0)

    kernel = partial(
        _fill_kernel, T=T, H=H, halo=halo, cap=cap,
        particle_val=particle_val, sval=sval, dt2=dt2, dr2=dr2,
    )
    out, cnt = pl.pallas_call(
        kernel,
        grid=(B, H // T),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, T, W), lambda b, c: (b, c, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, c: (b * (H // T) + c, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W), jnp.uint8),
            jax.ShapeDtypeStruct((B * (H // T), 8, 128), jnp.int32),
        ),
        interpret=interpret,
    )(img_p)
    counts = cnt[:, 0, 0].reshape(B, H // T).sum(axis=-1)
    out = out.astype(filled.dtype)
    if not batched:
        return out[0], counts[0]
    return out, counts


def particle_fill_step_auto(
    filled: jnp.ndarray, particle_val: int, sval: int, cap: int, dt2: int,
    dr2: int,
):
    """Backend dispatch: Pallas fused fill on TPU, EDT+masks elsewhere."""
    from particle_col_image_segmentation_tpu.ops.edt import edt_sq

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    H, W = filled.shape[-2:]
    if on_tpu and W % 128 == 0 and H % 32 == 0:
        tile = 64 if H % 64 == 0 else 32  # 64 best on the v5e sweep
        return particle_fill_step_pallas(
            filled, particle_val, sval, cap, dt2, dr2, tile=tile
        )
    particle_mask = filled == particle_val
    cell_mask = filled == sval
    d2 = edt_sq(particle_mask, cap=cap)
    overlap = cell_mask & ((d2 < dt2) | (d2 <= dr2))
    count = jnp.sum(overlap.astype(jnp.int32), axis=(-2, -1))
    return jnp.where(overlap, jnp.asarray(particle_val, filled.dtype), filled), count
