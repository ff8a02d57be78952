"""Bounded exact Euclidean distance transform (squared), separable.

Replaces scipy.ndimage.distance_transform_edt at the reference call sites
(tiff_analysis.py:996 — threshold at 2 px; refine_boundaries.py:60 — marker
seeding) with a two-phase TPU-friendly transform:

  phase 1 (within each row, along the lane axis −1): capped distance to the
    nearest feature pixel in the same ROW, via two log-depth directional
    scans;
  phase 2 (across rows, along the sublane axis −2):
    d²(r,c) = min over |dy| ≤ cap of dy² + dh(r+dy, c)², an unrolled
    2·cap+1-tap vector min over row-shifted planes.  This is the axis that
    needs the cap-row halo when spatially sharded (parallel/sharded.py).

The result is *exact* wherever the true distance ≤ cap (offsets beyond the
cap can only produce distances > cap).  Pixels farther than cap get a value
> cap², so thresholded uses (dilation, near-particle tests) are exact for any
threshold ≤ cap.  This is the same identity the oracle tests pin down:
dilate(X, disk(r)) == EDT(~X) ≤ r.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from particle_col_image_segmentation_tpu.ops.scans import directional_distance

__all__ = ["edt_sq", "edt", "edt_sq_exact", "edt_exact", "edt_sq_exact_auto"]


@partial(jax.jit, static_argnames=("cap",))
def edt_sq(feature: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Squared distance to the nearest True pixel of ``feature`` [..., H, W].

    Exact for distances ≤ cap; larger distances saturate to (cap+1)².
    """
    feature = feature.astype(bool)
    c1 = cap + 1
    # phase 1: per-ROW distance to the nearest feature in the same row.
    # Small caps: 2·cap+1 direct lane taps beat anything (only distances
    # ≤ cap matter, and each lane shift is a relayout).  Larger caps:
    # bounded log-DOUBLING min-plus — ⌈log2 c1⌉ single-shift rounds per
    # direction, vs the exact transform's full-width associative scans
    # (whose per-level tuple combines dominate the capped EDT's cost).
    if cap <= 8:
        W = feature.shape[-1]
        padw = [(0, 0)] * (feature.ndim - 1) + [(cap, cap)]
        fpad = jnp.pad(feature, padw, constant_values=False)
        dh = jnp.full(feature.shape, c1, jnp.int32)
        for dx in range(-cap, cap + 1):
            sl = (Ellipsis, slice(cap + dx, cap + dx + W))
            dh = jnp.where(fpad[sl], jnp.minimum(dh, abs(dx)), dh)
    else:
        d0 = jnp.where(feature, 0, c1).astype(jnp.int32)
        dh = jnp.minimum(
            _doubling_dist(d0, c1, backward=False),
            _doubling_dist(d0, c1, backward=True),
        )
    dh2 = (dh * dh).astype(jnp.int32)

    # phase 2: min-plus over row offsets.  Shifting along the SUBLANE axis
    # (-2) keeps lane layouts aligned on TPU, so the unrolled 2·cap+1 taps
    # stay cheap; shifting along lanes would force a relayout per tap.
    H = feature.shape[-2]
    inf = jnp.int32(c1 * c1)
    pad = [(0, 0)] * (feature.ndim - 2) + [(cap, cap), (0, 0)]
    dp = jnp.pad(dh2, pad, constant_values=inf)
    out = jnp.full(feature.shape, inf, jnp.int32)
    for dy in range(-cap, cap + 1):
        sl = (Ellipsis, slice(cap + dy, cap + dy + H), slice(None))
        out = jnp.minimum(out, dp[sl] + dy * dy)
    return jnp.minimum(out, inf)


def _doubling_dist(d0: jnp.ndarray, c1: int, backward: bool) -> jnp.ndarray:
    """Bounded 1-D distance along the lane axis by log-doubling min-plus:
    after round k, ``d[i] = min_{0 ≤ s < 2^(k+1)} d0[i∓s] + s`` (the classic
    two-window recurrence ``d ← min(d, shift(d, 2^k) + 2^k)``), so
    ``⌈log2 c1⌉`` rounds cover every offset < c1; clamp handles the rest."""
    W = d0.shape[-1]
    d = d0
    s = 1
    while s < c1:
        pad = [(0, 0)] * (d.ndim - 1) + [(s, 0) if not backward else (0, s)]
        sl = (
            (Ellipsis, slice(0, W))
            if not backward
            else (Ellipsis, slice(s, W + s))
        )
        d = jnp.minimum(d, jnp.pad(d, pad, constant_values=c1)[sl] + s)
        s *= 2
    return jnp.minimum(d, c1)


def edt(feature: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Float distance (exact up to cap; saturates at cap+1)."""
    return jnp.sqrt(edt_sq(feature, cap).astype(jnp.float32))


def row_dh2_exact(feature: jnp.ndarray, inf) -> jnp.ndarray:
    """Phase 1 of the exact EDT: per-row squared horizontal distance to the
    nearest feature in the same row; ``inf`` for featureless rows (they must
    contribute +inf to the phase-2 min-plus, not a finite (W+1)² candidate,
    or any pixel whose true nearest feature is farther than W+1 rows away
    gets a too-small distance)."""
    feature = feature.astype(bool)
    W = feature.shape[-1]
    capw = W + 1
    right = directional_distance(feature, axis=-1, cap=capw)
    left = jnp.flip(
        directional_distance(jnp.flip(feature, -1), axis=-1, cap=capw), -1
    )
    dh = jnp.minimum(right, left).astype(jnp.int32)
    return jnp.where(dh >= capw, inf, dh * dh)


def minplus_rows(
    dh2_src: jnp.ndarray,
    r_idx: jnp.ndarray,
    inf,
    rows_per_step: int = 8,
) -> jnp.ndarray:
    """Phase 2 of the exact EDT: ``out[..., i, c] = min_j dh2_src[..., j, c]
    + (r_idx[i] − j)²`` — the full min-plus over ALL source rows, as a
    ``lax.scan`` over row chunks.  ``r_idx`` gives each OUTPUT row's global
    row index, so a spatially sharded caller can pass the all-gathered dh2
    plane with its own band's indices (parallel/sharded.py)."""
    Hs, W = dh2_src.shape[-2:]
    C = rows_per_step
    Hp = -(-Hs // C) * C
    pad = [(0, 0)] * (dh2_src.ndim - 2) + [(0, Hp - Hs), (0, 0)]
    src = jnp.pad(dh2_src, pad, constant_values=inf)
    # move the chunked row axis to the front for lax.scan xs
    src_chunks = jnp.moveaxis(
        src.reshape(dh2_src.shape[:-2] + (Hp // C, C, W)), -3, 0
    )  # [Hp/C, ..., C, W]
    j_base = jnp.arange(Hp // C) * C
    r_idx = r_idx.astype(jnp.int32)
    Hout = r_idx.shape[0]

    def step(out, xs):
        rows, jb = xs  # rows: [..., C, W]
        for k in range(C):
            dy = r_idx - (jb + k)  # [Hout]
            add = (dy * dy).astype(jnp.int32)[:, None]  # [Hout, 1]
            out = jnp.minimum(out, rows[..., k, :][..., None, :] + add)
        return out, None

    # derive the carry init from the data (0·row + inf) so its varying-axes
    # type matches the body output under shard_map (a plain jnp.full is
    # replicated and trips the scan carry vma check)
    out0 = jnp.broadcast_to(
        0 * dh2_src[..., :1, :] + inf, dh2_src.shape[:-2] + (Hout, W)
    )
    out, _ = jax.lax.scan(step, out0, (src_chunks, j_base))
    return out


@partial(jax.jit, static_argnames=("rows_per_step",))
def edt_sq_exact(feature: jnp.ndarray, rows_per_step: int = 128) -> jnp.ndarray:
    """Exact (uncapped) squared EDT of [..., H, W] — scipy parity everywhere.

    Phase 1: exact per-row distances via the log-depth directional scans.
    Phase 2: the full min-plus over ALL row offsets,
    ``out[r,c] = min_j dh2[j,c] + (r−j)²``, as a ``lax.scan`` over row
    chunks — O(H²·W) VPU work (≈ 8.6G ops at 2048², a few ms), no
    data-dependent control flow.  Used where a saturating cap would change
    semantics (marker seeding over large empty areas, models/refine.py);
    thresholded uses (particle fill) keep the cheap capped ``edt_sq``.

    Pixels with no feature anywhere in the plane get ≥ (H+W)² (scipy
    returns the true distance only when features exist; callers mask).
    """
    H, W = feature.shape[-2:]
    inf = jnp.int32((H + W + 2) * (H + W + 2))
    dh2 = row_dh2_exact(feature, inf)
    return minplus_rows(
        dh2, jnp.arange(H, dtype=jnp.int32), inf, rows_per_step
    )


@partial(jax.jit, static_argnames=("probe_cap", "rows_per_step"))
def edt_sq_exact_auto(
    feature: jnp.ndarray, probe_cap: int = 32, rows_per_step: int = 128
) -> jnp.ndarray:
    """Exact squared EDT with a capped fast path and a runtime certificate.

    The capped transform is exact wherever the true distance ≤ ``probe_cap``
    and returns a value > probe_cap² wherever it is not — so
    ``any(capped > probe_cap²)`` is a sound runtime certificate of
    exactness for the whole plane.  When it holds (the common case: refine
    cells are tens of pixels across, so every in-mask distance is small),
    the O(cap·H·W) capped result IS the exact transform and the O(H²·W)
    min-plus never runs; otherwise a ``lax.cond`` falls back to
    ``edt_sq_exact`` from scratch.  Output is bit-identical to
    ``edt_sq_exact`` either way (6.8 → ~1.5 ms at [16, 512²] on v5e).
    """
    from particle_col_image_segmentation_tpu.ops.edt_tiles import edt_sq_auto

    feature = feature.astype(bool)
    capped = edt_sq_auto(feature, cap=probe_cap)
    deep = jnp.any(capped > probe_cap * probe_cap)
    return jax.lax.cond(
        deep,
        lambda f, _c: edt_sq_exact(f, rows_per_step),
        lambda _f, c: c,
        feature,
        capped,
    )


def edt_exact(feature: jnp.ndarray) -> jnp.ndarray:
    """Exact float EDT (scipy.ndimage.distance_transform_edt parity)."""
    return jnp.sqrt(edt_sq_exact(feature).astype(jnp.float32))
