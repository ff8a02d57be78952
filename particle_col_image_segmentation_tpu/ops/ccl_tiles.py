"""Pallas band-sweep connected-components labeling (Gauss-Seidel).

The XLA CCL (ops/ccl.py) pays ~5 ms of HBM round-trip per fixpoint
iteration.  This kernel instead:

  * splits the plane into full-width row bands of T rows (+8-row halos);
  * solves each band to a local fixpoint entirely in VMEM (scans + neighbor
    min — pure VPU work, no HBM traffic per inner iteration);
  * writes the band back IN PLACE (input/output aliased, manual DMA), so the
    sequential grid execution on the core makes each sweep Gauss-Seidel:
    a top-down sweep propagates labels the full plane height in ONE pass;
  * alternates sweep direction (down, up) until a global fixpoint.

Min-propagation is a confluent semilattice update, so sweep order cannot
change the fixpoint — results are bit-identical to ops.ccl
(determinism-by-construction, SURVEY.md §5).

Alignment discipline: bands are full-width and 8-row aligned; the only
padding is an 8-row sentinel frame top and bottom — no lane-misaligned
slice ever occurs (cf. ops/filters.py on why that matters).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = jnp.iinfo(jnp.int32).max
_BG_VAL = -(2**30)  # image sentinel outside the plane / on background
_U8_SENTINEL = 255  # halo sentinel when the value image rides as uint8
_HALO = 8


def _shift(x, dy: int, dx: int, fill):
    """Static shift on an in-VMEM value: result[i,j] = x[i-dy, j-dx].

    Rolls each axis separately and only when nonzero (a roll of 0 lowers to
    a zero-length slice, which Mosaic rejects).
    """
    H, W = x.shape
    out = x
    if dy != 0:
        out = jnp.roll(out, dy, axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        bad = rows < dy if dy > 0 else rows >= H + dy
        out = jnp.where(bad, fill, out)
    if dx != 0:
        out = jnp.roll(out, dx, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        bad = cols < dx if dx > 0 else cols >= W + dx
        out = jnp.where(bad, fill, out)
    return out


def _neighbor_min(L, V, connectivity: int):
    offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 8:
        offsets += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    out = L
    for dy, dx in offsets:
        Ls = _shift(L, dy, dx, _INF)
        Vs = _shift(V, dy, dx, _BG_VAL)
        out = jnp.minimum(out, jnp.where(Vs == V, Ls, _INF))
    return out


def _seg_scan_min(L, same_prev, axis: int, reverse: bool):
    """Hillis-Steele segmented min scan along ``axis``.

    same_prev[j] ⇔ element j connected to element j-1 (scan direction
    reverses via ``reverse``: then it reads "connected to j+1").
    Flags ride as int32 0/1 — Mosaic cannot roll/truncate i1 vectors.
    """
    n = L.shape[axis]
    X = L
    F = same_prev.astype(jnp.int32)
    k = 1
    while k < n:
        if axis == 0:
            dy, dx = (-k if reverse else k), 0
        else:
            dy, dx = 0, (-k if reverse else k)
        Xs = _shift(X, dy, dx, _INF)
        Fs = _shift(F, dy, dx, 0)
        X = jnp.where(F == 1, jnp.minimum(X, Xs), X)
        F = F * Fs
        k *= 2
    return X


def _local_solve(L, V, connectivity: int, inner_iters: int):
    """Iterate to (or toward) the band-local fixpoint in VMEM."""
    same_r = _shift(V, 0, 1, _BG_VAL) == V  # connected to left neighbor
    same_rr = _shift(V, 0, -1, _BG_VAL) == V
    same_c = _shift(V, 1, 0, _BG_VAL) == V
    same_cr = _shift(V, -1, 0, _BG_VAL) == V

    def body(state):
        L, _, i = state
        Ln = _neighbor_min(L, V, connectivity)
        Ln = jnp.minimum(
            _seg_scan_min(Ln, same_r, axis=1, reverse=False),
            _seg_scan_min(Ln, same_rr, axis=1, reverse=True),
        )
        Ln = jnp.minimum(
            _seg_scan_min(Ln, same_c, axis=0, reverse=False),
            _seg_scan_min(Ln, same_cr, axis=0, reverse=True),
        )
        return Ln, jnp.any(Ln != L), i + 1

    def cond(state):
        _, changed, i = state
        return changed & (i < inner_iters)

    L, _, _ = jax.lax.while_loop(cond, body, (L, jnp.bool_(True), 0))
    return L


def _band_kernel(
    lab_in,
    img_hbm,
    lab_io,
    flag_ref,
    *,
    T,
    n_bands,
    bands_per_plane,
    slot,
    downward,
    connectivity,
    inner_iters,
    converge_on,
):
    """One band: DMA window in from the aliased label buffer, solve, write
    the center back in place.  ``lab_in`` is the aliased input ref (unused —
    all access goes through ``lab_io`` so reads see earlier bands' writes).

    Bands are per plane: band b of plane p starts at p·slot + b·T in the
    stacked array (each plane slot carries its own sentinel halos).

    ``flag_ref`` gets the band's convergence summary, so the outer loop
    needs no whole-plane comparison: with converge_on="change", 1 iff the
    center rows changed; with converge_on="inf", 1 iff any center pixel is
    still +INF (single-seed propagations are done exactly when every pixel
    is reached — values can only ever be the component's own seed).
    """
    del lab_in
    i = pl.program_id(0)
    band = i if downward else (n_bands - 1) - i
    plane = band // bands_per_plane
    band_in_plane = band - plane * bands_per_plane
    start = plane * slot + band_in_plane * T  # top of the window

    def run(lab_s, img_s, sem):
        win = 2 * _HALO + T
        cp1 = pltpu.make_async_copy(
            lab_io.at[pl.ds(start, win), :], lab_s, sem
        )
        cp1.start()
        cp1.wait()
        cp2 = pltpu.make_async_copy(
            img_hbm.at[pl.ds(start, win), :], img_s, sem
        )
        cp2.start()
        cp2.wait()
        # value image may ride HBM as uint8 (¼ the sweep read traffic);
        # compute always in int32 (8-bit vector ops are restricted in Mosaic)
        V = img_s[:, :].astype(jnp.int32)
        if img_s.dtype == jnp.uint8:
            V = jnp.where(V == _U8_SENTINEL, _BG_VAL, V)
        L = _local_solve(lab_s[:, :], V, connectivity, inner_iters)
        center = L[_HALO : _HALO + T, :]
        if converge_on == "inf":
            flag = jnp.any(center == _INF)
        else:
            flag = jnp.any(center != lab_s[_HALO : _HALO + T, :])
        flag_ref[0, :, :] = jnp.broadcast_to(
            flag.astype(jnp.int32), flag_ref.shape[-2:]
        )
        lab_s[:, :] = L
        wb = pltpu.make_async_copy(
            lab_s.at[pl.ds(_HALO, T), :],
            lab_io.at[pl.ds(start + _HALO, T), :],
            sem,
        )
        wb.start()
        wb.wait()

    W = img_hbm.shape[-1]
    pl.run_scoped(
        run,
        pltpu.VMEM((2 * _HALO + T, W), jnp.int32),
        pltpu.VMEM((2 * _HALO + T, W), img_hbm.dtype),
        pltpu.SemaphoreType.DMA,
    )


def _make_sweep(
    T, n_bands, bands_per_plane, slot, Hp, W, downward, connectivity,
    inner_iters, interpret, converge_on="change",
):
    kernel = partial(
        _band_kernel,
        T=T,
        n_bands=n_bands,
        bands_per_plane=bands_per_plane,
        slot=slot,
        downward=downward,
        connectivity=connectivity,
        inner_iters=inner_iters,
        converge_on=converge_on,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Hp, W), jnp.int32),
            jax.ShapeDtypeStruct((n_bands, 8, 128), jnp.int32),
        ),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


@partial(
    jax.jit,
    static_argnames=(
        "connectivity", "tile", "max_sweeps", "inner_iters", "interpret",
        "converge_on",
    ),
)
def min_propagate(
    lab: jnp.ndarray,
    val: jnp.ndarray,
    connectivity: int = 8,
    tile: int = 64,
    max_sweeps: int = 16,
    inner_iters: int = 16,
    interpret: bool = False,
    converge_on: str = "change",
) -> jnp.ndarray:
    """Propagate the min of ``lab`` within each equal-``val`` component.

    The general core of the band-sweep machinery: ``ccl_sweeps`` is
    ``min_propagate(linear_index, class_image)``; compact-id propagation
    (ops/ccl.py compact_labels_sweeps) seeds ``lab`` with the root rank at
    root pixels and +INF elsewhere.  [..., H, W] int32 in/out; ``val`` may
    hold any int32 values above _BG_VAL (the halo sentinel) — or uint8
    values < 255, which ride HBM at ¼ the sweep read traffic (the kernel
    casts in VMEM; 255 is the uint8 halo sentinel).
    """
    batch_shape = lab.shape[:-2]
    H, W = lab.shape[-2:]
    B = 1
    for d in batch_shape:
        B *= d
    lab2 = lab.reshape(B, H, W).astype(jnp.int32)
    as_u8 = val.dtype == jnp.uint8
    val2 = val.reshape(B, H, W)
    if not as_u8:
        val2 = val2.astype(jnp.int32)
    T = tile
    assert H % T == 0, (H, T)

    slot = H + 2 * _HALO
    lab_p = jnp.pad(
        lab2, ((0, 0), (_HALO, _HALO), (0, 0)), constant_values=_INF
    ).reshape(B * slot, W)
    img_p = jnp.pad(
        val2,
        ((0, 0), (_HALO, _HALO), (0, 0)),
        constant_values=_U8_SENTINEL if as_u8 else _BG_VAL,
    ).reshape(B * slot, W)
    Hp = B * slot
    bands_per_plane = H // T
    n_bands = B * bands_per_plane

    down = _make_sweep(
        T, n_bands, bands_per_plane, slot, Hp, W, True, connectivity,
        inner_iters, interpret, converge_on,
    )
    up = _make_sweep(
        T, n_bands, bands_per_plane, slot, Hp, W, False, connectivity,
        inner_iters, interpret, converge_on,
    )

    # Converged ⇔ one full sweep (either direction) changed nothing: then
    # every band is at a local fixpoint given unchanged neighbors, i.e. a
    # global fixpoint.  The per-band flags make that check free (no plane
    # comparison), and per-sweep granularity with alternating direction
    # typically saves one sweep vs pair-wise rounds (down, up, confirm).
    def body(state):
        lab_p, _, i = state
        lab_p, flags = jax.lax.cond(
            i % 2 == 0,
            lambda lp: down(lp, img_p),
            lambda lp: up(lp, img_p),
            lab_p,
        )
        return lab_p, jnp.any(flags != 0), i + 1

    def cond(state):
        _, changed, i = state
        return changed & (i < 2 * max_sweeps)

    lab_p, f0 = down(lab_p, img_p)
    lab_p, _, _ = jax.lax.while_loop(cond, body, (lab_p, jnp.any(f0 != 0), 1))
    out = lab_p.reshape(B, slot, W)[:, _HALO : _HALO + H, :]
    return out.reshape(lab.shape)


@partial(
    jax.jit,
    static_argnames=("connectivity", "tile", "max_sweeps", "inner_iters", "interpret"),
)
def ccl_sweeps(
    img: jnp.ndarray,
    background: Optional[int] = None,
    connectivity: int = 8,
    tile: int = 64,
    max_sweeps: int = 16,
    inner_iters: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """connected_components via Gauss-Seidel band sweeps.

    Accepts [H, W] or a batch [..., H, W]; batched planes are stacked into
    one tall array with sentinel gaps (planes cannot merge across gaps and
    per-plane linear-index labels are already distinct per plane), so every
    sweep is a single kernel launch for the whole batch.

    Returns the same min-linear-index root labels as
    ops.ccl.connected_components.  ``tile`` is the band height; a down+up
    sweep pair usually converges in 1-2 outer rounds.
    """
    batch_shape = img.shape[:-2]
    H, W = img.shape[-2:]
    B = 1
    for d in batch_shape:
        B *= d
    img2 = img.reshape(B, H, W)

    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1) * W
        + jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2)
    )
    if background is not None:
        v = img2.astype(jnp.int32)
        fg = v != background
        v = jnp.where(fg, v, _BG_VAL - 1 - lin)  # unique, never merges
    else:
        # keep uint8 values on HBM (¼ sweep read traffic); labels stay int32
        v = img2 if img2.dtype == jnp.uint8 else img2.astype(jnp.int32)
        fg = jnp.ones((B, H, W), bool)

    lab = min_propagate(
        lin, v, connectivity=connectivity, tile=tile, max_sweeps=max_sweeps,
        inner_iters=inner_iters, interpret=interpret,
    )
    out = jnp.where(fg, lab, -1)
    return out.reshape(img.shape)
