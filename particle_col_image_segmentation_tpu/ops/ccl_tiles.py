"""Pallas band-sweep label propagation (Gauss-Seidel) — CCL + compaction.

The XLA CCL (ops/ccl.py) pays ~5 ms of HBM round-trip per fixpoint
iteration.  This kernel family instead:

  * splits each plane into full-width row bands of T rows (+8-row halos);
  * solves each band to a local fixpoint entirely in VMEM (scans + neighbor
    min — pure VPU work, no HBM traffic per inner iteration);
  * writes the band back IN PLACE (input/output aliased, manual DMA), so the
    sequential grid execution on the core makes each sweep Gauss-Seidel:
    a top-down sweep propagates labels the full plane height in ONE pass;
  * alternates sweep direction per-sweep until a full sweep changes nothing
    (per-band change flags — no whole-plane comparisons outside);
  * batches planes CONTIGUOUSLY (global 8-row pads only): rows outside the
    owning plane are masked to the sentinel in VMEM, so no per-plane gap
    rows are ever materialized;
  * seeds in-kernel: ``init="linear"`` synthesizes the linear-index seed in
    the first down sweep (no whole-plane iota in HBM); ``init="rank"``
    additionally computes each root's raster rank with a running SMEM root
    count across the raster-ordered band grid — the entire skimage-style
    label compaction fused into sweep 1, with "no +INF remains" as the
    convergence certificate (values can only ever be a component's own
    seed, so no confirm sweep);
  * value images may ride HBM as uint8 (¼ the sweep read traffic).

Min-propagation is a confluent semilattice update, so sweep order cannot
change the fixpoint — results are bit-identical to ops.ccl
(determinism-by-construction, SURVEY.md §5).

Alignment discipline: bands are full-width and 8-row aligned — no
lane-misaligned slice ever occurs (cf. ops/filters.py on why that matters).
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
# uint8 pad fill for the global end pads; value is arbitrary (pad rows are
# masked by row index in the kernels, never recognized by value)
_U8_PAD = 255
_HALO = 8
# Mosaic's default 16 MB scoped-vmem cap is conservative on v5e (128 MB
# physical VMEM); raising it unlocks taller bands (tile=128 → win=144,
# working set ~19 MB), halving per-band sweep overhead.
_VMEM_LIMIT = 64 * 1024 * 1024


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


def _diag_masks(V):
    """Loop-invariant same-value masks for the four diagonal neighbors.

    (A bit-packed single-plane variant of these masks was measured ~1.5%
    slower at tile=64 and did not unlock tile=128 — the win=144 working set
    still exceeds the 16 MB VMEM by ~400 KB — so the plain hoisted masks
    stay.)
    """
    return [
        (dy, dx, _shift(V, dy, dx, _BG_VAL) == V)
        for dy, dx in ((-1, -1), (-1, 1), (1, -1), (1, 1))
    ]


def _neighbor_min(L, diag):
    """Min label over same-valued DIAGONAL neighbors (and self).

    The axis-aligned offsets (±1,0)/(0,±1) are strictly subsumed by the
    bidirectional segmented row/column scans run in the same iteration
    (a 1-step propagation along a run vs the full run), so only the
    diagonals carry information the scans cannot.  ``diag`` holds the
    precomputed (dy, dx, same-value mask) triples — the value shifts are
    loop-invariant and hoisted out of the solve loop.
    """
    out = L
    for dy, dx, same in diag:
        out = jnp.minimum(out, jnp.where(same, _shift(L, dy, dx, _INF), _INF))
    return out


def _seg_scan_min(L, same_prev, axis: int, reverse: bool):
    """Hillis-Steele segmented min scan along ``axis``.

    same_prev[j] ⇔ element j connected to element j-1 (scan direction
    reverses via ``reverse``: then it reads "connected to j+1");
    int32 0/1 — Mosaic cannot roll/truncate i1 vectors.
    """
    n = L.shape[axis]
    X = L
    F = same_prev
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


def _local_solve(L, V, connectivity: int, inner_iters: int,
                 start_rev: bool = False):
    """Iterate to (or toward) the band-local fixpoint in VMEM.

    Alternating half-iterations: each runs ONE scan direction (forward =
    left-to-right + top-to-bottom, reverse = the mirrors), so a half costs
    ~half of a both-direction iteration.  Two consecutive clean halves —
    always one of each parity — mean L is stationary under all four scans
    and the diagonal min, i.e. a true band-local fixpoint.  ``start_rev``
    picks the first direction (up sweeps propagate bottom-up, so they lead
    with the reverse half).
    """
    # int32 flags: Mosaic cannot roll/truncate i1 vectors inside the scans
    same_r = (_shift(V, 0, 1, _BG_VAL) == V).astype(jnp.int32)  # left nbr
    same_rr = (_shift(V, 0, -1, _BG_VAL) == V).astype(jnp.int32)
    same_c = (_shift(V, 1, 0, _BG_VAL) == V).astype(jnp.int32)
    same_cr = (_shift(V, -1, 0, _BG_VAL) == V).astype(jnp.int32)
    diag = _diag_masks(V) if connectivity == 8 else []

    def fwd_half(L):
        # the diagonal min rides the forward half only: exit requires a
        # clean half of EACH parity, and the forward one covers diagonals
        Ln = _neighbor_min(L, diag) if connectivity == 8 else L
        Ln = _seg_scan_min(Ln, same_r, axis=1, reverse=False)
        return _seg_scan_min(Ln, same_c, axis=0, reverse=False)

    def rev_half(L):
        Ln = _seg_scan_min(L, same_rr, axis=1, reverse=True)
        return _seg_scan_min(Ln, same_cr, axis=0, reverse=True)

    def body(state):
        L, _, prev_clean, i = state
        is_fwd = (i % 2 == 0) != start_rev
        Ln = jax.lax.cond(is_fwd, fwd_half, rev_half, L)
        return Ln, jnp.all(Ln == L), state[1], i + 1

    def cond(state):
        _, clean, prev_clean, i = state
        return ~(clean & prev_clean) & (i < 2 * inner_iters)

    L, _, _, _ = jax.lax.while_loop(
        cond, body, (L, jnp.bool_(False), jnp.bool_(False), 0)
    )
    return L


def _band_kernel(
    lab_in,
    img_hbm,
    prev_ref,
    lab_io,
    flag_ref,
    *,
    T,
    H,
    n_bands,
    bands_per_plane,
    downward,
    connectivity,
    inner_iters,
    converge_on,
    init_linear=False,
):
    """One band: DMA window in from the aliased label buffer, solve, write
    the center back in place.  ``lab_in`` is the aliased input ref (unused —
    all access goes through ``lab_io`` so reads see earlier bands' writes).

    Planes pack CONTIGUOUSLY (global 8-row pads only): window rows whose
    per-plane row index falls outside [0, H) get the sentinel value in VMEM,
    so components never cross plane boundaries and no per-plane gap rows are
    materialized.  With ``init_linear`` (the CCL's first down sweep) the
    label window is synthesized in VMEM — linear indices for center/below,
    DMA only for the 8 halo rows above (already written this sweep) — so no
    whole-plane iota is ever materialized in HBM.

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
    start = plane * H + band_in_plane * T  # window top in the padded buffer
    win = 2 * _HALO + T
    W = img_hbm.shape[-1]

    # Band skipping: a band needs re-solving only if its neighborhood
    # changed last sweep ("change" mode — a skipped band's inputs are
    # unchanged since it last converged, so its output is too), or if it
    # itself still holds +INF ("inf" mode — single-seed values are final
    # once set, so INF-free bands are done forever).  The init sweep passes
    # all-ones.  Skipped bands just report flag 0.
    if prev_ref is None:
        need = jnp.int32(1)
    elif converge_on == "inf":
        need = prev_ref[band]
    else:
        lo = jnp.maximum(band - 1, 0)
        hi = jnp.minimum(band + 1, n_bands - 1)
        need = prev_ref[band] | prev_ref[lo] | prev_ref[hi]

    @pl.when(need == 0)
    def _skip():
        flag_ref[0, :, :] = jnp.zeros(flag_ref.shape[-2:], jnp.int32)

    def run(lab_s, img_s, sem, sem2):
        # label and value windows are independent reads — issue both DMAs
        # before waiting so their latencies overlap
        if init_linear:
            cp1 = pltpu.make_async_copy(
                lab_io.at[pl.ds(start, _HALO), :], lab_s.at[pl.ds(0, _HALO), :],
                sem,
            )
        else:
            cp1 = pltpu.make_async_copy(
                lab_io.at[pl.ds(start, win), :], lab_s, sem
            )
        cp2 = pltpu.make_async_copy(
            img_hbm.at[pl.ds(start, win), :], img_s, sem2
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        rows = jax.lax.broadcasted_iota(jnp.int32, (win, W), 0)
        row_in_plane = band_in_plane * T + rows - _HALO
        in_plane = (row_in_plane >= 0) & (row_in_plane < H)

        # value image may ride HBM as uint8 (¼ the sweep read traffic);
        # compute always in int32 (8-bit vector ops are restricted in Mosaic).
        # All out-of-plane rows — the global pad rows AND neighbor-plane
        # halo rows — are masked by ROW INDEX below, so no value (incl. 255,
        # the uint8 pad fill) is reserved: any in-plane uint8 value is legal.
        V = img_s[:, :].astype(jnp.int32)
        V = jnp.where(in_plane, V, _BG_VAL)  # plane boundary = sentinel

        if init_linear:
            cols = jax.lax.broadcasted_iota(jnp.int32, (win, W), 1)
            lin = jnp.where(in_plane, row_in_plane * W + cols, _INF)
            halo_rows = rows < _HALO
            L0 = jnp.where(halo_rows, lab_s[:, :], lin)
        else:
            L0 = lab_s[:, :]

        L = _local_solve(L0, V, connectivity, inner_iters, start_rev=not downward)
        center = L[_HALO : _HALO + T, :]
        if converge_on == "inf":
            flag = jnp.any(center == _INF)
        else:
            flag = jnp.any(center != L0[_HALO : _HALO + T, :])
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

    @pl.when(need != 0)
    def _solve():
        pl.run_scoped(
            run,
            pltpu.VMEM((win, W), jnp.int32),
            pltpu.VMEM((win, W), img_hbm.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        )


def _make_sweep(
    T, H, n_bands, bands_per_plane, Hp, W, downward, connectivity,
    inner_iters, interpret, converge_on="change", init_linear=False,
):
    # flags are consumed band-indexed by the NEXT sweep's skip logic, so the
    # block index map converts grid step → band (up sweeps run reversed)
    flag_index = (
        (lambda i: (i, 0, 0)) if downward
        else (lambda i: (n_bands - 1 - i, 0, 0))
    )
    kernel = partial(
        _band_kernel,
        T=T,
        H=H,
        n_bands=n_bands,
        bands_per_plane=bands_per_plane,
        downward=downward,
        connectivity=connectivity,
        inner_iters=inner_iters,
        converge_on=converge_on,
        init_linear=init_linear,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, 128), flag_index),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Hp, W), jnp.int32),
            jax.ShapeDtypeStruct((n_bands, 8, 128), jnp.int32),
        ),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )


def _lane_cumsum(x):
    """Inclusive cumsum along lanes (axis 1) — Hillis-Steele shifts."""
    n = x.shape[1]
    k = 1
    while k < n:
        x = x + _shift(x, 0, k, 0)
        k *= 2
    return x


def _sublane_cumsum(x):
    """Inclusive cumsum along sublanes (axis 0)."""
    n = x.shape[0]
    k = 1
    while k < n:
        x = x + _shift(x, k, 0, 0)
        k *= 2
    return x


def _rank_init_kernel(
    raw_hbm,
    img_hbm,
    lab_io,
    flag_ref,
    cnt_ref,
    lab_s,
    raw_s,
    img_s,
    base_ref,
    sem,
    sem2,
    sem3,
    *,
    T,
    H,
    bands_per_plane,
    connectivity,
    inner_iters,
):
    """Compact-id seeding fused into the first down sweep.

    A root's compact id is its 1-based raster rank among the plane's roots.
    The down sweep visits bands in raster order, so a running root count in
    SMEM (reset at each plane's first band) plus an in-window raster cumsum
    gives every root its rank with no whole-plane cumsum/einsum and no seed
    materialization: ``raw`` is read exactly once, here.  Background
    (raw < 0) seeds 0; everything else +INF.  Halo-above rows take the
    previous band's just-written seeds (Gauss-Seidel); per-band root counts
    go to ``cnt_ref`` so the caller can psum plane totals.
    """
    i = pl.program_id(0)
    plane = i // bands_per_plane
    band_in_plane = i - plane * bands_per_plane
    start = plane * H + band_in_plane * T
    win = 2 * _HALO + T
    W = img_hbm.shape[-1]

    @pl.when(band_in_plane == 0)
    def _reset():
        base_ref[0] = 0

    # three independent input windows — overlap all three DMA latencies
    cp0 = pltpu.make_async_copy(
        lab_io.at[pl.ds(start, _HALO), :], lab_s.at[pl.ds(0, _HALO), :], sem
    )
    cp1 = pltpu.make_async_copy(raw_hbm.at[pl.ds(start, win), :], raw_s, sem2)
    cp2 = pltpu.make_async_copy(img_hbm.at[pl.ds(start, win), :], img_s, sem3)
    cp0.start()
    cp1.start()
    cp2.start()
    cp0.wait()
    cp1.wait()
    cp2.wait()

    rows = jax.lax.broadcasted_iota(jnp.int32, (win, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (win, W), 1)
    row_in_plane = band_in_plane * T + rows - _HALO
    in_plane = (row_in_plane >= 0) & (row_in_plane < H)

    raw = raw_s[:, :]
    lin = row_in_plane * W + cols
    fgw = (raw >= 0) & in_plane
    # rank only center + below rows (halo-above seeds come from lab_io)
    ir = ((raw == lin) & fgw & (rows >= _HALO)).astype(jnp.int32)
    c = _lane_cumsum(ir)  # in-row inclusive root count
    rt = c[:, W - 1 : W]  # per-row totals [win, 1]
    rb = _sublane_cumsum(rt) - rt  # rows-before count, exclusive
    rank = base_ref[0] + rb + c
    seed = jnp.where(ir == 1, rank, jnp.where(fgw, _INF, 0))
    L0 = jnp.where(rows < _HALO, lab_s[:, :], seed)

    center_roots = jnp.sum(ir * (rows < _HALO + T).astype(jnp.int32))
    cnt_ref[0, :, :] = jnp.broadcast_to(center_roots, cnt_ref.shape[-2:])
    base_ref[0] = base_ref[0] + center_roots

    # out-of-plane rows are masked by row index (see _band_kernel): no
    # uint8 value is reserved as a sentinel
    V = img_s[:, :].astype(jnp.int32)
    V = jnp.where(in_plane, V, _BG_VAL)

    L = _local_solve(L0, V, connectivity, inner_iters)
    center = L[_HALO : _HALO + T, :]
    flag_ref[0, :, :] = jnp.broadcast_to(
        jnp.any(center == _INF).astype(jnp.int32), flag_ref.shape[-2:]
    )
    lab_s[:, :] = L
    wb = pltpu.make_async_copy(
        lab_s.at[pl.ds(_HALO, T), :],
        lab_io.at[pl.ds(start + _HALO, T), :],
        sem,
    )
    wb.start()
    wb.wait()


def _make_rank_init_sweep(
    T, H, n_bands, bands_per_plane, Hp, W, connectivity, inner_iters,
    interpret, val_dtype,
):
    kernel = partial(
        _rank_init_kernel,
        T=T,
        H=H,
        bands_per_plane=bands_per_plane,
        connectivity=connectivity,
        inner_iters=inner_iters,
    )
    win = 2 * _HALO + T
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
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Hp, W), jnp.int32),
            jax.ShapeDtypeStruct((n_bands, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_bands, 8, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((win, W), jnp.int32),  # lab_s
            pltpu.VMEM((win, W), jnp.int32),  # raw_s
            pltpu.VMEM((win, W), val_dtype),  # img_s
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )


def _make_init_sweep(
    T, H, n_bands, bands_per_plane, Hp, W, connectivity, inner_iters,
    interpret, converge_on="change",
):
    """First down sweep: labels synthesized in VMEM, fresh output buffer
    (no aliased input — nothing to materialize in HBM beforehand).  The
    never-written global pad rows stay garbage; the kernel's plane-boundary
    masking makes them inert for every later sweep."""

    def kernel(img_hbm, lab_io, flag_ref):
        _band_kernel(
            None,
            img_hbm,
            None,
            lab_io,
            flag_ref,
            T=T,
            H=H,
            n_bands=n_bands,
            bands_per_plane=bands_per_plane,
            downward=True,
            connectivity=connectivity,
            inner_iters=inner_iters,
            converge_on=converge_on,
            init_linear=True,
        )

    return pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Hp, W), jnp.int32),
            jax.ShapeDtypeStruct((n_bands, 8, 128), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )


@partial(
    jax.jit,
    static_argnames=(
        "connectivity", "tile", "max_sweeps", "inner_iters", "interpret",
        "converge_on", "init", "with_flag",
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
    init: str = "array",
    with_flag: bool = False,
) -> jnp.ndarray:
    """Propagate the min of ``lab`` within each equal-``val`` component.

    The general core of the band-sweep machinery: ``ccl_sweeps`` is
    ``min_propagate(linear_index, class_image)``; compact-id propagation
    (ops/ccl.py compact_labels_sweeps) seeds ``lab`` with the root rank at
    root pixels and +INF elsewhere.  [..., H, W] int32 in/out; ``val`` may
    hold any int32 values above _BG_VAL (the halo sentinel) — or any uint8
    values, which ride HBM at ¼ the sweep read traffic (the kernel casts in
    VMEM; out-of-plane rows are masked by row index, so no uint8 value is
    reserved).

    Planes pack contiguously (only a global 8-row pad at the two ends); the
    kernel masks rows outside each plane to the sentinel, so no per-plane
    gap rows are materialized.  With ``init="linear"`` the seed image is
    the per-plane linear index, synthesized inside the first down sweep —
    ``lab`` is ignored and may be a 1-element placeholder of the right
    batch shape metadata (pass val again).

    ``with_flag=True`` additionally returns a per-plane bool ``converged``
    (batch-shaped; scalar for a single plane), read for free from the final
    sweep's per-band flags: False means the ``max_sweeps`` budget ran out
    with work remaining and the labels are NOT at the fixpoint.  Callers at
    host boundaries must surface that instead of using the labels.
    """
    batch_shape = val.shape[:-2]
    H, W = val.shape[-2:]
    B = 1
    for d in batch_shape:
        B *= d
    as_u8 = val.dtype == jnp.uint8
    val2 = val.reshape(B, H, W)
    if not as_u8:
        val2 = val2.astype(jnp.int32)
    T = tile
    assert H % T == 0, (H, T)

    sent = _U8_PAD if as_u8 else _BG_VAL
    pad_v = jnp.full((_HALO, W), sent, val2.dtype)
    img_p = jnp.concatenate([pad_v, val2.reshape(B * H, W), pad_v], axis=0)
    Hp = B * H + 2 * _HALO
    bands_per_plane = H // T
    n_bands = B * bands_per_plane

    down = _make_sweep(
        T, H, n_bands, bands_per_plane, Hp, W, True, connectivity,
        inner_iters, interpret, converge_on,
    )
    up = _make_sweep(
        T, H, n_bands, bands_per_plane, Hp, W, False, connectivity,
        inner_iters, interpret, converge_on,
    )

    ones = jnp.ones((n_bands,), jnp.int32)
    if init == "rank":
        raw2 = lab.reshape(B * H, W).astype(jnp.int32)
        pad_r = jnp.full((_HALO, W), -1, jnp.int32)
        raw_p = jnp.concatenate([pad_r, raw2, pad_r], axis=0)
        first = _make_rank_init_sweep(
            T, H, n_bands, bands_per_plane, Hp, W, connectivity,
            inner_iters, interpret, img_p.dtype,
        )
        lab_p, f0, counts = first(raw_p, img_p)
        band_counts = counts[:, 0, 0]
    elif init == "linear":
        first = _make_init_sweep(
            T, H, n_bands, bands_per_plane, Hp, W, connectivity,
            inner_iters, interpret, converge_on,
        )
        lab_p, f0 = first(img_p)
    else:
        lab2 = lab.reshape(B, H, W).astype(jnp.int32)
        pad_l = jnp.full((_HALO, W), _INF, jnp.int32)
        lab_p = jnp.concatenate([pad_l, lab2.reshape(B * H, W), pad_l], axis=0)
        lab_p, f0 = down(lab_p, img_p, ones)

    # Converged ⇔ one full sweep (either direction) changed nothing: then
    # every band is at a local fixpoint given unchanged neighbors, i.e. a
    # global fixpoint.  Per-band flags feed the NEXT sweep's band skipping
    # (see _band_kernel) and make the check free — near-converged sweeps
    # cost almost nothing.
    def body(state):
        lab_p, flags, i = state
        lab_p, f3 = jax.lax.cond(
            i % 2 == 0,
            lambda lp: down(lp, img_p, flags),
            lambda lp: up(lp, img_p, flags),
            lab_p,
        )
        return lab_p, f3[:, 0, 0], i + 1

    def cond(state):
        _, flags, i = state
        return jnp.any(flags != 0) & (i < 2 * max_sweeps)

    lab_p, flags_f, _ = jax.lax.while_loop(cond, body, (lab_p, f0[:, 0, 0], 1))
    out = lab_p[_HALO : _HALO + B * H].reshape(B, H, W)
    out = out.reshape(val.shape[:-2] + (H, W))
    extras = []
    if init == "rank":
        extras.append(band_counts.reshape(B, bands_per_plane))
    if with_flag:
        # final sweep's per-band flags: all zero ⇔ that plane is at the
        # fixpoint (the loop exits either fully clean or at the sweep cap)
        conv = jnp.all(
            flags_f.reshape(B, bands_per_plane) == 0, axis=-1
        ).reshape(batch_shape)
        extras.append(conv)
    return (out, *extras) if extras else out


@partial(
    jax.jit,
    static_argnames=(
        "connectivity", "tile", "max_sweeps", "inner_iters", "interpret",
        "with_flag",
    ),
)
def ccl_sweeps(
    img: jnp.ndarray,
    background: Optional[int] = None,
    connectivity: int = 8,
    tile: int = 64,
    max_sweeps: int = 16,
    inner_iters: int = 16,
    interpret: bool = False,
    with_flag: bool = False,
) -> jnp.ndarray:
    """connected_components via Gauss-Seidel band sweeps.

    Accepts [H, W] or a batch [..., H, W]; batched planes pack contiguously
    into one tall array (the kernel's plane-boundary masking keeps
    components from crossing planes), so every sweep is a single kernel
    launch for the whole batch.

    Returns the same min-linear-index root labels as
    ops.ccl.connected_components.  ``tile`` is the band height; typically
    2-3 sweeps total (down, up, cheap skip-mostly confirm).
    """
    batch_shape = img.shape[:-2]
    H, W = img.shape[-2:]
    B = 1
    for d in batch_shape:
        B *= d
    img2 = img.reshape(B, H, W)

    if background is not None:
        lin = (
            jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1) * W
            + jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2)
        )
        v = img2.astype(jnp.int32)
        fg = v != background
        v = jnp.where(fg, v, _BG_VAL - 1 - lin)  # unique, never merges
    else:
        # keep uint8 values on HBM (¼ sweep read traffic); labels stay int32
        v = img2 if img2.dtype == jnp.uint8 else img2.astype(jnp.int32)
        fg = jnp.ones((B, H, W), bool)

    # init="linear": the first down sweep synthesizes the per-plane linear-
    # index seed in VMEM — no whole-plane iota/pad materialization in HBM
    res = min_propagate(
        v, v, connectivity=connectivity, tile=tile, max_sweeps=max_sweeps,
        inner_iters=inner_iters, interpret=interpret, init="linear",
        with_flag=with_flag,
    )
    lab = res[0] if with_flag else res
    out = jnp.where(fg, lab, -1).reshape(img.shape)
    if with_flag:
        return out, res[1].reshape(img.shape[:-2])
    return out
