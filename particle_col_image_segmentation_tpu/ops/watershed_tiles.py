"""Pallas band-sweep watershed (Gauss-Seidel two-phase minimax flooding).

Same two phases as ops/watershed.py — minimax costs first, then the
(level distance, entry img, claimer img, marker id) claim relaxation over
the fixed optimal-edge graph — iterated inside VMEM over full-width row
bands with in-place write-back (the ops/ccl_tiles.py machinery).  Both
phases have a unique fixpoint, so the Gauss-Seidel band schedule produces
bit-identical output to the XLA Jacobi kernel, while the O(basin-diameter)
relaxation runs at VPU speed instead of one full-plane HBM round trip per
step.  Phase 2 shares its candidate/fold definitions with ops/watershed.py
and recomputes only band-interior rows (see _relax_label).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.4e38  # plain Python scalars: jnp constants would be captured tracers
_BIG_LAB = jnp.iinfo(jnp.int32).max
_HALO = 8

_MASK_BIT = 1
_SEED_BIT = 2


def _shift(x, dy: int, dx: int, fill):
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


def _offsets(connectivity: int):
    offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 2:
        offsets += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    return offsets


def _relax_cost(cost, img, flags, connectivity: int, inner_iters: int):
    in_mask = (flags & _MASK_BIT) != 0
    is_seed = (flags & _SEED_BIT) != 0
    updatable = in_mask & ~is_seed

    def body(state):
        cost, _, i = state
        best = cost
        for dy, dx in _offsets(connectivity):
            nc = _shift(cost, dy, dx, _INF)
            best = jnp.minimum(best, jnp.maximum(nc, img))
        new = jnp.where(updatable, best, cost)
        return new, jnp.any(new != cost), i + 1

    def cond(state):
        _, changed, i = state
        return changed & (i < inner_iters)

    cost, _, _ = jax.lax.while_loop(cond, body, (cost, jnp.bool_(True), 0))
    return cost


def _relax_label(lab, dist, eimg, cost, img, flags, connectivity: int,
                 inner_iters: int, T: int):
    """Claim relaxation over optimal edges with the lexicographic
    (level distance, entry img, claimer img, marker id) key — the same
    math as ops/watershed.py's shared claim_candidates/fold_claim step
    (bit-identical; parity pinned by the schedule-equivalence tests), with
    the phase-invariant halves hoisted out of the inner loop: ``cost`` and
    ``img`` are FIXED throughout phase 2, so each offset's shifted cost /
    shifted img / optimal-edge geometry / reset mask is computed ONCE per
    band visit instead of once per relaxation iteration (Mosaic does not
    LICM across the while_loop).  Only the claimed-neighbor conjunct of
    ``valid`` (nl != _BIG_LAB) and the (nl, nd, ne) state shifts remain in
    the loop.

    Only the band's interior rows [HALO, HALO+T) are recomputed: the level
    reset makes recomputation non-monotone, so recomputing a window-edge
    halo row (whose true claimers live outside the window) would replace a
    valid state with a worse one and rot the band from the edges in.  Halo
    rows stay frozen at their sweep-start values — stale-but-valid neighbor
    reads, under which the chaotic relaxation still reaches the unique
    fixpoint."""
    from particle_col_image_segmentation_tpu.ops.watershed import fold_claim

    in_mask = (flags & _MASK_BIT) != 0
    is_seed = (flags & _SEED_BIT) != 0
    rows = jax.lax.broadcasted_iota(jnp.int32, lab.shape, 0)
    interior = (rows >= _HALO) & (rows < _HALO + T)
    updatable = in_mask & ~is_seed & interior

    # hoisted per-offset invariants (see docstring): geometry-valid mask,
    # strictly-uphill reset mask, and the neighbor relief (= both the
    # claimer img candidate and the entry img on reset edges)
    inv = []
    for dy, dx in _offsets(connectivity):
        nc = _shift(cost, dy, dx, jnp.float32(_INF))
        nim = _shift(img, dy, dx, jnp.float32(_INF))
        valid_geom = jnp.maximum(nc, img) == cost
        reset = nc < cost
        inv.append((dy, dx, valid_geom, reset, nim))

    def body(state):
        lab, dist, eimg, _, i = state
        shape = lab.shape
        best = (
            jnp.full(shape, _BIG_LAB, jnp.int32),
            jnp.full(shape, _INF, jnp.float32),
            jnp.full(shape, _INF, jnp.float32),
            jnp.full(shape, _BIG_LAB, jnp.int32),
        )
        for dy, dx, valid_geom, reset, nim in inv:
            nl = _shift(lab, dy, dx, _BIG_LAB)
            nd = _shift(dist, dy, dx, _BIG_LAB)
            ne = _shift(eimg, dy, dx, jnp.float32(_INF))
            valid = valid_geom & (nl != _BIG_LAB)
            cd = jnp.where(
                valid,
                jnp.where(
                    reset, 0, jnp.where(nd < _BIG_LAB, nd + 1, _BIG_LAB)
                ),
                _BIG_LAB,
            )
            ce = jnp.where(
                valid, jnp.where(reset, nim, ne), jnp.float32(_INF)
            )
            cs = jnp.where(valid, nim, jnp.float32(_INF))
            cl = jnp.where(valid, nl, _BIG_LAB)
            best = fold_claim(best, (cd, ce, cs, cl))
        bd, be, _, bl = best
        new_l = jnp.where(updatable, bl, lab)
        new_d = jnp.where(updatable, bd, dist)
        new_e = jnp.where(updatable, be, eimg)
        # one fused reduction instead of three full-window jnp.any's
        ch = jnp.any(
            (new_l != lab) | (new_d != dist) | (new_e != eimg)
        )
        return new_l, new_d, new_e, ch, i + 1

    def cond(state):
        _, _, _, changed, i = state
        return changed & (i < inner_iters)

    lab, dist, eimg, _, _ = jax.lax.while_loop(
        cond, body, (lab, dist, eimg, jnp.bool_(True), 0)
    )
    return lab, dist, eimg


def _plane_valid(band, start, T, W, bands_per_plane):
    """Window rows belonging to the band's own plane (planes pack
    contiguously on the row axis; T | H so bands never straddle planes).
    Halo rows reaching into a NEIGHBORING plane must read as sentinels —
    otherwise costs/claims would flood across plane boundaries.  With one
    plane the mask only covers the global pad rows (already sentinels), so
    single-plane output is unchanged."""
    win = 2 * _HALO + T
    H = bands_per_plane * T
    plane = band // bands_per_plane
    row_g = jax.lax.broadcasted_iota(jnp.int32, (win, W), 0) + start - _HALO
    return (row_g >= plane * H) & (row_g < (plane + 1) * H)


def _need(prev_ref, band, n_bands):
    """Band skipping (the ccl_tiles rule): a band must re-solve only if its
    own center or a neighbor band's center changed last sweep — otherwise
    its window inputs are unchanged since it last reached a local fixpoint,
    so its output is too (both phases' relaxations are deterministic
    recomputes, so re-running them on unchanged inputs is a no-op).  A
    skipped band reports flag 0, which keeps the invariant inductive across
    consecutive skips."""
    lo = jnp.maximum(band - 1, 0)
    hi = jnp.minimum(band + 1, n_bands - 1)
    return prev_ref[band] | prev_ref[lo] | prev_ref[hi]


def _cost_kernel(cost_in, img_hbm, flags_hbm, prev_ref, cost_io, flag_ref,
                 *, T, n_bands, bands_per_plane, downward, connectivity,
                 inner_iters):
    del cost_in
    i = pl.program_id(0)
    band = i if downward else (n_bands - 1) - i
    start = band * T
    need = _need(prev_ref, band, n_bands)

    @pl.when(need == 0)
    def _skip():
        flag_ref[0, :, :] = jnp.zeros(flag_ref.shape[-2:], jnp.int32)

    def run(cost_s, img_s, flags_s, sem):
        win = 2 * _HALO + T
        for src, dst in ((cost_io, cost_s), (img_hbm, img_s), (flags_hbm, flags_s)):
            cp = pltpu.make_async_copy(src.at[pl.ds(start, win), :], dst, sem)
            cp.start()
            cp.wait()
        valid = _plane_valid(band, start, T, img_hbm.shape[-1], bands_per_plane)
        c0 = cost_s[_HALO : _HALO + T, :]
        cost_s[:, :] = _relax_cost(
            jnp.where(valid, cost_s[:, :], _INF),
            jnp.where(valid, img_s[:, :], _INF),
            jnp.where(valid, flags_s[:, :], 0),
            connectivity, inner_iters,
        )
        flag_ref[0, :, :] = jnp.broadcast_to(
            jnp.any(cost_s[_HALO : _HALO + T, :] != c0).astype(jnp.int32),
            flag_ref.shape[-2:],
        )
        wb = pltpu.make_async_copy(
            cost_s.at[pl.ds(_HALO, T), :],
            cost_io.at[pl.ds(start + _HALO, T), :],
            sem,
        )
        wb.start()
        wb.wait()

    W = img_hbm.shape[-1]
    win = 2 * _HALO + T

    @pl.when(need != 0)
    def _solve():
        pl.run_scoped(
            run,
            pltpu.VMEM((win, W), jnp.float32),
            pltpu.VMEM((win, W), jnp.float32),
            pltpu.VMEM((win, W), jnp.int32),
            pltpu.SemaphoreType.DMA,
        )


def _label_kernel(lab_in, dist_in, eimg_in, cost_hbm, img_hbm, flags_hbm,
                  prev_ref, lab_io, dist_io, eimg_io, flag_ref, *, T, n_bands,
                  bands_per_plane, downward, connectivity, inner_iters):
    del lab_in, dist_in, eimg_in
    i = pl.program_id(0)
    band = i if downward else (n_bands - 1) - i
    start = band * T
    need = _need(prev_ref, band, n_bands)

    @pl.when(need == 0)
    def _skip():
        flag_ref[0, :, :] = jnp.zeros(flag_ref.shape[-2:], jnp.int32)

    def run(lab_s, dist_s, eimg_s, cost_s, img_s, flags_s, sem):
        win = 2 * _HALO + T
        for src, dst in (
            (lab_io, lab_s), (dist_io, dist_s), (eimg_io, eimg_s),
            (cost_hbm, cost_s), (img_hbm, img_s), (flags_hbm, flags_s),
        ):
            cp = pltpu.make_async_copy(src.at[pl.ds(start, win), :], dst, sem)
            cp.start()
            cp.wait()
        valid = _plane_valid(band, start, T, img_hbm.shape[-1], bands_per_plane)
        l0 = lab_s[_HALO : _HALO + T, :]
        d0 = dist_s[_HALO : _HALO + T, :]
        e0 = eimg_s[_HALO : _HALO + T, :]
        new_l, new_d, new_e = _relax_label(
            jnp.where(valid, lab_s[:, :], _BIG_LAB),
            jnp.where(valid, dist_s[:, :], _BIG_LAB),
            jnp.where(valid, eimg_s[:, :], _INF),
            jnp.where(valid, cost_s[:, :], _INF),
            jnp.where(valid, img_s[:, :], _INF),
            jnp.where(valid, flags_s[:, :], 0),
            connectivity, inner_iters, T,
        )
        lab_s[:, :] = new_l
        dist_s[:, :] = new_d
        eimg_s[:, :] = new_e
        changed = jnp.any(
            (new_l[_HALO : _HALO + T, :] != l0)
            | (new_d[_HALO : _HALO + T, :] != d0)
            | (new_e[_HALO : _HALO + T, :] != e0)
        )
        flag_ref[0, :, :] = jnp.broadcast_to(
            changed.astype(jnp.int32), flag_ref.shape[-2:]
        )
        for buf, io in ((lab_s, lab_io), (dist_s, dist_io), (eimg_s, eimg_io)):
            wb = pltpu.make_async_copy(
                buf.at[pl.ds(_HALO, T), :],
                io.at[pl.ds(start + _HALO, T), :],
                sem,
            )
            wb.start()
            wb.wait()

    W = img_hbm.shape[-1]
    win = 2 * _HALO + T

    @pl.when(need != 0)
    def _solve():
        pl.run_scoped(
            run,
            pltpu.VMEM((win, W), jnp.int32),
            pltpu.VMEM((win, W), jnp.int32),
            pltpu.VMEM((win, W), jnp.float32),
            pltpu.VMEM((win, W), jnp.float32),
            pltpu.VMEM((win, W), jnp.float32),
            pltpu.VMEM((win, W), jnp.int32),
            pltpu.SemaphoreType.DMA,
        )


def _make_sweep(kernel_fn, n_in, T, n_bands, bands_per_plane, Hp, W,
                out_dtype, downward, connectivity, inner_iters, interpret,
                n_state: int = 1):
    """``n_state`` leading operands are carried in place (aliased outputs):
    1 for the cost sweeps, 3 for the (label, dist, entry-img) sweeps.
    ``out_dtype`` is one dtype or a per-state tuple."""
    kernel = partial(
        kernel_fn, T=T, n_bands=n_bands, bands_per_plane=bands_per_plane,
        downward=downward, connectivity=connectivity, inner_iters=inner_iters,
    )
    # per-band change flags ride a block-indexed output consumed (band-
    # indexed, SMEM) by the NEXT sweep's skip logic; up sweeps run the grid
    # reversed, so the index map converts grid step → band
    flag_index = (
        (lambda i: (i, 0, 0)) if downward
        else (lambda i: (n_bands - 1 - i, 0, 0))
    )
    flag_spec = pl.BlockSpec((1, 8, 128), flag_index)
    flag_shape = jax.ShapeDtypeStruct((n_bands, 8, 128), jnp.int32)
    dtypes = (
        out_dtype if isinstance(out_dtype, tuple)
        else (out_dtype,) * n_state
    )
    out_specs = tuple(
        pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_state)
    ) + (flag_spec,)
    out_shape = tuple(
        jax.ShapeDtypeStruct((Hp, W), dt) for dt in dtypes
    ) + (flag_shape,)
    return pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={k: k for k in range(n_state)},
        # 64 MB scoped-vmem cap (ccl_tiles._VMEM_LIMIT rationale): tile=128
        # band windows (win=144) exceed Mosaic's conservative 16 MB default
        # at 2048-wide planes
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )


@partial(
    jax.jit,
    static_argnames=(
        "connectivity", "tile", "max_sweeps", "inner_iters", "interpret",
        "with_flag", "skip_bands",
    ),
)
def watershed_sweeps(
    image: jnp.ndarray,
    markers: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    connectivity: int = 1,
    tile: int = 64,
    max_sweeps: int = 16,
    inner_iters: int = 256,
    interpret: bool = False,
    with_flag: bool = False,
    skip_bands: bool = True,
) -> jnp.ndarray:
    """Band-sweep watershed for [..., H, W] planes; same contract (and
    bit-identical output) as ops.watershed.watershed.  Batched planes pack
    contiguously on the row axis (one pallas launch floods the whole
    stack); halo rows reaching a neighboring plane are masked to sentinels
    in-kernel, so planes stay isolated.  ``with_flag=True`` appends a
    batch-shaped bool ``converged`` (scalar for one plane; False ⇔ a phase
    ran out of ``max_sweeps`` with THAT plane still changing).
    ``skip_bands=False`` disables per-band dirty-flag skipping (every sweep
    re-solves every band) — an A/B lever only; output is identical."""
    batch_shape = image.shape[:-2]
    H, W = image.shape[-2:]
    B = 1
    for d in batch_shape:
        B *= d
    T = tile
    assert H % T == 0, (H, T)
    bands_per_plane = H // T
    n_bands = B * bands_per_plane

    img = image.astype(jnp.float32)
    lab0 = markers.astype(jnp.int32)
    m = jnp.ones(image.shape, bool) if mask is None else mask.astype(bool)
    seeded = (lab0 > 0) & m
    cost0 = jnp.where(seeded, img, jnp.float32(_INF))
    flags = m.astype(jnp.int32) * _MASK_BIT + seeded.astype(jnp.int32) * _SEED_BIT

    pad = ((_HALO, _HALO), (0, 0))

    def _pack(x, fill):
        return jnp.pad(x.reshape(B * H, W), pad, constant_values=fill)

    cost_p = _pack(cost0, _INF)
    img_p = _pack(img, _INF)
    flags_p = _pack(flags, 0)
    Hp = B * H + 2 * _HALO

    # Per-band change flags drive BOTH the convergence check (free — no
    # whole-plane comparisons) and band skipping: each sweep re-solves only
    # bands whose neighborhood changed last sweep, so near-converged sweeps
    # cost almost nothing (the ccl_tiles rule; see _need).
    args = (T, n_bands, bands_per_plane, Hp, W)
    cd = _make_sweep(_cost_kernel, 3, *args, jnp.float32, True, connectivity,
                     inner_iters, interpret)
    cu = _make_sweep(_cost_kernel, 3, *args, jnp.float32, False, connectivity,
                     inner_iters, interpret)

    ones = jnp.ones((n_bands,), jnp.int32)

    def cost_body(state):
        c, flags, i = state
        prev = flags if skip_bands else ones
        c, f = jax.lax.cond(
            i % 2 == 0,
            lambda cc: cd(cc, img_p, flags_p, prev),
            lambda cc: cu(cc, img_p, flags_p, prev),
            c,
        )
        return c, f[:, 0, 0], i + 1

    def cost_cond(state):
        _, flags, i = state
        return jnp.any(flags != 0) & (i < 2 * max_sweeps)

    cost_p, cf0 = cd(cost_p, img_p, flags_p, ones)
    cost_p, c_flags, _ = jax.lax.while_loop(
        cost_cond, cost_body, (cost_p, cf0[:, 0, 0], 1)
    )

    state_dtypes = (jnp.int32, jnp.int32, jnp.float32)
    ld = _make_sweep(_label_kernel, 6, *args, state_dtypes, True, connectivity,
                     inner_iters, interpret, n_state=3)
    lu = _make_sweep(_label_kernel, 6, *args, state_dtypes, False, connectivity,
                     inner_iters, interpret, n_state=3)
    lab_p0 = _pack(jnp.where(seeded, lab0, _BIG_LAB), _BIG_LAB)
    dist_p0 = _pack(jnp.where(seeded, 0, _BIG_LAB), _BIG_LAB)
    eimg_p0 = _pack(
        jnp.where(seeded, jnp.float32(-_INF), jnp.float32(_INF)), _INF
    )

    def lab_body(state):
        l, d, e, flags, i = state
        prev = flags if skip_bands else ones
        l, d, e, f = jax.lax.cond(
            i % 2 == 0,
            lambda ll, dd, ee: ld(ll, dd, ee, cost_p, img_p, flags_p, prev),
            lambda ll, dd, ee: lu(ll, dd, ee, cost_p, img_p, flags_p, prev),
            l, d, e,
        )
        return l, d, e, f[:, 0, 0], i + 1

    def lab_cond(state):
        _, _, _, flags, i = state
        return jnp.any(flags != 0) & (i < 2 * max_sweeps)

    l1, d1, e1, lf0 = ld(lab_p0, dist_p0, eimg_p0, cost_p, img_p, flags_p,
                         ones)
    lab_p, _, _, l_flags, _ = jax.lax.while_loop(
        lab_cond, lab_body, (l1, d1, e1, lf0[:, 0, 0], 1)
    )

    lab = lab_p[_HALO : _HALO + B * H, :].reshape(image.shape)
    cost = cost_p[_HALO : _HALO + B * H, :].reshape(image.shape)
    reached = m & (cost < _INF) & (lab != _BIG_LAB)
    out = jnp.where(reached, lab, 0)
    if with_flag:
        # final sweep's per-band flags: all zero ⇔ that plane's phase is at
        # the fixpoint (the loop exits fully clean or at the sweep cap)
        conv = (
            jnp.all(c_flags.reshape(B, bands_per_plane) == 0, axis=-1)
            & jnp.all(l_flags.reshape(B, bands_per_plane) == 0, axis=-1)
        )
        return out, conv.reshape(batch_shape)
    return out