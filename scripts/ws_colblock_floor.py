"""Column-block dirty-granularity floor analysis for the watershed sweeps.

VERDICT r4 #1 names two levers for config #3: a cheaper claim relaxation
(SHIPPED round 5: hoisted phase-invariants, −13%) and column-block dirty
granularity inside hot bands.  Before building the second into the Pallas
kernels (a 2-D skip grid + dynamic column windows), this script measures
the GEOMETRY that bounds its win: per relaxation step of phase 2, which
(64-row band × column block) tiles actually change?

Band skipping already removes bands with NO dirty tile.  Column-block
skipping can only save the clean-block fraction WITHIN dirty bands — and
on TPU a block cannot be narrower than one 128-lane tile plus halo, and
the relaxation on a narrower window still pays full vector lanes unless
the width drops below the padded tile count.  At the bench width (512)
the realistic block is 256 columns (2 lane tiles + halo), i.e. the win is
bounded by the fraction of dirty bands whose dirt fits ONE half.

Method: run the phase-2 claim relaxation (the module's own
claim_candidates/fold_claim, Jacobi schedule — the same fixpoint, and
schedule-independent geometry) on the bench fixture, capture the change
mask per iteration, and tabulate dirty tiles.  Runs on CPU
(jax_platforms pinned) — no chip needed for geometry.

Usage: python scripts/ws_colblock_floor.py [n] [colblock]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from scipy import ndimage as ndi

from particle_col_image_segmentation_tpu.config import RefineConfig
from particle_col_image_segmentation_tpu.ops.watershed import (
    _BIG_LAB,
    _INF,
    _shifted,
    claim_candidates,
    fold_claim,
)


def bench_plane(n):
    rng = np.random.default_rng(0)
    m = np.zeros((n, n), bool)
    yy, xx = np.mgrid[:n, :n]
    for _ in range(30):
        cy, cx = rng.integers(40, n - 40, 2)
        r2 = int(rng.integers(150, 400))
        m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r2
        m |= (yy - cy) ** 2 + (xx - cx - int(1.5 * np.sqrt(r2))) ** 2 <= r2
    dist = ndi.distance_transform_edt(m)
    prob = (1.0 - dist / max(1.0, dist.max())).astype(np.float32)
    return prob


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    T = 64
    cfg = RefineConfig()
    prob = bench_plane(n)

    from particle_col_image_segmentation_tpu.ops import (
        compact_labels_auto,
        connected_components_auto,
        local_maxima_auto,
    )
    from particle_col_image_segmentation_tpu.ops.edt import edt_sq_exact_auto

    pj = jnp.asarray(prob)
    binary = pj < cfg.boundary_threshold
    dsq = edt_sq_exact_auto(~binary, probe_cap=cfg.edt_probe_cap)
    mx, _ = local_maxima_auto(dsq, with_flag=True)
    raw, _ = connected_components_auto(
        mx.astype(jnp.uint8), background=0, num_classes=2, with_flag=True
    )
    markers, num, _ = compact_labels_auto(
        raw, 4095, val=mx.astype(jnp.uint8), with_flag=True
    )

    img = pj.astype(jnp.float32)
    mask = binary
    seeded = (markers > 0) & mask

    # phase 1 (cost) to fixpoint — plain Jacobi
    cost = jnp.where(seeded, img, jnp.float32(_INF))
    upd = mask & ~seeded
    for _ in range(10000):
        best = cost
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            nc = _shifted(cost, dy, dx, jnp.float32(_INF))
            best = jnp.minimum(best, jnp.maximum(nc, img))
        new = jnp.where(upd, best, cost)
        if bool(jnp.all(new == cost)):
            break
        cost = new

    # phase 2 (claims) — capture change masks per Jacobi iteration
    lab = jnp.where(seeded, markers.astype(jnp.int32), _BIG_LAB)
    dist = jnp.where(seeded, 0, _BIG_LAB)
    eimg = jnp.where(seeded, jnp.float32(-_INF), jnp.float32(_INF))
    stats = []
    H, W = prob.shape
    nb, ncb = H // T, W // cb
    for it in range(10000):
        shape = lab.shape
        best = (
            jnp.full(shape, _BIG_LAB, jnp.int32),
            jnp.full(shape, _INF, jnp.float32),
            jnp.full(shape, _INF, jnp.float32),
            jnp.full(shape, _BIG_LAB, jnp.int32),
        )
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            cand = claim_candidates(
                cost, img, lab, dist, eimg, dy, dx, _shifted
            )
            best = fold_claim(best, cand)
        bd, be, _, bl = best
        new_l = jnp.where(upd, bl, lab)
        new_d = jnp.where(upd, bd, dist)
        new_e = jnp.where(upd, be, eimg)
        ch = (new_l != lab) | (new_d != dist) | (new_e != eimg)
        chn = np.asarray(ch)
        if not chn.any():
            break
        tiles = chn.reshape(nb, T, ncb, cb).any(axis=(1, 3))  # [nb, ncb]
        dirty_bands = tiles.any(axis=1)
        n_dirty_bands = int(dirty_bands.sum())
        # blocks the band-skip already pays for vs blocks col-skip would run
        band_blocks = n_dirty_bands * ncb
        col_blocks = int(tiles.sum())
        one_half = int((tiles.sum(axis=1) == 1).sum())
        stats.append((n_dirty_bands, band_blocks, col_blocks, one_half))
        lab, dist, eimg = new_l, new_d, new_e
    tot_band = sum(s[1] for s in stats)
    tot_col = sum(s[2] for s in stats)
    print(f"plane {n}², colblock={cb}, T={T}: {len(stats)} Jacobi iters")
    print(f"band-granular work (dirty bands × {ncb} blocks): {tot_band}")
    print(f"column-granular work (dirty blocks only):       {tot_col}")
    print(f"upper bound on col-skip saving within dirty bands: "
          f"{100 * (1 - tot_col / max(tot_band, 1)):.1f}%")
    frac_one = sum(s[3] for s in stats) / max(sum(s[0] for s in stats), 1)
    print(f"dirty bands whose dirt fits one {cb}-col block: "
          f"{100 * frac_one:.1f}%")
    # iteration-resolved tail: late iterations are where skipping could help
    tail = stats[len(stats) // 2 :]
    tb = sum(s[1] for s in tail)
    tc = sum(s[2] for s in tail)
    print(f"second-half iterations only: saving bound "
          f"{100 * (1 - tc / max(tb, 1)):.1f}%")


if __name__ == "__main__":
    main()
