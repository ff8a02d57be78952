"""Watershed band-sweep budget probe: phase split + tile-size A/B.

VERDICT r4 #1 asks for either >=300 MP/s on config #3 or a deeper measured
floor.  This probe, on the EXACT bench fixture ([32, 512^2] touching-circle
relief, markers built by the real refine prefix), measures:

  - the cost-phase/label-phase split of watershed_sweeps (the cost loop is
    rebuilt here from the module's own kernels, stopping before phase 2);
  - tile in {32, 64, 128}: bigger bands move information further per sweep
    (fewer inter-band crossings) but pay more inner Gauss-Seidel iterations
    per visit;
  - skip_bands on/off at the chosen tile.

Usage: python scripts/ws_phase_probe.py [B] [size]
One process at a time on the relay host.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_pcis")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage as ndi

from particle_col_image_segmentation_tpu.config import RefineConfig
from particle_col_image_segmentation_tpu.ops import (
    compact_labels_auto,
    connected_components_auto,
    local_maxima_auto,
)
from particle_col_image_segmentation_tpu.ops.edt import edt_sq_exact_auto
from particle_col_image_segmentation_tpu.ops import watershed_tiles as wt


def bench_fixture(B, n):
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
    return jnp.asarray(np.stack([np.roll(prob, 17 * b, axis=1) for b in range(B)]))


@jax.jit
def make_inputs(stack):
    cfg = RefineConfig()
    binary_mask = stack < cfg.boundary_threshold
    dsq = edt_sq_exact_auto(~binary_mask, probe_cap=cfg.edt_probe_cap)
    maxima, _ = local_maxima_auto(dsq, with_flag=True)
    raw, _ = connected_components_auto(
        maxima.astype(jnp.uint8), background=0, num_classes=2, with_flag=True
    )
    markers, num, _ = compact_labels_auto(
        raw, 4096, val=maxima.astype(jnp.uint8), with_flag=True
    )
    return binary_mask, markers


def cost_phase_only(image, markers, mask, tile, skip_bands=True,
                    connectivity=1, max_sweeps=16, inner_iters=256):
    """Phase 1 of watershed_sweeps, rebuilt from the module's own kernels
    (same packing, same sweep loop) — stops before the label phase."""
    batch_shape = image.shape[:-2]
    H, W = image.shape[-2:]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    T = tile
    bands_per_plane = H // T
    n_bands = B * bands_per_plane

    img = image.astype(jnp.float32)
    lab0 = markers.astype(jnp.int32)
    m = mask.astype(bool)
    seeded = (lab0 > 0) & m
    cost0 = jnp.where(seeded, img, jnp.float32(wt._INF))
    flags = (m.astype(jnp.int32) * wt._MASK_BIT
             + seeded.astype(jnp.int32) * wt._SEED_BIT)
    pad = ((wt._HALO, wt._HALO), (0, 0))

    def _pack(x, fill):
        return jnp.pad(x.reshape(B * H, W), pad, constant_values=fill)

    cost_p = _pack(cost0, wt._INF)
    img_p = _pack(img, wt._INF)
    flags_p = _pack(flags, 0)
    Hp = B * H + 2 * wt._HALO
    args = (T, n_bands, bands_per_plane, Hp, W)
    cd = wt._make_sweep(wt._cost_kernel, 3, *args, jnp.float32, True,
                        connectivity, inner_iters, False)
    cu = wt._make_sweep(wt._cost_kernel, 3, *args, jnp.float32, False,
                        connectivity, inner_iters, False)
    ones = jnp.ones((n_bands,), jnp.int32)

    def cost_body(state):
        c, fl, i = state
        prev = fl if skip_bands else ones
        c, f = jax.lax.cond(
            i % 2 == 0,
            lambda cc: cd(cc, img_p, flags_p, prev),
            lambda cc: cu(cc, img_p, flags_p, prev),
            c,
        )
        return c, f[:, 0, 0], i + 1

    def cost_cond(state):
        _, fl, i = state
        return jnp.any(fl != 0) & (i < 2 * max_sweeps)

    cost_p, cf0 = cd(cost_p, img_p, flags_p, ones)
    cost_p, _, nsweeps = jax.lax.while_loop(
        cost_cond, cost_body, (cost_p, cf0[:, 0, 0], 1)
    )
    return cost_p, nsweeps


def _sync(out):
    # device-side slice, ONE element over the relay: np.asarray on the full
    # leaf would bill a 30-70 MB relay transfer to the kernel under test
    return np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])


def timeit(fn, reps=6):
    out = fn()
    _ = _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _ = _sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3, out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    print("backend:", jax.default_backend(), "B:", B, "size:", n, flush=True)
    stack = bench_fixture(B, n)
    mask, markers = jax.block_until_ready(make_inputs(stack))
    mask = jnp.asarray(np.asarray(mask))  # detach from the builder graph
    markers = jnp.asarray(np.asarray(markers))
    mp = B * n * n / 1e6

    # burn the first-timed-loop relay artifact
    bf = jax.jit(lambda p: p + 1)
    _ = np.asarray(bf(stack))[:1, :1, :1]
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(8):
            _ = bf(stack)
        _ = np.asarray(_)[:1, :1, :1]
        print(f"burn: {(time.perf_counter() - t0) / 8 * 1e3:.2f} ms", flush=True)

    ref = None
    for tile in (32, 64, 128):
        f = jax.jit(lambda im, mk, ms, t=tile: wt.watershed_sweeps(
            im, mk, ms, tile=t, with_flag=True))
        ms_full, out = timeit(lambda: f(stack, markers, mask))
        lab = np.asarray(out[0])
        conv = bool(np.asarray(out[1]).all())
        if ref is None:
            ref = lab
        bit = bool((lab == ref).all())
        g = jax.jit(lambda im, mk, ms, t=tile: cost_phase_only(
            im, mk, ms, tile=t))
        ms_p1, (cost_p, nsw) = timeit(lambda: g(stack, markers, mask))
        print(
            f"tile={tile:4d}: full {ms_full:7.2f} ms ({mp / ms_full * 1e3:6.1f}"
            f" MP/s)  phase1 {ms_p1:6.2f} ms  phase2 {ms_full - ms_p1:6.2f} ms"
            f"  p1_sweeps={int(np.asarray(nsw))}  conv={conv} bit_eq={bit}",
            flush=True,
        )
    f = jax.jit(lambda im, mk, ms: wt.watershed_sweeps(
        im, mk, ms, tile=64, skip_bands=False, with_flag=True))
    ms_ns, out = timeit(lambda: f(stack, markers, mask))
    print(f"tile=  64 skip_bands=False: {ms_ns:7.2f} ms  "
          f"bit_eq={bool((np.asarray(out[0]) == ref).all())}", flush=True)


if __name__ == "__main__":
    main()
