"""Round-5 chip probe 2: watershed phase split / tile A/B + table-cap A/B +
end-to-end refine timing at the bench shape.  One process (relay compiles
serialize).  Usage: python scripts/r5_probe2.py [B] [size]
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

from ws_phase_probe import bench_fixture, make_inputs, cost_phase_only, timeit
from particle_col_image_segmentation_tpu.ops import watershed_tiles as wt
from particle_col_image_segmentation_tpu.ops.regionprops_tiles import (
    centroid_sums_mxu,
)
from particle_col_image_segmentation_tpu.config import RefineConfig
from particle_col_image_segmentation_tpu.models.refine import refine_plane_device


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    print("backend:", jax.default_backend(), "B:", B, "size:", n, flush=True)
    stack = bench_fixture(B, n)
    mask, markers = jax.block_until_ready(make_inputs(stack))
    mask = jnp.asarray(np.asarray(mask))
    markers = jnp.asarray(np.asarray(markers))
    mp = B * n * n / 1e6

    bf = jax.jit(lambda p: p + 1)
    _ = np.asarray(bf(stack))[:1, :1, :1]
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(8):
            _ = bf(stack)
        _ = np.asarray(_)[:1, :1, :1]
        print(f"burn: {(time.perf_counter() - t0) / 8 * 1e3:.2f} ms", flush=True)

    # --- clean EDT A/B (1-element sync; probe1's full-buffer readbacks
    # polluted these) ------------------------------------------------------
    from particle_col_image_segmentation_tpu.ops.edt import edt_sq
    from particle_col_image_segmentation_tpu.ops.edt_tiles import edt_sq_pallas

    feat = ~mask
    for cap in (32,):
        tx, _ = timeit(lambda: jax.jit(lambda v, c=cap: edt_sq(v, cap=c))(feat))
        print(f"edt cap={cap} xla:   {tx:6.2f} ms", flush=True)
        for tile in (64, 128):
            tp, _ = timeit(lambda: jax.jit(
                lambda v, c=cap, t=tile: edt_sq_pallas(v, cap=c, tile=t))(feat))
            print(f"edt cap={cap} pallas tile={tile}: {tp:6.2f} ms", flush=True)

    # --- watershed tile sweep + phase split ------------------------------
    ref = None
    for tile in (64, 128, 32):
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

    # --- centroid table cap A/B: 4095 (Qp=32 exact) vs 4096 (Qp=48) ------
    lab_j = jnp.asarray(ref)
    for cap in (4095, 4096):
        f = jax.jit(lambda s, c=cap: centroid_sums_mxu(s, c))
        t, _ = timeit(lambda: f(lab_j))
        print(f"centroid_sums_mxu R={cap + 1}: {t:6.2f} ms", flush=True)

    # --- end-to-end refine graph (shipped path, new defaults) ------------
    rcfg = RefineConfig()
    out = refine_plane_device(stack, rcfg, 4095)
    assert bool(np.asarray(out[-1]).all())
    t, _ = timeit(lambda: refine_plane_device(stack, rcfg, 4095))
    print(f"refine_plane_device B={B} {n}²: {t:7.2f} ms  "
          f"({mp / t * 1e3:6.1f} MP/s)", flush=True)


if __name__ == "__main__":
    main()
