"""Cumulative-prefix profile of threshold_and_count_batch at 512² (config #1).

VERDICT r4 #5: configs #1/#2 compute-only plateau at ~90-99 MP/s on 512²
planes vs 712 MP/s for the 2048² kernel family — attribute the per-sweep
fixed costs.  Prefixes of the fused graph are timed like
refine_prefix_profile.py (per-stage deltas inside one fused graph each).

Usage: python scripts/config1_profile.py [B] [size]
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

from particle_col_image_segmentation_tpu.ops.threshold import otsu_threshold

ITERS = 8
MAX_REGIONS = 4096


def make_batch(B, n):
    rng = np.random.default_rng(7)
    planes = []
    for _ in range(B):
        img = rng.normal(900.0, 120.0, (n, n)).astype(np.float32)
        yy, xx = np.mgrid[:n, :n]
        for _ in range(12):
            cy, cx = rng.integers(30, n - 30, 2)
            r2 = int(rng.integers(100, 900))
            img += 2000.0 * ((yy - cy) ** 2 + (xx - cx) ** 2 <= r2)
        planes.append(img)
    return jnp.asarray(np.stack(planes)).astype(jnp.uint16)


def stage_otsu(x):
    return jax.vmap(otsu_threshold)(x.astype(jnp.float32))


def stage_mask(x):
    xf = x.astype(jnp.float32)
    t = jax.vmap(otsu_threshold)(xf)
    return (xf > t[:, None, None]).astype(jnp.uint8)


def stage_ccl(x):
    from particle_col_image_segmentation_tpu.ops import (
        connected_components_auto,
    )

    m8 = stage_mask(x)
    raw, _ = connected_components_auto(
        m8, background=None, num_classes=2, with_flag=True
    )
    return raw


def stage_cmp(x):
    from particle_col_image_segmentation_tpu.ops import (
        connected_components_auto,
    )
    from particle_col_image_segmentation_tpu.ops.ccl import compact_labels_auto

    m8 = stage_mask(x)
    raw, _ = connected_components_auto(
        m8, background=None, num_classes=2, with_flag=True
    )
    seg, num, _ = compact_labels_auto(raw, MAX_REGIONS, val=m8, with_flag=True)
    return seg


def stage_tab(x):
    from particle_col_image_segmentation_tpu.ops.threshold import (
        threshold_and_count_batch,
    )

    mask, seg, count, num_fg, num_total, conv = threshold_and_count_batch(
        x, MAX_REGIONS
    )
    return seg + count[:, None, None]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    print("backend:", jax.default_backend(), "B:", B, "size:", n)
    x = make_batch(B, n)
    mp = B * n * n / 1e6
    bf = jax.jit(lambda p: p + 1)
    _ = int(jnp.sum(bf(x)))
    for _ in range(2):
        t0 = time.perf_counter()
        acc = 0
        for _ in range(ITERS):
            acc += jnp.sum(bf(x))
        _ = int(acc)
        print(f"burn loop: {(time.perf_counter() - t0) / ITERS * 1e3:.2f} ms")
    prev = 0.0
    for name, fn in (
        ("otsu", stage_otsu),
        ("+mask", stage_mask),
        ("+ccl", stage_ccl),
        ("+compact", stage_cmp),
        ("full t&c_batch", stage_tab),
    ):
        jf = jax.jit(fn)
        out = jf(x)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(ITERS):
            acc += jnp.sum(jf(x).astype(jnp.float32))
        _ = float(acc)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(
            f"{name:16s} cum {dt:8.2f} ms/batch ({mp / dt * 1e3:7.1f} MP/s)"
            f"   delta {dt - prev:8.2f} ms",
            flush=True,
        )
        prev = dt


if __name__ == "__main__":
    main()
