"""Cumulative-prefix timing of the refine graph (config #3) on the chip.

Times jitted PREFIXES of refine_plane_device, so per-stage cost is the
delta between consecutive prefixes measured inside one fused graph each
(standalone stage timings are dispatch-dominated on the relay).

Usage: python scripts/refine_prefix_profile.py [B]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_pcis")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from particle_col_image_segmentation_tpu.config import RefineConfig
from particle_col_image_segmentation_tpu.ops import (
    connected_components_auto,
    local_maxima_auto,
    watershed_auto,
)
from particle_col_image_segmentation_tpu.ops.ccl import compact_labels_auto
from particle_col_image_segmentation_tpu.ops.edt import edt_sq_exact_auto
from particle_col_image_segmentation_tpu.ops.regionprops_tiles import (
    centroid_sums_auto,
)
from refine_profile import make_stack

ITERS = 6
MAX_REGIONS = 4095  # matches the shipped refine default (zero-pad-row tables)
cfg = RefineConfig()


def stage_edt(p):
    binary = p < cfg.boundary_threshold
    return edt_sq_exact_auto(~binary, probe_cap=cfg.edt_probe_cap)


def stage_max(p):
    d = stage_edt(p)
    mx, _ = local_maxima_auto(d, with_flag=True)
    return mx


def stage_ccl(p):
    mx = stage_max(p)
    raw, _ = connected_components_auto(
        mx.astype(jnp.uint8), background=0, num_classes=2, with_flag=True
    )
    return raw


def stage_cmp(p):
    mx = stage_max(p)
    raw, _ = connected_components_auto(
        mx.astype(jnp.uint8), background=0, num_classes=2, with_flag=True
    )
    markers, num, _ = compact_labels_auto(
        raw, MAX_REGIONS, val=mx.astype(jnp.uint8), with_flag=True
    )
    return markers


def stage_ws(p):
    binary = p < cfg.boundary_threshold
    markers = stage_cmp(p)
    labels, _ = watershed_auto(p, markers, binary, with_flag=True)
    return labels


def stage_tab(p):
    labels = stage_ws(p)
    t = centroid_sums_auto(labels, MAX_REGIONS)
    return labels + t.area.astype(jnp.int32).sum()


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print("backend:", jax.default_backend())
    probs = make_stack(B)
    # burn the first-timed-loop relay artifact (~130 ms once per process)
    bf = jax.jit(lambda p: p + 1)
    _ = float(jnp.sum(bf(probs)))
    # the FIRST *timed-pattern* loop in a process reads ~130 ms regardless
    # of workload on the relay — burn one full timed loop, not just calls
    for _ in range(2):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(ITERS):
            acc += jnp.sum(bf(probs))
        _ = float(acc)
        print(f"burn loop: {(time.perf_counter() - t0) / ITERS * 1e3:.2f} ms")
    prev = 0.0
    for name, fn in (
        ("edt", stage_edt),
        ("+local_maxima", stage_max),
        ("+ccl", stage_ccl),
        ("+compact", stage_cmp),
        ("+watershed", stage_ws),
        ("+tables", stage_tab),
    ):
        jf = jax.jit(fn)
        out = jf(probs)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(ITERS):
            acc += jnp.sum(jf(probs).astype(jnp.float32))
        _ = float(acc)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(
            f"{name:16s} cum {dt:8.2f} ms/batch   delta {dt - prev:8.2f} ms",
            flush=True,
        )
        prev = dt


if __name__ == "__main__":
    main()
