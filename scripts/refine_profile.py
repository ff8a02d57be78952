"""Per-stage micro-benchmark of the refine pipeline (BASELINE config #3).

Times each stage of models.refine.refine_plane_device on a [B, 512, 512]
probability stack with the scalar-fingerprint sync the relay requires.
Run ONE process at a time — relay compiles serialize.

Usage: python scripts/refine_profile.py [B]
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
from particle_col_image_segmentation_tpu.models.refine import refine_plane_device
from particle_col_image_segmentation_tpu.ops import (
    connected_components_auto,
    local_maxima,
    region_props_auto,
    watershed_auto,
)
from particle_col_image_segmentation_tpu.ops.ccl import compact_labels_auto
from particle_col_image_segmentation_tpu.ops.edt import edt_exact

ITERS = 4
MAX_REGIONS = 4096


def make_stack(B, n=512, seed=0):
    """Touching-cell probability planes like the bench config #3 fixture."""
    rng = np.random.default_rng(seed)
    planes = []
    for _ in range(B):
        m = np.zeros((n, n), bool)
        yy, xx = np.mgrid[:n, :n]
        for _ in range(24):
            cy, cx = rng.integers(40, n - 40, 2)
            r2 = int(rng.integers(150, 400))
            m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r2
            m |= (yy - cy) ** 2 + (xx - cx - int(1.5 * np.sqrt(r2))) ** 2 <= r2
        dist = ndi.distance_transform_edt(m)
        planes.append(
            (1.0 - dist / max(1.0, dist.max())).astype(np.float32)
        )
    return jnp.asarray(np.stack(planes))


def timed(name, fn, *args, B=1):
    out = fn(*args)  # warmup/compile
    first = out[0] if isinstance(out, tuple) else out
    _ = float(jnp.sum(first.astype(jnp.float32)))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(ITERS):
        out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        acc += jnp.sum(first.astype(jnp.float32))
    _ = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"{name:22s} {dt*1e3/B:8.2f} ms/plane   (batch {dt*1e3:8.2f} ms)",
        flush=True,
    )
    return out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print("backend:", jax.default_backend(), "devices:", jax.devices())
    probs = make_stack(B)
    cfg = RefineConfig()

    binary = probs < cfg.boundary_threshold

    f_edt = jax.jit(lambda b: edt_exact(~b))
    dist = timed("edt_exact", f_edt, binary, B=B)

    f_max = jax.jit(lambda d: local_maxima(d, with_flag=True))
    maxima, _ = timed("local_maxima", f_max, dist, B=B)

    f_ccl = jax.jit(
        lambda mx: connected_components_auto(
            mx.astype(jnp.uint8), background=0, num_classes=2, with_flag=True
        )
    )
    raw, _ = timed("ccl(markers)", f_ccl, maxima, B=B)

    f_cmp = jax.jit(
        lambda r, mx: compact_labels_auto(
            r, MAX_REGIONS, val=mx.astype(jnp.uint8), with_flag=True
        )
    )
    markers, num, _ = timed("compact_labels", f_cmp, raw, maxima, B=B)

    f_ws = jax.jit(
        lambda p, mk, bi: watershed_auto(p, mk, bi, with_flag=True)
    )
    labels, _ = timed("watershed", f_ws, probs, markers, binary, B=B)

    f_tab = jax.jit(
        lambda lb: region_props_auto(
            lb, jnp.ones_like(lb, jnp.uint8), MAX_REGIONS, val_bound=1
        )
    )
    timed("region_tables", f_tab, labels, B=B)

    f_all = jax.jit(lambda p: refine_plane_device(p, cfg, MAX_REGIONS))
    timed("FULL refine graph", f_all, probs, B=B)
    mps = None
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f_all(probs)
        _ = float(jnp.sum(out[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS
    mps = B * probs.shape[-1] * probs.shape[-2] / dt / 1e6
    print(f"end-to-end: {mps:.1f} MP/s")


if __name__ == "__main__":
    main()
