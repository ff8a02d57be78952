"""Per-stage micro-benchmark of the fused segmentation pass on the chip.

Times each stage with the scalar-fingerprint sync the relay requires
(block_until_ready is a no-op there).  Run ONE process at a time — relay
compiles serialize.  PYTHONPATH must include /root/.axon_site.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_pcis")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import BATCH, MAX_REGIONS, make_plane
from particle_col_image_segmentation_tpu.config import AnalysisConfig
from particle_col_image_segmentation_tpu.ops import (
    connected_components_auto,
    median_label_filter,
)
from particle_col_image_segmentation_tpu.ops.ccl import compact_labels_auto
from particle_col_image_segmentation_tpu.ops.regionprops_tiles import (
    region_counts_auto,
)

cfg = AnalysisConfig(max_regions=MAX_REGIONS)
ITERS = 6


def timed(name, fn, *args):
    out = fn(*args)  # warmup/compile
    first = out[0] if isinstance(out, tuple) else out
    fp0 = float(jnp.sum(first.astype(jnp.float32)))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(ITERS):
        out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        acc += jnp.sum(first.astype(jnp.float32))
    _ = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"{name:24s} {dt*1e3/BATCH:8.2f} ms/plane   (batch {dt*1e3:8.2f} ms)  fp={fp0:.3g}",
        flush=True,
    )
    return out


def main():
    print("backend:", jax.default_backend())
    batch = jnp.asarray(np.stack([make_plane(s) for s in range(BATCH)]))

    # dispatch floor: trivial kernel, same sync pattern
    timed("noop x+1", jax.jit(lambda x: x + jnp.uint8(1)), batch)

    f_med = jax.jit(lambda x: median_label_filter(x, cfg.denoise_size, cfg.num_classes))
    den = timed("median 5x5", f_med, batch)

    f_ccl = jax.jit(
        lambda d: connected_components_auto(d, background=None, num_classes=cfg.num_classes)
    )
    raw = timed("ccl (band sweeps)", f_ccl, den)

    f_compact = jax.jit(lambda r: compact_labels_auto(r, cfg.max_regions))
    seg, num = timed("compact (sweeps)", f_compact, raw)

    f_counts = jax.jit(lambda s, d: region_counts_auto(s, d, cfg.max_regions))
    timed("region_counts (mxu)", f_counts, seg, den)

    f_px = jax.jit(
        lambda d: jnp.stack(
            [jnp.sum((d == v).astype(jnp.int32), axis=(-2, -1)) for v in range(cfg.num_classes)],
            axis=-1,
        )
    )
    timed("class_px histogram", f_px, den)


if __name__ == "__main__":
    main()
