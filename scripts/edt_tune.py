"""Tune edt_sq_exact's scan chunking (rows_per_step) on the chip.

The phase-2 min-plus is a lax.scan over row chunks; chunk size trades scan
step count against per-step unrolled work.  Usage:
  python scripts/edt_tune.py [B] [n]
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

from particle_col_image_segmentation_tpu.ops.edt import edt_sq_exact

ITERS = 6


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.random((B, n, n)) < 0.02)

    for rps in (4, 8, 16, 32, 64, 128):
        fn = jax.jit(lambda f, r=rps: edt_sq_exact(f, rows_per_step=r))
        out = fn(feat)
        fp = float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(ITERS):
            acc += jnp.sum(fn(feat).astype(jnp.float32))
        _ = float(acc)
        dt = (time.perf_counter() - t0) / ITERS
        print(
            f"rows_per_step={rps:4d}  {dt*1e3:8.2f} ms/batch "
            f"({dt*1e3/B:6.2f} ms/plane)  fp={fp:.4g}",
            flush=True,
        )


if __name__ == "__main__":
    main()
