"""Round-5 chip probe 1: Pallas capped EDT + scatter-free Otsu histogram.

Parity on real hardware, then same-process A/B timings at the bench shapes.
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

from particle_col_image_segmentation_tpu.ops.edt import edt_sq
from particle_col_image_segmentation_tpu.ops.edt_tiles import edt_sq_pallas
from particle_col_image_segmentation_tpu.ops.threshold import (
    otsu_threshold,
    otsu_threshold_batch,
)


def timeit(fn, reps=6):
    out = fn()
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(11)
    bf = jax.jit(lambda p: p + 1)
    x0 = jnp.ones((256, 256))
    _ = np.asarray(bf(x0))[:1, :1]
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(8):
            _ = bf(x0)
        _ = np.asarray(_)[:1, :1]
        print(f"burn: {(time.perf_counter() - t0) / 8 * 1e3:.2f} ms", flush=True)

    # --- EDT parity + timing at the refine bench shape -------------------
    B, n = 32, 512
    f = jnp.asarray(rng.random((B, n, n)) < 0.03)
    for cap in (20, 32):
        a = np.asarray(jax.jit(lambda v: edt_sq(v, cap=cap))(f))
        b = np.asarray(jax.jit(lambda v: edt_sq_pallas(v, cap=cap))(f))
        print(f"edt cap={cap} chip bit_eq: {(a == b).all()}", flush=True)
        assert (a == b).all()
    mp = B * n * n / 1e6
    for cap in (20, 32):
        xla = jax.jit(lambda v, c=cap: edt_sq(v, cap=c))
        for tile in (32, 64, 128):
            pal = jax.jit(lambda v, c=cap, t=tile: edt_sq_pallas(v, cap=c, tile=t))
            tp = timeit(lambda: pal(f))
            print(f"cap={cap} pallas tile={tile}: {tp:6.2f} ms ({mp/tp*1e3:7.1f} MP/s)",
                  flush=True)
        tx = timeit(lambda: xla(f))
        print(f"cap={cap} xla:            {tx:6.2f} ms ({mp/tx*1e3:7.1f} MP/s)",
              flush=True)

    # 2048² batch (headline-plane shape, dilate/fill caps)
    f2 = jnp.asarray(rng.random((4, 2048, 2048)) < 0.01)
    mp2 = 4 * 2048 * 2048 / 1e6
    for cap in (20,):
        tx = timeit(lambda: jax.jit(lambda v, c=cap: edt_sq(v, cap=c))(f2))
        tp = timeit(lambda: jax.jit(lambda v, c=cap: edt_sq_pallas(v, cap=c))(f2))
        print(f"[4,2048²] cap={cap}: xla {tx:6.2f} ms  pallas {tp:6.2f} ms",
              flush=True)

    # --- Otsu parity + timing at the config #1 shape ---------------------
    B1, n1 = 16, 512
    imgs = rng.normal(900.0, 120.0, (B1, n1, n1)).astype(np.float32)
    yy, xx = np.mgrid[:n1, :n1]
    for b in range(B1):
        for _ in range(12):
            cy, cx = rng.integers(30, n1 - 30, 2)
            r2 = int(rng.integers(100, 900))
            imgs[b] += 2000.0 * ((yy - cy) ** 2 + (xx - cx) ** 2 <= r2)
    xs = jnp.asarray(imgs.astype(np.uint16))
    tb = np.asarray(jax.jit(otsu_threshold_batch)(xs.astype(jnp.float32)))
    ts = np.asarray(jax.jit(jax.vmap(otsu_threshold))(xs.astype(jnp.float32)))
    print("otsu batch == vmap(single):", np.array_equal(tb, ts),
          "max |d|:", np.abs(tb - ts).max(), flush=True)
    t_new = timeit(lambda: jax.jit(otsu_threshold_batch)(xs.astype(jnp.float32)))
    t_old = timeit(lambda: jax.jit(jax.vmap(otsu_threshold))(xs.astype(jnp.float32)))
    print(f"otsu [16,512²]: scatter {t_old:6.2f} ms → mxu {t_new:6.2f} ms",
          flush=True)

    from particle_col_image_segmentation_tpu.ops.threshold import (
        threshold_and_count_batch,
    )

    tc = jax.jit(lambda v: threshold_and_count_batch(v, max_regions=4095))
    out = tc(xs)
    t_tc = timeit(lambda: tc(xs))
    mp1 = B1 * n1 * n1 / 1e6
    print(f"threshold_and_count_batch [16,512²]: {t_tc:6.2f} ms "
          f"({mp1/t_tc*1e3:6.1f} MP/s)  counts={np.asarray(out[2])[:4]}",
          flush=True)


if __name__ == "__main__":
    main()
