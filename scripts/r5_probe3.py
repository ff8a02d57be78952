"""Round-5 chip probe 3: clean certified-exact EDT A/B (Pallas capped probe
vs XLA capped probe) inside the refine-graph shape, then the full refine
prefix profile.  All jits defined ONCE; A/B arms interleave so relay drift
hits both equally.  Usage: python scripts/r5_probe3.py [B] [size]
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

from ws_phase_probe import bench_fixture
from particle_col_image_segmentation_tpu.config import RefineConfig
from particle_col_image_segmentation_tpu.ops.edt import (
    edt_sq,
    edt_sq_exact,
)
from particle_col_image_segmentation_tpu.ops.edt_tiles import edt_sq_pallas

cfg = RefineConfig()


def _sync(out):
    return np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])


def interleaved_ab(fns, reps=6, rounds=4):
    """Best-of-rounds per arm, arms alternating within each round."""
    best = {k: float("inf") for k in fns}
    for k, f in fns.items():
        _sync(f())  # compile + warm
    for _ in range(rounds):
        for k, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f()
            _sync(out)
            best[k] = min(best[k], (time.perf_counter() - t0) / reps)
    return {k: v * 1e3 for k, v in best.items()}


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    print("backend:", jax.default_backend(), "B:", B, "size:", n, flush=True)
    stack = bench_fixture(B, n)
    feat = jnp.asarray(
        np.asarray(stack) >= cfg.boundary_threshold
    )  # ~binary_mask

    bf = jax.jit(lambda p: p + 1)
    _ = _sync(bf(stack))
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(8):
            out = bf(stack)
        _ = _sync(out)
        print(f"burn: {(time.perf_counter() - t0) / 8 * 1e3:.2f} ms", flush=True)

    cap = cfg.edt_probe_cap

    def certified(capped_fn):
        def run(f):
            capped = capped_fn(f)
            deep = jnp.any(capped > cap * cap)
            return jax.lax.cond(
                deep,
                lambda ff, _c: edt_sq_exact(ff, 128),
                lambda _f, c: c,
                f,
                capped,
            )

        return run

    fns = {
        "xla_probe": jax.jit(certified(lambda f: edt_sq(f, cap=cap))),
        "pallas_t64": jax.jit(certified(lambda f: edt_sq_pallas(f, cap=cap, tile=64))),
        "pallas_t128": jax.jit(certified(lambda f: edt_sq_pallas(f, cap=cap, tile=128))),
        "pallas_t32": jax.jit(certified(lambda f: edt_sq_pallas(f, cap=cap, tile=32))),
    }
    a = np.asarray(fns["xla_probe"](feat))
    b = np.asarray(fns["pallas_t64"](feat))
    print("certified-exact bit_eq:", (a == b).all(), flush=True)
    res = interleaved_ab({k: (lambda f=f: f(feat)) for k, f in fns.items()})
    mp = B * n * n / 1e6
    for k, v in res.items():
        print(f"edt {k:12s}: {v:7.2f} ms  ({mp / v * 1e3:7.1f} MP/s)", flush=True)

    # [4, 2048²] cap=20 — the dilate/fill-sized planes (gate check)
    rng = np.random.default_rng(5)
    f2 = jnp.asarray(rng.random((4, 2048, 2048)) < 0.01)
    fns2 = {
        "xla": jax.jit(lambda f: edt_sq(f, cap=20)),
        "pallas_t64": jax.jit(lambda f: edt_sq_pallas(f, cap=20, tile=64)),
    }
    res2 = interleaved_ab({k: (lambda f=f: f(f2)) for k, f in fns2.items()})
    for k, v in res2.items():
        print(f"[4,2048²] cap=20 {k:10s}: {v:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
