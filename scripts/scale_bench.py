"""Streaming scale benchmark (BASELINE config #5 shape).

Runs run_batch over N synthetic 2048x2048 label planes through the real
streaming path -- prefetching loader, device transfer, fused segmentation,
manifest bookkeeping -- and reports END-TO-END MP/s including host work
(bench.py measures device compute only).

    PYTHONPATH=/root/.axon_site python scripts/scale_bench.py [--planes 64]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_pcis")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--planes", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import numpy as np

    from bench import MAX_REGIONS, make_plane
    from particle_col_image_segmentation_tpu.config import AnalysisConfig
    from particle_col_image_segmentation_tpu.models.batch import run_batch

    cfg = AnalysisConfig(max_regions=MAX_REGIONS)
    # pre-generate a pool; the loader "decodes" by copying (stands in for the
    # native TIFF codec, which is I/O-bound and overlaps device compute)
    pool = [make_plane(s) for s in range(8)]
    paths = [f"plane_{i}" for i in range(args.planes)]

    def load(path):
        return np.array(pool[int(path.split("_")[1]) % len(pool)])

    # warmup batch (compile)
    _ = list(run_batch(paths[: args.batch], load, cfg, batch_size=args.batch))

    t0 = time.perf_counter()
    n = 0
    regions = 0
    for _path, stats in run_batch(paths, load, cfg, batch_size=args.batch):
        n += 1
        regions += stats.num_regions
    dt = time.perf_counter() - t0
    mp = n * 2048 * 2048 / 1e6
    print(
        f"streamed {n} planes ({mp:.0f} MP) in {dt:.2f} s = "
        f"{mp/dt:.1f} MP/s end-to-end (device+loader); "
        f"{regions} regions total"
    )


if __name__ == "__main__":
    main()
