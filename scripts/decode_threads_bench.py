"""Decode-thread scaling table: native TIFF + HDF5 decode MP/s at 1/2/4/8
loader threads (VERDICT r4 #4 — the config #2 story's remaining prose is
"decode parallelizes across loader threads").

Times prefetch_map (io/loader.py thread pool) draining N synthetic files per
worker count, decode only (no device in the loop).  The native TIFF codec is
a ctypes call (GIL released during the C decode), so threads CAN overlap —
but only if the host has cores to run them; this host's core count is
printed next to the table so a flat curve reads as core-bound, not
codec-serialized.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from particle_col_image_segmentation_tpu.io.hdf5 import (
    load_h5_plane,
    save_h5_plane,
)
from particle_col_image_segmentation_tpu.io.loader import prefetch_map
from particle_col_image_segmentation_tpu.io.tiff import (
    read_tiff_stack,
    write_tiff,
)

N_FILES = 24
SIZE = 2048


def bench(load_fn, paths, workers, reps=3):
    mp = N_FILES * SIZE * SIZE / 1e6
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        n = 0
        for plane in prefetch_map(load_fn, paths, num_workers=workers,
                                  prefetch=2 * workers):
            n += plane.shape[0] >> 31  # touch without holding memory
        best = min(best, time.perf_counter() - t0)
    return mp / best


def main():
    print("host cores:", os.cpu_count(), flush=True)
    rng = np.random.default_rng(0)
    d = tempfile.mkdtemp(prefix="pcis_decode_bench_")
    tiffs, h5s = [], []
    for i in range(N_FILES):
        arr = rng.integers(0, 5, (SIZE, SIZE), dtype=np.uint8)
        tp = os.path.join(d, f"p{i}.tif")
        hp = os.path.join(d, f"p{i}.h5")
        write_tiff(tp, arr)
        save_h5_plane(hp, arr)
        tiffs.append(tp)
        h5s.append(hp)
    print(f"{N_FILES} files of {SIZE}^2 uint8 each, decode-only MP/s:")
    print(f"{'threads':>8} {'tiff':>8} {'hdf5':>8}")
    for w in (1, 2, 4, 8):
        t_mps = bench(read_tiff_stack, tiffs, w)
        h_mps = bench(load_h5_plane, h5s, w)
        print(f"{w:>8} {t_mps:>8.1f} {h_mps:>8.1f}", flush=True)
    import shutil

    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
