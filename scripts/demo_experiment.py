"""End-to-end synthetic experiment demo.

Builds a reference-shaped experiment tree (multi-channel Ilastik-style .h5
label maps for a 6B07+C3M10 three-channel acquisition plus a single-channel
3D05 one), runs the full analyze pipeline through the CLI surface, and
prints the produced CSVs — a self-contained smoke of BASELINE configs #1/#2
semantics on any backend.

    JAX_PLATFORMS=cpu python scripts/demo_experiment.py [--size 256] [--keep]
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--keep", action="store_true", help="keep the temp tree")
    args = ap.parse_args()

    from fixtures import synthetic_label_plane

    from particle_col_image_segmentation_tpu.cli import main as cli_main
    from particle_col_image_segmentation_tpu.io.hdf5 import save_h5_plane

    root = tempfile.mkdtemp(prefix="pcis_demo_")
    n = args.size

    # single-channel 3D05 folder (process_single_h5_file path)
    f1 = os.path.join(root, "3D05", "24h", "Tp_3D05_1_24h_60X_15")
    os.makedirs(f1)
    img = synthetic_label_plane(
        seed=1, cell_types={1: "3D05", 2: "Particle", 3: "Background"},
        shape=(n, n),
    )
    save_h5_plane(os.path.join(f1, "Tp_3D05_1_24h_60X_15_labels.h5"), img[None])

    # three-channel 6B07+C3M10 folder (multi-channel fusion path:
    # RFP = particle/background only, DAPI = 6B07, GFP = C3M10)
    f2 = os.path.join(root, "6B07_C3M10", "48h", "Tp_2_48h_60X_3")
    os.makedirs(f2)
    rfp = synthetic_label_plane(
        seed=2, cell_types={1: "Particle", 2: "Background"}, shape=(n, n)
    )
    dapi = synthetic_label_plane(
        seed=3, cell_types={1: "6B07", 2: "Particle", 3: "Background"},
        shape=(n, n),
    )
    gfp = synthetic_label_plane(
        seed=4, cell_types={1: "C3M10", 2: "Particle", 3: "Background"},
        shape=(n, n),
    )
    for name, arr in (
        ("Tp_2_48h_60X_3_RFP_labels.h5", rfp),
        ("Tp_2_48h_60X_3_DAPI_labels.h5", dapi),
        ("Tp_2_48h_60X_3_GFP_labels.h5", gfp),
    ):
        save_h5_plane(os.path.join(f2, name), arr[None])

    t0 = time.perf_counter()
    rc = cli_main(["analyze", root, "--no-figures"])
    dt = time.perf_counter() - t0
    assert rc == 0

    print(f"\nanalyze over 2 folders / 4 planes ({n}²): {dt:.1f} s\n")
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith(".csv"):
                path = os.path.join(dirpath, f)
                rel = os.path.relpath(path, root)
                lines = open(path).read().strip().splitlines()
                print(f"── {rel} ({len(lines) - 1} rows)")
                for line in lines[:4]:
                    print("   ", line)
    if args.keep:
        print("\ntree kept at", root)
    else:
        shutil.rmtree(root)


if __name__ == "__main__":
    main()
