"""Soak-level randomized parity sweep: full single-channel analysis
(device graph) vs the CPU oracle over many seeds/shapes/strain sets.

The pytest fuzz (tests/test_metrics_fuzz.py) covers the kernel family with
a handful of seeds per op; this script drives the WHOLE analyze_plane graph
— denoise, CCL, tables, area partition, proximity merge, particle fill —
against oracle/reference_pipeline for hundreds of seeds, as a background
validation of the parity claims.  Any mismatch prints the failing seed and
exits 1 (reproduce with the pytest-style asserts below).

Usage:  JAX_PLATFORMS=cpu python scripts/soak_fuzz.py [n_seeds]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_pcis")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

import jax

# the axon sitecustomize overrides jax_platforms in every interpreter; the
# env var alone cannot win (cf. tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import numpy as np

from particle_col_image_segmentation_tpu.config import AnalysisConfig
from fixtures import synthetic_label_plane

STRAIN_SETS = [
    {1: "3D05", 2: "Particle", 3: "Background"},
    {1: "6B07", 2: "Particle", 3: "Background"},
    {1: "3D05", 2: "C3M10", 3: "Particle", 4: "Background"},
    {1: "3D05", 2: "6B07", 3: "C3M10", 4: "Particle", 5: "Background"},
]
SHAPES = [(96, 96), (128, 192), (192, 192), (160, 224)]


def check_seed(seed: int) -> None:
    from parity import assert_plane_parity

    rng = np.random.default_rng(seed)
    cell_types = STRAIN_SETS[int(rng.integers(len(STRAIN_SETS)))]
    shape = SHAPES[int(rng.integers(len(SHAPES)))]
    cfg = AnalysisConfig(max_regions=4096)
    img = synthetic_label_plane(seed=seed, cell_types=cell_types, shape=shape)
    assert_plane_parity(img, cell_types, cfg)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    for seed in range(n):
        try:
            check_seed(seed)
        except Exception:
            print(f"FAIL at seed {seed}", flush=True)
            raise
        if seed % 20 == 19:
            print(f"{seed + 1}/{n} ok", flush=True)
    print(f"all {n} seeds ok")


if __name__ == "__main__":
    main()
