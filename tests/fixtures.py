"""Synthetic label-plane generators for parity tests.

Planes mimic the Ilastik label maps the reference consumes
(tiff_analysis.py module docstring): small-int class ids where strains get
1..n, Particle n+1, Background n+2.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def paint_disk(arr: np.ndarray, cy: int, cx: int, r: int, value: int) -> None:
    H, W = arr.shape
    y0, y1 = max(0, cy - r), min(H, cy + r + 1)
    x0, x1 = max(0, cx - r), min(W, cx + r + 1)
    yy, xx = np.mgrid[y0:y1, x0:x1]
    m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    arr[y0:y1, x0:x1][m] = value


def synthetic_label_plane(
    shape=(192, 192),
    cell_types: Dict[int, str] | None = None,
    seed: int = 0,
    n_particles: int = 2,
    n_cells_per_strain: int = 14,
    n_clusters_per_strain: int = 2,
) -> np.ndarray:
    """Random plane with particles, single cells, and clusters.

    Background fills everything else. Cells are painted near particles so the
    particle-fill path has work to do.
    """
    if cell_types is None:
        cell_types = {1: "3D05", 2: "Particle", 3: "Background"}
    strain_vals = [v for v, n in cell_types.items() if n not in ("Particle", "Background")]
    particle_val = [v for v, n in cell_types.items() if n == "Particle"][0]
    background_val = [v for v, n in cell_types.items() if n == "Background"][0]

    rng = np.random.default_rng(seed)
    H, W = shape
    arr = np.full(shape, background_val, dtype=np.uint8)
    centers = []
    for _ in range(n_particles):
        cy, cx = rng.integers(H // 4, 3 * H // 4), rng.integers(W // 4, 3 * W // 4)
        paint_disk(arr, int(cy), int(cx), int(rng.integers(18, 30)), particle_val)
        centers.append((int(cy), int(cx)))
    for v in strain_vals:
        for _ in range(n_cells_per_strain):
            base = centers[rng.integers(0, len(centers))]
            cy = int(np.clip(base[0] + rng.integers(-60, 60), 2, H - 3))
            cx = int(np.clip(base[1] + rng.integers(-60, 60), 2, W - 3))
            paint_disk(arr, cy, cx, int(rng.integers(2, 4)), v)
        for _ in range(n_clusters_per_strain):
            cy = int(rng.integers(12, H - 12))
            cx = int(rng.integers(12, W - 12))
            paint_disk(arr, cy, cx, int(rng.integers(9, 13)), v)
    return arr


def random_class_plane(shape=(96, 96), n_classes: int = 5, seed: int = 0) -> np.ndarray:
    """Speckle plane: random class per pixel then a light smoothing pass, to
    stress CCL/median with many tiny regions."""
    rng = np.random.default_rng(seed)
    arr = rng.integers(1, n_classes + 1, size=shape).astype(np.uint8)
    return arr


def random_binary(shape=(128, 128), p: float = 0.3, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.random(shape) < p
