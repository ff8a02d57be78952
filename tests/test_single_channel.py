"""End-to-end parity: device single-channel analysis vs the CPU oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from particle_col_image_segmentation_tpu.config import AnalysisConfig
from particle_col_image_segmentation_tpu.labels.analysis import dapi_dedup_device
from particle_col_image_segmentation_tpu.models import analyze_plane
from particle_col_image_segmentation_tpu.oracle import reference_pipeline as rp

from fixtures import synthetic_label_plane

CFG = AnalysisConfig(max_regions=4096)

SINGLE = {1: "3D05", 2: "Particle", 3: "Background"}
TWO = {1: "3D05", 2: "C3M10", 3: "Particle", 4: "Background"}


@pytest.mark.parametrize("cell_types", [SINGLE, TWO], ids=["1strain", "2strain"])
@pytest.mark.parametrize("seed", [0, 3])
def test_positions_clusters_parity(cell_types, seed):
    from parity import assert_plane_parity

    img = synthetic_label_plane(seed=seed, cell_types=cell_types, shape=(192, 192))
    assert_plane_parity(img, cell_types, CFG)


def test_merged_rejects_mergeless_device_out():
    """Passing a compute_merge=False device result into a merged=True
    analysis must error, not silently return empty merge groups."""
    from particle_col_image_segmentation_tpu.labels.analysis import (
        analyze_plane_device,
    )

    img = synthetic_label_plane(seed=5, cell_types=SINGLE, shape=(96, 96))
    ct = tuple(sorted(SINGLE.items()))
    out = analyze_plane_device(
        jnp.asarray(img), ct, CFG, compute_merge=False
    )
    with pytest.raises(ValueError, match="compute_merge"):
        analyze_plane(img, SINGLE, CFG, merged=True, device_out=out)
    # and the matched pairing still works
    res = analyze_plane(img, SINGLE, CFG, merged=False, device_out=out)
    assert res.merged_clusters == {}


def test_dapi_dedup_parity():
    dapi = synthetic_label_plane(
        seed=8, cell_types={1: "6B07", 2: "Particle", 3: "Background"}, shape=(160, 160)
    )
    other = synthetic_label_plane(
        seed=9, cell_types={1: "C3M10", 2: "Particle", 3: "Background"}, shape=(160, 160)
    )
    ours_dev, conv = dapi_dedup_device(jnp.asarray(dapi), jnp.asarray(other), CFG)
    assert bool(conv)
    ours = np.asarray(ours_dev)
    ref = rp.combine_cell_positions_and_clusters(dapi, other, CFG)
    np.testing.assert_array_equal(ours, ref)


def test_overflow_detection():
    rng = np.random.default_rng(0)
    img = rng.integers(1, 6, size=(64, 64)).astype(np.uint8)
    small = AnalysisConfig(max_regions=8)
    with pytest.raises(ValueError, match="max_regions"):
        analyze_plane(img, {1: "3D05", 4: "Particle", 5: "Background",
                            2: "6B07", 3: "C3M10"}, small)
