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


def _assert_regions_equal(ours, ref):
    assert len(ours) == len(ref)
    for a, b in zip(ours, ref):
        assert a.area == b.area
        np.testing.assert_allclose(a.centroid, b.centroid, rtol=0, atol=1e-9)
        assert a.bbox == b.bbox


@pytest.mark.parametrize("cell_types", [SINGLE, TWO], ids=["1strain", "2strain"])
@pytest.mark.parametrize("seed", [0, 3])
def test_positions_clusters_parity(cell_types, seed):
    img = synthetic_label_plane(seed=seed, cell_types=cell_types, shape=(192, 192))
    ours = analyze_plane(img, cell_types, CFG, merged=True)

    den = rp.denoise(img, CFG)
    np.testing.assert_array_equal(ours.denoised, den)
    pos, clusters, particle_area, merged = rp.get_cell_positions_and_areas(
        den, cell_types, merged=True, cfg=CFG
    )
    assert ours.particle_area == particle_area
    assert list(ours.cell_pos) == list(pos)
    for k in pos:
        _assert_regions_equal(ours.cell_pos[k], pos[k])
        _assert_regions_equal(ours.cell_clusters[k], clusters[k])
        assert [c.cells for c in ours.cell_clusters[k]] == [
            c.cells for c in clusters[k]
        ]

    # merged groups
    assert list(ours.merged_clusters) == list(merged)
    for k in merged:
        assert len(ours.merged_clusters[k]) == len(merged[k])
        for ga, gb in zip(ours.merged_clusters[k], merged[k]):
            assert ga["area"] == gb["area"]
            np.testing.assert_allclose(ga["centroid"], gb["centroid"], atol=1e-9)
            assert ga["bbox"] == gb["bbox"]
            assert len(ga["regions"]) == len(gb["regions"])

    # particle fill
    filled_ref, filled_area_ref = rp.recreate_particle_area(
        den.copy(), cell_types, particle_area, CFG
    )
    np.testing.assert_array_equal(ours.filled, filled_ref)
    assert ours.filled_particle_area == filled_area_ref

    # counts/densities through the shared reducer
    ours_cnt = rp.get_cell_counts_and_densities(
        ours.cell_pos, ours.cell_clusters, particle_area, CFG
    )
    ref_cnt = rp.get_cell_counts_and_densities(pos, clusters, particle_area, CFG)
    assert ours_cnt == ref_cnt


def test_dapi_dedup_parity():
    dapi = synthetic_label_plane(
        seed=8, cell_types={1: "6B07", 2: "Particle", 3: "Background"}, shape=(160, 160)
    )
    other = synthetic_label_plane(
        seed=9, cell_types={1: "C3M10", 2: "Particle", 3: "Background"}, shape=(160, 160)
    )
    ours = np.asarray(dapi_dedup_device(jnp.asarray(dapi), jnp.asarray(other), CFG))
    ref = rp.combine_cell_positions_and_clusters(dapi, other, CFG)
    np.testing.assert_array_equal(ours, ref)


def test_overflow_detection():
    rng = np.random.default_rng(0)
    img = rng.integers(1, 6, size=(64, 64)).astype(np.uint8)
    small = AnalysisConfig(max_regions=8)
    with pytest.raises(ValueError, match="max_regions"):
        analyze_plane(img, {1: "3D05", 4: "Particle", 5: "Background",
                            2: "6B07", 3: "C3M10"}, small)
