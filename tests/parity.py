"""Shared device-vs-oracle parity assertion for a single analyzed plane.

One canonical check body used by both the unit test
(test_single_channel.py) and the soak sweep (scripts/soak_fuzz.py), so the
two can never drift apart in what they compare.
"""

from __future__ import annotations

import numpy as np

from particle_col_image_segmentation_tpu.models import analyze_plane
from particle_col_image_segmentation_tpu.oracle import reference_pipeline as rp


def assert_regions_equal(ours, ref):
    assert len(ours) == len(ref)
    for a, b in zip(ours, ref):
        assert a.area == b.area
        np.testing.assert_allclose(a.centroid, b.centroid, rtol=0, atol=1e-9)
        assert a.bbox == b.bbox


def assert_plane_parity(img, cell_types, cfg):
    """Run analyze_plane(merged=True) and assert full parity with the
    oracle: denoise, positions/clusters (area+centroid+bbox per region),
    cluster.cells, merged groups (incl. member regions), particle fill,
    and counts/densities."""
    ours = analyze_plane(img, cell_types, cfg, merged=True)

    den = rp.denoise(img, cfg)
    np.testing.assert_array_equal(ours.denoised, den)
    pos, clusters, particle_area, merged = rp.get_cell_positions_and_areas(
        den, cell_types, merged=True, cfg=cfg
    )
    assert ours.particle_area == particle_area
    assert list(ours.cell_pos) == list(pos)
    for k in pos:
        assert_regions_equal(ours.cell_pos[k], pos[k])
        assert_regions_equal(ours.cell_clusters[k], clusters[k])
        assert [c.cells for c in ours.cell_clusters[k]] == [
            c.cells for c in clusters[k]
        ]

    # merged groups, including per-member region stats
    assert list(ours.merged_clusters) == list(merged)
    for k in merged:
        assert len(ours.merged_clusters[k]) == len(merged[k])
        for ga, gb in zip(ours.merged_clusters[k], merged[k]):
            assert ga["area"] == gb["area"]
            np.testing.assert_allclose(ga["centroid"], gb["centroid"], atol=1e-9)
            assert ga["bbox"] == gb["bbox"]
            assert_regions_equal(ga["regions"], gb["regions"])

    # particle fill
    filled_ref, filled_area_ref = rp.recreate_particle_area(
        den.copy(), cell_types, particle_area, cfg
    )
    np.testing.assert_array_equal(ours.filled, filled_ref)
    assert ours.filled_particle_area == filled_area_ref

    # counts/densities through the shared reducer
    ours_cnt = rp.get_cell_counts_and_densities(
        ours.cell_pos, ours.cell_clusters, particle_area, cfg
    )
    ref_cnt = rp.get_cell_counts_and_densities(pos, clusters, particle_area, cfg)
    assert ours_cnt == ref_cnt
    return ours
