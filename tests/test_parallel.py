"""Mesh sharding tests on the 8-virtual-CPU-device backend.

Validates that the batch+spatially sharded segmentation step (halo exchange,
distributed CCL, psum reductions) reproduces the single-device results
exactly (SURVEY.md §4: multi-device tests without a cluster).
"""

import numpy as np
import pytest
from scipy import ndimage as ndi

import jax

from particle_col_image_segmentation_tpu.config import AnalysisConfig
from particle_col_image_segmentation_tpu.oracle import ndimage as ond
from particle_col_image_segmentation_tpu.oracle import reference_pipeline as rp
from particle_col_image_segmentation_tpu.parallel import (
    make_mesh,
    sharded_segment_batch,
)

from fixtures import synthetic_label_plane

CFG = AnalysisConfig(max_regions=4096)


def _compact(labels):
    """Map global-root labels to compact ids in raster-first order."""
    flat = np.asarray(labels).ravel()
    uniq, first = np.unique(flat, return_index=True)
    order = np.argsort(first, kind="stable")
    remap = {int(uniq[o]): k + 1 for k, o in enumerate(order)}
    return np.vectorize(remap.get)(flat).reshape(labels.shape)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("n_data,n_space", [(4, 2), (2, 4), (8, 1)])
def test_sharded_matches_oracle(n_data, n_space):
    mesh = make_mesh(n_data=n_data, n_space=n_space)
    B, H, W = n_data * 2, 64, 64
    batch = np.stack(
        [synthetic_label_plane(seed=s, shape=(H, W)) for s in range(B)]
    )
    den, labels, particle_px, n_comp, filled, overlap_px, conv = sharded_segment_batch(
        batch, mesh, CFG, particle_val=2
    )
    den = np.asarray(den)
    labels = np.asarray(labels)
    filled = np.asarray(filled)
    for b in range(B):
        ref_den = ndi.median_filter(batch[b], size=5)
        np.testing.assert_array_equal(den[b], ref_den)
        ref_lab, ref_n = ond.label(ref_den, background=-1, return_num=True)
        assert int(n_comp[b]) == ref_n
        np.testing.assert_array_equal(_compact(labels[b]), ref_lab)
        assert int(particle_px[b]) == int(np.sum(ref_den == 2))
        # particle fill parity (reference fill_particle_area semantics)
        ref_filled, ref_area = rp.recreate_particle_area(
            ref_den.copy(), {1: "3D05", 2: "Particle", 3: "Background"},
            int(np.sum(ref_den == 2)), CFG,
        )
        np.testing.assert_array_equal(filled[b], ref_filled)
        assert int(particle_px[b]) + int(overlap_px[b]) == ref_area


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_cross_boundary_component():
    """A single component spanning every shard boundary must get one label."""
    mesh = make_mesh(n_data=2, n_space=4)
    B, H, W = 4, 64, 64
    batch = np.full((B, H, W), 3, np.uint8)
    batch[:, :, 30:34] = 1  # vertical stripe through all 4 row-shards
    _, labels, _, n_comp, _, _, _ = sharded_segment_batch(batch, mesh, CFG, particle_val=2)
    labels = np.asarray(labels)
    for b in range(B):
        stripe = labels[b][:, 30:34]
        assert len(np.unique(stripe)) == 1
        # full-height stripe splits the background → stripe + 2 bg halves
        assert int(n_comp[b]) == 3


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("n_data,n_space", [(2, 4), (4, 2)])
def test_sharded_tables_match_fused(n_data, n_space):
    """with_tables: global compact ids + psum'd region tables must equal the
    single-device fused pass exactly."""
    import jax.numpy as jnp

    from particle_col_image_segmentation_tpu.models.batch import (
        fused_segment_batch,
    )
    from particle_col_image_segmentation_tpu.parallel.sharded import (
        make_sharded_segment_fn,
    )

    mesh = make_mesh(n_data=n_data, n_space=n_space)
    B, H, W = n_data * 2, 64, 64
    batch = np.stack(
        [synthetic_label_plane(seed=100 + s, shape=(H, W)) for s in range(B)]
    )
    fn = make_sharded_segment_fn(mesh, CFG, particle_val=2, with_tables=True)
    (den, labels, particle_px, n_comp, filled, overlap_px, conv,
     seg, area, class_id) = fn(jnp.asarray(batch))
    assert bool(np.all(np.asarray(conv)))

    ref = fused_segment_batch(jnp.asarray(batch), CFG)
    rseg, rnum, rarea, rclass, rpart, _, _, rconv = ref
    assert bool(np.all(np.asarray(rconv)))
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(rseg))
    np.testing.assert_array_equal(np.asarray(n_comp), np.asarray(rnum))
    np.testing.assert_array_equal(np.asarray(area), np.asarray(rarea))
    valid = np.asarray(rarea) > 0
    np.testing.assert_array_equal(
        np.asarray(class_id)[valid], np.asarray(rclass)[valid]
    )
    np.testing.assert_array_equal(np.asarray(particle_px), np.asarray(rpart))
