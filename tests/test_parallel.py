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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("n_data,n_space", [(2, 4), (4, 2)])
def test_sharded_merge_matches_single_chip(n_data, n_space):
    """Distributed proximity-merge grouping (VERDICT r1 #1): g_ctx roots must
    equal the single-chip _stage_merge exactly."""
    import jax.numpy as jnp

    from particle_col_image_segmentation_tpu.labels.analysis import (
        analyze_plane_device,
    )
    from particle_col_image_segmentation_tpu.parallel.sharded import (
        make_sharded_analysis_fn,
    )

    mesh = make_mesh(n_data=n_data, n_space=n_space)
    B, H, W = n_data * 2, 64, 64
    batch = np.stack(
        [synthetic_label_plane(seed=200 + s, shape=(H, W)) for s in range(B)]
    )
    fn = make_sharded_analysis_fn(mesh, CFG, particle_val=2, cell_vals=(1,))
    *_, conv, seg, area, class_id, g_ctx = fn(jnp.asarray(batch))
    assert bool(np.all(np.asarray(conv)))

    cell_types = ((1, "3D05"), (2, "Particle"), (3, "Background"))
    for b in range(B):
        ref = analyze_plane_device(
            jnp.asarray(batch[b]), cell_types, CFG, compute_merge=True
        )
        assert bool(np.asarray(ref.converged))
        np.testing.assert_array_equal(np.asarray(seg[b]), np.asarray(ref.seg))
        np.testing.assert_array_equal(
            np.asarray(g_ctx[b]), np.asarray(ref.g_ctx)
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pad_with_halo_zero_and_bad_mode():
    """halo == 0 must no-op (reachable via --cell-cluster-distance-threshold
    1 → merge disk radius 0); an unknown edge_mode must raise instead of
    silently zero-filling plane edges."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from particle_col_image_segmentation_tpu.parallel.halo import pad_with_halo
    from particle_col_image_segmentation_tpu.parallel.mesh import SPACE_AXIS

    mesh = make_mesh(n_data=1, n_space=8)
    x = np.arange(64 * 16, dtype=np.int32).reshape(64, 16)

    def f(xs):
        return pad_with_halo(xs, 0, edge_mode="constant")

    out = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=P(SPACE_AXIS, None),
        out_specs=P(SPACE_AXIS, None),
    ))(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(out), x)
    with pytest.raises(ValueError, match="edge_mode"):
        pad_with_halo(jnp.zeros((8, 8)), 1, edge_mode="reflect")


def test_make_mesh_rejects_degenerate_shapes():
    """Empty / oversubscribed meshes and silent remainder drops raise;
    an explicit subset stays legal (used by the DP-only tests)."""
    with pytest.raises(ValueError):
        make_mesh(n_space=16)  # 8 devices: derived n_data = 0
    with pytest.raises(ValueError):
        make_mesh(n_space=3)  # derived 2x3 would silently drop 2 devices
    with pytest.raises(ValueError):
        make_mesh(n_data=4, n_space=4)  # oversubscribed
    assert make_mesh(n_data=4, n_space=1).devices.size == 4  # explicit subset


def test_sharded_dapi_dedup_matches_single_chip():
    import jax.numpy as jnp

    from particle_col_image_segmentation_tpu.labels.analysis import (
        dapi_dedup_device,
    )
    from particle_col_image_segmentation_tpu.parallel.sharded import (
        make_sharded_dapi_dedup_fn,
    )

    mesh = make_mesh(n_data=2, n_space=4)
    B, H, W = 4, 64, 64
    rng = np.random.default_rng(7)
    dapi = np.stack(
        [synthetic_label_plane(seed=300 + s, shape=(H, W)) for s in range(B)]
    )
    dapi = np.where(dapi == 1, 1, np.where(dapi == 2, 3, 2)).astype(np.uint8)
    other = np.stack(
        [synthetic_label_plane(seed=400 + s, shape=(H, W)) for s in range(B)]
    ).astype(np.uint8)
    del rng

    fn = make_sharded_dapi_dedup_fn(mesh, CFG)
    out, num, conv = fn(jnp.asarray(dapi), jnp.asarray(other))
    assert bool(np.all(np.asarray(conv)))
    num = np.asarray(num)
    assert num.shape == (B,) and (num > 0).all()
    assert (num <= CFG.max_regions).all()  # verdict-validity contract
    changed_any = False
    for b in range(B):
        ref, rconv = dapi_dedup_device(
            jnp.asarray(dapi[b]), jnp.asarray(other[b]), CFG
        )
        assert bool(np.asarray(rconv))
        np.testing.assert_array_equal(np.asarray(out[b]), np.asarray(ref))
        changed_any |= not np.array_equal(np.asarray(ref), dapi[b])
    assert changed_any  # the fixture must actually exercise removals


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("n_data,n_space", [(2, 4), (8, 1)])
def test_sharded_watershed_matches_single_chip(n_data, n_space):
    """Distributed two-phase watershed must be bit-identical to the
    single-chip kernel (unique fixpoint ⇒ schedule independence covers the
    halo-exchange schedule too)."""
    import jax.numpy as jnp
    from scipy import ndimage as ndi

    from particle_col_image_segmentation_tpu.ops import watershed
    from particle_col_image_segmentation_tpu.parallel.sharded import (
        make_sharded_watershed_fn,
    )

    mesh = make_mesh(n_data=n_data, n_space=n_space)
    B, n = n_data * 2, 64
    yy, xx = np.mgrid[:n, :n]
    imgs, marks, masks = [], [], []
    for b in range(B):
        rng = np.random.default_rng(50 + b)
        m = np.zeros((n, n), bool)
        for _ in range(3):
            cy, cx = rng.integers(15, n - 15, 2)
            r2 = int(rng.integers(40, 120))
            m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r2
            m |= (yy - cy) ** 2 + (xx - cx - int(1.2 * np.sqrt(r2))) ** 2 <= r2
        dist = ndi.distance_transform_edt(m)
        prob = (1.0 - dist / max(1.0, dist.max())).astype(np.float32)
        binary = prob < 0.5
        odist = ndi.distance_transform_edt(binary)
        omark = ond.label(ond.local_maxima(odist).astype(np.uint8))
        imgs.append(prob)
        marks.append(omark.astype(np.int32))
        masks.append(binary)
    imgs, marks, masks = map(np.stack, (imgs, marks, masks))

    fn = make_sharded_watershed_fn(mesh)
    out, conv = fn(jnp.asarray(imgs), jnp.asarray(marks), jnp.asarray(masks))
    assert bool(np.all(np.asarray(conv)))
    for b in range(B):
        ref = watershed(
            jnp.asarray(imgs[b]), jnp.asarray(marks[b]), jnp.asarray(masks[b])
        )
        np.testing.assert_array_equal(np.asarray(out[b]), np.asarray(ref))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("n_data,n_space", [(2, 4), (1, 8)])
def test_sharded_refine_matches_single_chip(n_data, n_space):
    """The FULL sharded refine pipeline (EDT → maxima → CCL → markers →
    watershed on the mesh) must be bit-identical per plane to
    refine_plane_device."""
    import jax.numpy as jnp
    from scipy import ndimage as ndi

    from particle_col_image_segmentation_tpu.config import RefineConfig
    from particle_col_image_segmentation_tpu.models.refine import (
        refine_plane_device,
    )
    from particle_col_image_segmentation_tpu.parallel.sharded import (
        make_sharded_refine_fn,
    )

    mesh = make_mesh(n_data=n_data, n_space=n_space)
    B, H, W = (2 if n_data == 2 else 1), 64, 128
    planes = []
    for b in range(B):
        rng = np.random.default_rng(70 + b)
        m = np.zeros((H, W), bool)
        yy, xx = np.mgrid[:H, :W]
        for _ in range(4):
            cy, cx = rng.integers(10, H - 10), rng.integers(10, W - 10)
            r2 = int(rng.integers(30, 90))
            m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r2
            m |= (yy - cy) ** 2 + (xx - cx - int(1.4 * np.sqrt(r2))) ** 2 <= r2
        dist = ndi.distance_transform_edt(m)
        planes.append((1.0 - dist / max(1.0, dist.max())).astype(np.float32))
    probs = np.stack(planes)

    fn = make_sharded_refine_fn(mesh, max_regions=1024)
    labels, markers, num, conv = fn(jnp.asarray(probs))
    assert bool(np.asarray(conv).all())
    cfg = RefineConfig()
    for b in range(B):
        ref_l, ref_m, ref_n, *_ , ref_c = refine_plane_device(
            jnp.asarray(probs[b]), cfg, 1024
        )
        assert bool(np.asarray(ref_c))
        assert int(np.asarray(num)[b]) == int(ref_n)
        np.testing.assert_array_equal(
            np.asarray(markers)[b], np.asarray(ref_m)
        )
        np.testing.assert_array_equal(
            np.asarray(labels)[b], np.asarray(ref_l)
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow  # ~41 s CPU compile; fast-lane sharded-refine parity:
# test_sharded_refine_matches_single_chip + test_cli_refine_space_parallel
def test_refine_boundaries_sharded_matches_stack(tmp_path):
    """The user-reachable sharded refine (models.refine.refine_boundaries_
    sharded + CLI --space-parallel) must reproduce refine_boundaries_stack
    exactly: same labels/areas/centroids/NN distances, byte-identical CSV."""
    import jax.numpy as jnp  # noqa: F401
    from scipy import ndimage as ndi

    from particle_col_image_segmentation_tpu.config import RefineConfig
    from particle_col_image_segmentation_tpu.models.refine import (
        refine_boundaries,
        refine_boundaries_sharded,
        refine_boundaries_stack,
        write_refine_stack_csv,
    )

    H, W, Z = 64, 128, 3  # Z=3 pads to 4 on the data axis
    planes = []
    for b in range(Z):
        rng = np.random.default_rng(120 + b)
        m = np.zeros((H, W), bool)
        yy, xx = np.mgrid[:H, :W]
        for _ in range(4):
            cy, cx = rng.integers(10, H - 10), rng.integers(10, W - 10)
            r2 = int(rng.integers(30, 90))
            m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r2
            m |= (yy - cy) ** 2 + (xx - cx - int(1.4 * np.sqrt(r2))) ** 2 <= r2
        dist = ndi.distance_transform_edt(m)
        planes.append((1.0 - dist / max(1.0, dist.max())).astype(np.float32))
    probs = np.stack(planes)

    cfg = RefineConfig()
    mesh = make_mesh(n_data=4, n_space=2)
    got = refine_boundaries_sharded(
        probs, cfg, max_regions=1024, mesh=mesh, stack=True
    )
    ref = refine_boundaries_stack(probs, cfg, max_regions=1024)
    assert len(got) == len(ref) == Z
    for g, r in zip(got, ref):
        assert g.num_cells == r.num_cells
        np.testing.assert_array_equal(g.labels, r.labels)
        np.testing.assert_array_equal(g.areas, r.areas)
        np.testing.assert_array_equal(g.centroids, r.centroids)
        np.testing.assert_allclose(g.nn_distances, r.nn_distances, rtol=1e-6)
    a, b = tmp_path / "sharded.csv", tmp_path / "single.csv"
    write_refine_stack_csv(got, str(a))
    write_refine_stack_csv(ref, str(b))
    assert a.read_bytes() == b.read_bytes()

    # single-plane input (the too-big-for-one-chip shape): 1-element list
    # matching refine_boundaries
    one = refine_boundaries_sharded(
        probs[0], cfg, max_regions=1024,
        mesh=make_mesh(n_data=1, n_space=8),
    )
    r1 = refine_boundaries(probs[0], cfg, max_regions=1024)
    assert len(one) == 1 and one[0].num_cells == r1.num_cells
    np.testing.assert_array_equal(one[0].labels, r1.labels)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_cli_refine_space_parallel(tmp_path):
    """CLI refine --space-parallel: sharded single-plane refine end-to-end,
    CSV byte-identical to the single-device CLI run."""
    import h5py
    from scipy import ndimage as ndi

    from particle_col_image_segmentation_tpu.cli import main

    H = W = 64
    rng = np.random.default_rng(7)
    m = np.zeros((H, W), bool)
    yy, xx = np.mgrid[:H, :W]
    for _ in range(4):
        cy, cx = rng.integers(10, H - 10, 2)
        r2 = int(rng.integers(30, 90))
        m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r2
    dist = ndi.distance_transform_edt(m)
    prob = (1.0 - dist / max(1.0, dist.max())).astype(np.float32)
    h5 = tmp_path / "probs.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("exported_data", data=prob[None])  # [C=1, H, W]
    single_csv = tmp_path / "single.csv"
    sharded_csv = tmp_path / "sharded.csv"
    rc = main(["refine", str(h5), "--channel", "0",
               "--csv", str(single_csv)])
    assert rc == 0
    rc = main(["refine", str(h5), "--channel", "0",
               "--csv", str(sharded_csv), "--space-parallel", "2"])
    assert rc == 0
    assert single_csv.read_bytes() == sharded_csv.read_bytes()
    assert len(single_csv.read_bytes().splitlines()) > 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_cli_refine_data_parallel_only(tmp_path):
    """`refine --data-parallel N` WITHOUT --space-parallel must activate
    the mesh (planes split across devices, rows whole) — it used to be
    silently ignored — and write the same CSV as the single-device stack
    run."""
    import h5py
    from scipy import ndimage as ndi

    from particle_col_image_segmentation_tpu.cli import main

    H, W, Z = 64, 64, 2
    planes = []
    for z in range(Z):
        rng = np.random.default_rng(30 + z)
        m = np.zeros((H, W), bool)
        yy, xx = np.mgrid[:H, :W]
        for _ in range(3):
            cy, cx = rng.integers(10, H - 10, 2)
            m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= int(rng.integers(30, 90))
        dist = ndi.distance_transform_edt(m)
        planes.append((1.0 - dist / max(1.0, dist.max())).astype(np.float32))
    h5 = tmp_path / "stack.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("exported_data", data=np.stack(planes))
    single_csv, dp_csv = tmp_path / "s.csv", tmp_path / "dp.csv"
    assert main(["refine", str(h5), "--stack", "--csv", str(single_csv)]) == 0
    assert main(["refine", str(h5), "--stack", "--csv", str(dp_csv),
                 "--data-parallel", "2"]) == 0
    assert single_csv.read_bytes() == dp_csv.read_bytes()
    assert len(single_csv.read_bytes().splitlines()) > 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_analyze_plane_mesh_requires_single_data_axis():
    """A reused batch mesh (n_data > 1) must fail analyze with a clear
    message, not an opaque shard_map divisibility error."""
    from particle_col_image_segmentation_tpu.models.single_channel import (
        analyze_plane,
    )

    img = synthetic_label_plane(seed=9, shape=(64, 64))
    ct = {1: "3D05", 2: "Particle", 3: "Background"}
    with pytest.raises(ValueError, match="data axis must be 1"):
        analyze_plane(img, ct, CFG, mesh=make_mesh(n_data=2, n_space=4))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_space_mesh_honors_sharded_budget():
    """AnalysisConfig.sharded_max_iters must reach the distributed
    fixpoints (it used to be a hardcoded 128): a starved budget flags
    non-convergence instead of silently using the default."""
    import jax.numpy as jnp

    from particle_col_image_segmentation_tpu.models.batch import (
        make_space_sharded_segment_fn,
    )

    batch = np.stack([synthetic_label_plane(seed=3, shape=(64, 64))])
    mesh = make_mesh(n_data=1, n_space=8)
    starved = AnalysisConfig(max_regions=4096, sharded_max_iters=1)
    out = make_space_sharded_segment_fn(mesh, starved)(jnp.asarray(batch))
    assert not bool(np.asarray(out[-1]).all())
    ok = make_space_sharded_segment_fn(mesh, AnalysisConfig(max_regions=4096))(
        jnp.asarray(batch)
    )
    assert bool(np.asarray(ok[-1]).all())


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_refine_full_scale_512():
    """Sharded refine at realistic scale: 512² touching-particle relief on
    a 1×8 mesh — halo traffic, plateau spans, and rank distances are
    qualitatively different from the 64×128 unit fixture."""
    import jax.numpy as jnp
    from scipy import ndimage as ndi

    from particle_col_image_segmentation_tpu.config import RefineConfig
    from particle_col_image_segmentation_tpu.models.refine import (
        refine_plane_device,
    )
    from particle_col_image_segmentation_tpu.parallel.sharded import (
        make_sharded_refine_fn,
    )

    mesh = make_mesh(n_data=1, n_space=8)
    n = 512
    rng = np.random.default_rng(0)
    m = np.zeros((n, n), bool)
    yy, xx = np.mgrid[:n, :n]
    for _ in range(30):
        cy, cx = rng.integers(40, n - 40, 2)
        r2 = int(rng.integers(150, 400))
        m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r2
        m |= (yy - cy) ** 2 + (xx - cx - int(1.5 * np.sqrt(r2))) ** 2 <= r2
    dist = ndi.distance_transform_edt(m)
    prob = (1.0 - dist / max(1.0, dist.max())).astype(np.float32)

    fn = make_sharded_refine_fn(mesh, max_regions=4096)
    labels, markers, num, conv = fn(jnp.asarray(prob[None]))
    assert bool(np.asarray(conv).all())
    ref_l, ref_m, ref_n, *_, ref_c = refine_plane_device(
        jnp.asarray(prob), RefineConfig(), 4096
    )
    assert bool(np.asarray(ref_c)) and int(np.asarray(num)[0]) == int(ref_n)
    np.testing.assert_array_equal(np.asarray(labels)[0], np.asarray(ref_l))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_refine_tunnel_basins_512():
    """``refine --space-parallel --tunnel-basins`` (VERDICT r3 #3): the
    tunneled watershed composes with the mesh as data parallelism — a
    512² quantized touching-particle stack refined through
    refine_boundaries_sharded(tunnel_basins=True) must be bit-identical
    per plane to the single-chip tunneled graph."""
    import jax.numpy as jnp
    from scipy import ndimage as ndi

    from particle_col_image_segmentation_tpu.config import RefineConfig
    from particle_col_image_segmentation_tpu.models.refine import (
        refine_boundaries_sharded,
        refine_plane_device,
    )

    n = 512
    rng = np.random.default_rng(5)
    planes = []
    for _ in range(2):
        m = np.zeros((n, n), bool)
        yy, xx = np.mgrid[:n, :n]
        for _ in range(30):
            cy, cx = rng.integers(40, n - 40, 2)
            r2 = int(rng.integers(150, 400))
            m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r2
            m |= (yy - cy) ** 2 + (xx - cx - int(1.5 * np.sqrt(r2))) ** 2 <= r2
        dist = ndi.distance_transform_edt(m)
        prob = (1.0 - dist / max(1.0, dist.max())).astype(np.float32)
        # 16-level quantization: the plateaued Ilastik-export regime the
        # tunneled key exists for
        planes.append((np.round(prob * 15.0) / 15.0).astype(np.float32))
    probs = np.stack(planes)

    cfg = RefineConfig(tunnel_basins=True)
    mesh = make_mesh(n_data=2, n_space=4)
    results = refine_boundaries_sharded(probs, cfg, mesh=mesh, stack=True)
    assert len(results) == 2
    for z in range(2):
        ref_l, _, ref_n, *_, ref_c = refine_plane_device(
            jnp.asarray(probs[z]), cfg, 4096
        )
        assert bool(np.asarray(ref_c))
        assert results[z].num_cells == int(ref_n)
        np.testing.assert_array_equal(results[z].labels, np.asarray(ref_l))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_full_scale_1024():
    """Full-scale sharded run (VERDICT r1 #8): at 1024² the halo counts,
    rank propagation distances, and iteration budgets are qualitatively
    different from the 64² unit fixtures; verify distributed CCL + tables
    parity against the single-device fused pass at realistic scale."""
    import jax.numpy as jnp

    from particle_col_image_segmentation_tpu.models.batch import (
        fused_segment_batch,
    )
    from particle_col_image_segmentation_tpu.parallel.sharded import (
        make_sharded_segment_fn,
    )

    cfg = AnalysisConfig(max_regions=16384, ccl_max_iters=2048)
    mesh = make_mesh(n_data=2, n_space=4)
    H = W = 1024
    batch = np.stack(
        [synthetic_label_plane(seed=s, shape=(H, W), n_cells_per_strain=160,
                               n_clusters_per_strain=24) for s in (11, 12)]
    )
    fn = make_sharded_segment_fn(
        mesh, cfg, particle_val=2, with_tables=True, max_iters=2048
    )
    (den, labels, particle_px, n_comp, filled, overlap_px, conv,
     seg, area, class_id) = fn(jnp.asarray(batch))
    assert bool(np.all(np.asarray(conv)))

    rseg, rnum, rarea, rclass, rpart, _, _, rconv = fused_segment_batch(
        jnp.asarray(batch), cfg
    )
    assert bool(np.all(np.asarray(rconv)))
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(rseg))
    np.testing.assert_array_equal(np.asarray(n_comp), np.asarray(rnum))
    np.testing.assert_array_equal(np.asarray(area), np.asarray(rarea))
    np.testing.assert_array_equal(np.asarray(particle_px), np.asarray(rpart))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_full_scale_2048_reference_plane():
    """THE reference plane size (tiff_analysis.py:734 hard-asserts 2048²),
    sharded 1×8 with the DEFAULT distributed iteration budget
    (make_sharded_segment_fn max_iters=128): the convergence certificates
    must hold and the labels/tables must be bit-identical to the
    single-device fused pass (VERDICT r2 #5)."""
    import jax.numpy as jnp

    from particle_col_image_segmentation_tpu.models.batch import (
        fused_segment_batch,
    )
    from particle_col_image_segmentation_tpu.parallel.sharded import (
        make_sharded_segment_fn,
    )

    cfg = AnalysisConfig(max_regions=16384, ccl_max_iters=4096)
    mesh = make_mesh(n_data=1, n_space=8)
    H = W = 2048
    batch = np.stack(
        [synthetic_label_plane(seed=13, shape=(H, W), n_cells_per_strain=640,
                               n_clusters_per_strain=96)]
    )
    fn = make_sharded_segment_fn(mesh, cfg, particle_val=2, with_tables=True)
    (den, labels, particle_px, n_comp, filled, overlap_px, conv,
     seg, area, class_id) = fn(jnp.asarray(batch))
    assert bool(np.all(np.asarray(conv))), (
        "default max_iters=128 budget tripped at the reference plane size"
    )

    rseg, rnum, rarea, rclass, rpart, _, _, rconv = fused_segment_batch(
        jnp.asarray(batch), cfg
    )
    assert bool(np.all(np.asarray(rconv)))
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(rseg))
    np.testing.assert_array_equal(np.asarray(n_comp), np.asarray(rnum))
    np.testing.assert_array_equal(np.asarray(area), np.asarray(rarea))
    np.testing.assert_array_equal(np.asarray(particle_px), np.asarray(rpart))
