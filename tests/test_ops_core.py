"""Parity tests: TPU core ops (median, CCL, regionprops) vs the CPU oracle."""

import numpy as np
import pytest
from scipy import ndimage as ndi

import jax.numpy as jnp

from particle_col_image_segmentation_tpu.ops import (
    compact_labels,
    connected_components,
    label_image,
    median_label_filter,
    region_props,
)
from particle_col_image_segmentation_tpu.oracle import ndimage as ond

from fixtures import random_class_plane, synthetic_label_plane


class TestMedianLabelFilter:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("size", [3, 5])
    def test_matches_scipy_random(self, seed, size):
        img = random_class_plane((64, 64), n_classes=5, seed=seed)
        ours = np.asarray(median_label_filter(jnp.asarray(img), size=size))
        ref = ndi.median_filter(img, size=size)
        np.testing.assert_array_equal(ours, ref)

    def test_matches_scipy_structured(self):
        img = synthetic_label_plane(seed=3)
        ours = np.asarray(median_label_filter(jnp.asarray(img), size=5))
        ref = ndi.median_filter(img, size=5)
        np.testing.assert_array_equal(ours, ref)

    def test_batched(self):
        imgs = np.stack([random_class_plane((32, 32), seed=s) for s in range(3)])
        ours = np.asarray(median_label_filter(jnp.asarray(imgs), size=5))
        for i in range(3):
            np.testing.assert_array_equal(ours[i], ndi.median_filter(imgs[i], size=5))


class TestCCL:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_multiclass_matches_oracle(self, seed):
        img = random_class_plane((48, 48), n_classes=4, seed=seed)
        seg, num = label_image(jnp.asarray(img), background=None, max_regions=48 * 48)
        ref, ref_n = ond.label(img, background=None, return_num=True)
        # background=None in oracle → sentinel below; emulate with background
        # value that never occurs
        ref, ref_n = ond.label(img, background=-1, return_num=True)
        assert int(num) == ref_n
        np.testing.assert_array_equal(np.asarray(seg), ref)

    @pytest.mark.parametrize("seed", [0, 5])
    def test_binary_mask_matches_oracle(self, seed):
        from fixtures import random_binary

        m = random_binary((64, 64), p=0.35, seed=seed).astype(np.uint8)
        seg, num = label_image(jnp.asarray(m), background=0, max_regions=64 * 64)
        ref, ref_n = ond.label(m, background=0, return_num=True)
        assert int(num) == ref_n
        np.testing.assert_array_equal(np.asarray(seg), ref)
        assert np.all(np.asarray(seg)[m == 0] == 0)

    def test_connectivity4(self):
        img = np.array([[1, 0], [0, 1]], np.uint8)
        seg8, n8 = label_image(jnp.asarray(img), background=0, max_regions=8)
        seg4, n4 = label_image(
            jnp.asarray(img), background=0, connectivity=4, max_regions=8
        )
        assert int(n8) == 1 and int(n4) == 2

    def test_worst_case_spiral(self):
        # a long snake: single component winding through the plane
        H = W = 32
        img = np.zeros((H, W), np.uint8)
        for i in range(0, H, 2):
            img[i, :] = 1
            if (i // 2) % 2 == 0 and i + 1 < H:
                img[i + 1, W - 1] = 1
            elif i + 1 < H:
                img[i + 1, 0] = 1
        seg, num = label_image(jnp.asarray(img), background=0, max_regions=H * W)
        ref, ref_n = ond.label(img, background=0, return_num=True)
        assert int(num) == ref_n
        np.testing.assert_array_equal(np.asarray(seg), ref)

    def test_structured_plane(self):
        img = synthetic_label_plane(seed=7)
        seg, num = label_image(jnp.asarray(img), background=-1, max_regions=4096)
        ref, ref_n = ond.label(img, background=-1, return_num=True)
        assert int(num) == ref_n
        np.testing.assert_array_equal(np.asarray(seg), ref)


class TestPallasBandCCL:
    """The Gauss-Seidel band-sweep kernel must produce bit-identical labels
    (exercised in interpreter mode on CPU; the TPU path is bench-covered)."""

    @pytest.mark.parametrize(
        "case", ["structured", "speckle", "binary", "stripe"]
    )
    def test_matches_xla_ccl(self, case):
        from particle_col_image_segmentation_tpu.ops.ccl_tiles import ccl_sweeps

        if case == "structured":
            img, bg = synthetic_label_plane(seed=1, shape=(128, 128)), None
        elif case == "speckle":
            img, bg = random_class_plane((128, 128), 4, seed=2), None
        elif case == "binary":
            img = (random_class_plane((128, 128), 2, seed=3) == 1).astype(np.uint8)
            bg = 0
        else:  # full-height stripe: worst-case vertical propagation
            img = np.full((128, 128), 3, np.uint8)
            img[:, 60:64] = 1
            bg = None
        ref = np.asarray(connected_components(jnp.asarray(img), background=bg))
        got = np.asarray(
            ccl_sweeps(jnp.asarray(img), background=bg, tile=32, interpret=True)
        )
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("connectivity", [4, 8])
    def test_zigzag_staircase(self, connectivity):
        # stresses the scans-only axis propagation (the 1-step axis offsets
        # were dropped from the band local solve as scan-subsumed): a
        # 1-px staircase needs alternating row/column hops every pixel
        from particle_col_image_segmentation_tpu.ops.ccl_tiles import ccl_sweeps

        H = W = 64
        img = np.zeros((H, W), np.uint8)
        r, c = 0, 0
        while r < H - 1 and c < W - 1:
            img[r, c] = 1
            img[r + 1, c] = 1
            img[r + 1, c + 1] = 1
            r, c = r + 1, c + 1
        ref = np.asarray(
            connected_components(jnp.asarray(img), connectivity=connectivity)
        )
        got = np.asarray(
            ccl_sweeps(
                jnp.asarray(img), connectivity=connectivity, tile=16,
                interpret=True,
            )
        )
        np.testing.assert_array_equal(got, ref)

    def test_u8_value_255_not_background(self):
        """Regression: in-plane uint8 value 255 collided with the halo pad
        fill and was remapped to the background sentinel in VMEM — a plain
        0/255 thresholded mask got garbage labels (incl. cross-plane
        leakage through the batch halo).  255 must label like any value."""
        from particle_col_image_segmentation_tpu.ops.ccl_tiles import ccl_sweeps

        rng = np.random.default_rng(7)
        batch = (rng.random((3, 64, 64)) < 0.4).astype(np.uint8) * 255
        batch[0, 0, :] = 255  # 255-component touching the global top pad
        batch[-1, -1, :] = 255  # ...and the global bottom pad
        ref = np.stack([
            np.asarray(connected_components(jnp.asarray(p), background=None,
                                            num_classes=256))
            for p in batch
        ])
        got = np.asarray(
            ccl_sweeps(jnp.asarray(batch), background=None, tile=32,
                       interpret=True)
        )
        np.testing.assert_array_equal(got, ref)
        # background=0 route: int32 internally, 255 foreground
        ref0 = np.stack([
            np.asarray(connected_components(jnp.asarray(p), background=0,
                                            num_classes=256))
            for p in batch
        ])
        got0 = np.asarray(
            ccl_sweeps(jnp.asarray(batch), background=0, tile=32,
                       interpret=True)
        )
        np.testing.assert_array_equal(got0, ref0)


class TestRegionProps:
    def test_matches_oracle(self):
        img = synthetic_label_plane(seed=9)
        seg, num = label_image(jnp.asarray(img), background=-1, max_regions=4096)
        table = region_props(seg, jnp.asarray(img), max_regions=4096)
        ref_regions = ond.regionprops(ond.label(img, background=-1))
        n = int(num)
        assert n == len(ref_regions)
        area = np.asarray(table.area)
        from particle_col_image_segmentation_tpu.ops import centroids_f64, centroids_int

        cy, cx = centroids_f64(table)
        icy, icx = np.asarray(centroids_int(table)[0]), np.asarray(centroids_int(table)[1])
        bbox = np.asarray(table.bbox)
        cls = np.asarray(table.class_id)
        valid = np.asarray(table.valid)
        assert valid[1 : n + 1].all() and not valid[0] and not valid[n + 1 :].any()
        for i, r in enumerate(ref_regions, start=1):
            assert area[i] == r.area
            np.testing.assert_allclose((cy[i], cx[i]), r.centroid, rtol=0, atol=1e-12)
            assert (icy[i], icx[i]) == (int(r.centroid[0]), int(r.centroid[1]))
            assert tuple(bbox[i]) == r.bbox
            y, x = r.coords[0]
            assert cls[i] == img[y, x]

    def test_exact_centroids_large_plane(self):
        # single huge region spanning a 2048² plane: Σrow ≈ 4.4e9 would
        # overflow int32 / lose float32 precision — must stay exact
        import jax.numpy as jnp
        from particle_col_image_segmentation_tpu.ops import centroids_f64, centroids_int

        H = W = 2048
        seg = np.ones((H, W), np.int32)
        img = np.ones((H, W), np.uint8)
        table = region_props(jnp.asarray(seg), jnp.asarray(img), max_regions=2)
        cy, cx = centroids_f64(table)
        assert cy[1] == (H - 1) / 2 and cx[1] == (W - 1) / 2
        icy, icx = centroids_int(table)
        assert int(np.asarray(icy)[1]) == int((H - 1) / 2)


class TestScatterFreeTables:
    """compact_labels_sweeps and region_counts_mxu must match the gather/
    scatter paths bit-exactly (interpret mode on CPU; TPU path bench-covered)."""

    @pytest.mark.parametrize("case", ["structured", "speckle", "background"])
    def test_compact_sweeps_matches_gather(self, case):
        from particle_col_image_segmentation_tpu.ops.ccl import (
            compact_labels,
            compact_labels_sweeps,
            connected_components,
        )

        if case == "structured":
            img, bg = synthetic_label_plane(seed=21, shape=(64, 128)), None
        elif case == "speckle":
            img, bg = random_class_plane((64, 128), 4, seed=22), None
        else:
            img = (random_class_plane((64, 128), 2, seed=23) == 1).astype(np.uint8)
            bg = 0
        raw = connected_components(jnp.asarray(img), background=bg, num_classes=4)
        s0, n0 = compact_labels(raw, 4096)
        s1, n1 = compact_labels_sweeps(raw, 4096, tile=8, interpret=True)
        assert int(n0) == int(n1)
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))

    def test_compact_sweeps_batched(self):
        import jax

        from particle_col_image_segmentation_tpu.ops.ccl import (
            compact_labels,
            compact_labels_sweeps,
            connected_components,
        )

        imgs = np.stack(
            [random_class_plane((64, 128), 3, seed=s) for s in (31, 32)]
        )
        raw = jax.vmap(lambda i: connected_components(i, num_classes=4))(
            jnp.asarray(imgs)
        )
        s0, n0 = jax.vmap(lambda r: compact_labels(r, 4096))(raw)
        s1, n1 = compact_labels_sweeps(raw, 4096, tile=8, interpret=True)
        np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))

    def test_region_counts_mxu_matches_scatter(self):
        from particle_col_image_segmentation_tpu.ops.regionprops import (
            region_counts,
        )
        from particle_col_image_segmentation_tpu.ops.regionprops_tiles import (
            region_counts_mxu,
        )

        rng = np.random.default_rng(5)
        R = 700
        seg = rng.integers(0, R + 9, (64, 256)).astype(np.int32)  # ids > capacity
        cls_of = rng.integers(0, 8, R + 16).astype(np.int32)
        img = cls_of[seg]  # component-homogeneous classes
        a0, c0 = region_counts(jnp.asarray(seg), jnp.asarray(img), R - 1)
        for vb in (None, 7):  # general digit-split AND the narrow fast path
            a1, c1 = region_counts_mxu(
                jnp.asarray(seg), jnp.asarray(img), R - 1,
                rows_per_chunk=8, interpret=True, val_bound=vb,
            )
            np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
            # empty rows differ by design (scatter-max identity vs 0)
            valid = np.asarray(a0) > 0
            np.testing.assert_array_equal(
                np.asarray(c0)[valid], np.asarray(c1)[valid]
            )

    def test_lookup_over_capacity_reads_zero(self):
        """Regression: ids with q >= Qp once matched a LO-digit table row in
        the MXU lookup (returning 128·table[id − Qp·128]), and the XLA
        fallback's gather CLAMPED to the last row.  Both must read 0."""
        from particle_col_image_segmentation_tpu.ops.regionprops_tiles import (
            table_lookup_auto,
            table_lookup_mxu,
        )

        R = 5  # Qp rounds to 16 → kernel capacity 2048
        tab = np.array([9, 8, 3, 7, 250], np.int32)
        seg = np.array(
            [[0, 2, 4, 5, 100, 2047, 2048, 2050, 4096, 5000]] * 8, np.int32
        )
        expect = np.where(seg < R, tab[np.minimum(seg, R - 1)], 0)
        got = np.asarray(
            table_lookup_mxu(jnp.asarray(seg), jnp.asarray(tab),
                             rows_per_chunk=8, interpret=True)
        )
        np.testing.assert_array_equal(got, expect)
        # XLA fallback path (CPU backend in this suite)
        got_auto = np.asarray(table_lookup_auto(jnp.asarray(seg), jnp.asarray(tab)))
        np.testing.assert_array_equal(got_auto, expect)

    def test_lookup_negative_ids_read_zero(self):
        """Regression: a negative id (raw CCL background = -1) matched the
        last HI-digit row in the MXU lookup (q = -1 hit hit_lo at Qp-1),
        and the eager fallback WRAPPED it numpy-style to table[-1].  Both
        paths must read 0 for any id outside [0, len(table))."""
        from particle_col_image_segmentation_tpu.ops.regionprops_tiles import (
            table_lookup_auto,
            table_lookup_mxu,
        )

        tab = np.arange(1, 2049, dtype=np.int32) % 200  # full padded capacity
        seg = np.array([[-1, -5, -2048, 0, 1, 2047, 2048]] * 8, np.int32)
        expect = np.where(
            (seg >= 0) & (seg < tab.size), tab[np.clip(seg, 0, tab.size - 1)], 0
        )
        got = np.asarray(
            table_lookup_mxu(jnp.asarray(seg), jnp.asarray(tab),
                             rows_per_chunk=8, interpret=True)
        )
        np.testing.assert_array_equal(got, expect)
        got_auto = np.asarray(
            table_lookup_auto(jnp.asarray(seg), jnp.asarray(tab))
        )
        np.testing.assert_array_equal(got_auto, expect)

    def test_region_counts_mxu_wide_values(self):
        """Regression: the MXU histogram cast values straight to int8, so an
        8-bit class plane (e.g. value 200) wrapped to -56 while the scatter
        path returned 200.  The digit split must be exact on the documented
        [-16384, 16383] operand range."""
        from particle_col_image_segmentation_tpu.ops.regionprops import (
            region_counts,
        )
        from particle_col_image_segmentation_tpu.ops.regionprops_tiles import (
            region_counts_mxu,
            region_sums_mxu,
        )

        rng = np.random.default_rng(11)
        R = 300
        seg = rng.integers(0, R, (32, 128)).astype(np.int32)
        cls_of = rng.integers(0, 16384, R).astype(np.int32)
        cls_of[:4] = (200, 255, 1000, 16383)  # pin the wrap-prone cases
        img = cls_of[seg]
        a0, c0 = region_counts(jnp.asarray(seg), jnp.asarray(img), R - 1)
        a1, c1 = region_counts_mxu(
            jnp.asarray(seg), jnp.asarray(img), R - 1,
            rows_per_chunk=8, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
        valid = np.asarray(a0) > 0
        np.testing.assert_array_equal(np.asarray(c0)[valid], np.asarray(c1)[valid])
        # signed sums: region_sums_mxu on values spanning the full range
        vals = rng.integers(-16384, 16384, (32, 128)).astype(np.int32)
        area, vsum = region_sums_mxu(
            jnp.asarray(seg), jnp.asarray(vals), R - 1, rows_per_chunk=8,
            interpret=True,
        )
        import jax as _jax

        ref = _jax.ops.segment_sum(
            jnp.asarray(vals.ravel()), jnp.asarray(seg.ravel()), num_segments=R
        )
        np.testing.assert_array_equal(np.asarray(vsum), np.asarray(ref))

    def test_digit_recombination_saturates_not_wraps(self):
        """Regression: the base-128 (hi, lo) digits are int32-exact per
        digit, but 128·Σhi + Σlo can exceed int32 for huge regions × large
        values — the recombination must saturate to ±INT32_MAX detectably,
        never wrap to an arbitrary small number."""
        from particle_col_image_segmentation_tpu.ops.regionprops import (
            HILO_BASE,
        )
        from particle_col_image_segmentation_tpu.ops.regionprops_tiles import (
            _recombine_saturating,
            region_sums_mxu,
        )

        imax, imin = 2**31 - 1, -(2**31)
        # (true_sum, expect) pairs spanning exact, boundary, and overflow
        cases = [
            (0, 0), (12345, 12345), (-99999, -99999),
            (imax, imax), (imin, imin),            # exact boundary values
            (imax + 1, imax), (imin - 1, imin),    # 1 past → saturate
            (7 * 10**9, imax), (-7 * 10**9, imin),  # far past → saturate
        ]
        # decompose each true sum as plausible digit sums (lo ≥ 0, as the
        # kernel produces: lo accumulates img % 128)
        hi = np.array([s // HILO_BASE for s, _ in cases], np.int64)
        lo = np.array([s % HILO_BASE for s, _ in cases], np.int64)
        assert (lo >= 0).all() and (np.abs(hi) < 2**31).all()
        got = np.asarray(_recombine_saturating(
            jnp.asarray(hi, jnp.int32), jnp.asarray(lo, jnp.int32)
        ))
        np.testing.assert_array_equal(got, [e for _, e in cases])
        # and some lo with large carries (lo up to 127·area, not < 128)
        rng = np.random.default_rng(3)
        # |hi| stays within the kernel's digit domain (≤ 128·plane_px)
        true = rng.integers(-(2**36), 2**36, 64)
        true[:2] = (imax, imin)
        lo2 = rng.integers(0, 5 * 10**8, 64)
        hi2, lo2 = (true - lo2) // HILO_BASE, lo2 + (true - lo2) % HILO_BASE
        assert (128 * hi2 + lo2 == true).all() and (np.abs(hi2) < 2**31).all()
        got2 = np.asarray(_recombine_saturating(
            jnp.asarray(hi2, jnp.int32), jnp.asarray(lo2, jnp.int32)
        ))
        np.testing.assert_array_equal(got2, np.clip(true, imin, imax))
        # end-to-end: one 320×512 region of value 16383 sums to 5.24e9
        seg = np.zeros((320, 512), np.int32)
        vals = np.full((320, 512), 16383, np.int32)
        area, vsum = region_sums_mxu(
            jnp.asarray(seg), jnp.asarray(vals), 4, rows_per_chunk=64,
            interpret=True,
        )
        assert int(area[0]) == 320 * 512
        assert int(vsum[0]) == imax  # saturated, not wrapped

    def test_fused_batch_auto_paths(self):
        """fused_segment_batch on CPU exercises the fallback dispatch."""
        from particle_col_image_segmentation_tpu.config import AnalysisConfig
        from particle_col_image_segmentation_tpu.models.batch import (
            fused_segment_batch,
        )

        imgs = np.stack(
            [synthetic_label_plane(seed=s, shape=(64, 64)) for s in (41, 42)]
        ).astype(np.uint8)
        cfg = AnalysisConfig(max_regions=1024)
        seg, num, areas, classes, particle_px, cell_px, class_px, conv = (
            fused_segment_batch(jnp.asarray(imgs), cfg)
        )
        assert bool(np.all(np.asarray(conv)))
        for b in range(2):
            den = ndi.median_filter(imgs[b], size=5)
            ref, ref_n = ond.label(den, background=-1, return_num=True)
            assert int(num[b]) == ref_n
            np.testing.assert_array_equal(np.asarray(seg[b]), ref)

    def test_region_table_mxu_matches_scatter(self):
        from particle_col_image_segmentation_tpu.ops import label_image, region_props
        from particle_col_image_segmentation_tpu.ops.regionprops_tiles import (
            region_table_mxu,
        )

        img = synthetic_label_plane(seed=19, shape=(64, 128))
        seg, _ = label_image(jnp.asarray(img), background=-1, max_regions=2048)
        t0 = region_props(seg, jnp.asarray(img), max_regions=2048)
        for vb in (None, 7):  # general digit-split AND the narrow fast path
            t1 = region_table_mxu(
                seg, jnp.asarray(img), max_regions=2048, rows_per_chunk=8,
                interpret=True, val_bound=vb,
            )
            v = np.asarray(t0.valid)
            assert np.array_equal(np.asarray(t1.valid), v)
            for f in ("area", "sr_hi", "sr_lo", "sc_hi", "sc_lo", "class_id",
                      "bbox"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(t0, f))[v],
                    np.asarray(getattr(t1, f))[v], err_msg=f,
                )

    def test_region_sums_mxu(self):
        from particle_col_image_segmentation_tpu.ops.regionprops_tiles import (
            region_sums_mxu,
        )

        rng = np.random.default_rng(8)
        seg = rng.integers(0, 300, (32, 128)).astype(np.int32)
        vals = rng.integers(0, 2, (32, 128)).astype(np.int32)  # overlap mask
        area, vsum = region_sums_mxu(
            jnp.asarray(seg), jnp.asarray(vals), 511, rows_per_chunk=8,
            interpret=True,
        )
        import jax as _jax

        ref_area = _jax.ops.segment_sum(
            jnp.ones(seg.size, jnp.int32), jnp.asarray(seg.ravel()), num_segments=512
        )
        ref_sum = _jax.ops.segment_sum(
            jnp.asarray(vals.ravel()), jnp.asarray(seg.ravel()), num_segments=512
        )
        np.testing.assert_array_equal(np.asarray(area), np.asarray(ref_area))
        np.testing.assert_array_equal(np.asarray(vsum), np.asarray(ref_sum))

    def test_centroid_sums_matches_region_props(self):
        """The 5-column CentroidTable (refine's table) must equal the same
        columns of the full scatter table — scatter path, MXU kernel
        (interpret), and the batched MXU variant."""
        from particle_col_image_segmentation_tpu.ops.regionprops import (
            centroid_sums,
            region_props,
        )
        from particle_col_image_segmentation_tpu.ops.regionprops_tiles import (
            centroid_sums_mxu,
        )

        cols = ("area", "sr_hi", "sr_lo", "sc_hi", "sc_lo")
        rng = np.random.default_rng(7)
        seg = rng.integers(0, 300, (64, 128)).astype(np.int32)
        full = region_props(
            jnp.asarray(seg), jnp.ones((64, 128), jnp.int32), 512
        )
        ct = centroid_sums(jnp.asarray(seg), 512)
        ctm = centroid_sums_mxu(
            jnp.asarray(seg), 512, rows_per_chunk=8, interpret=True
        )
        for f in cols:
            np.testing.assert_array_equal(
                np.asarray(getattr(full, f)), np.asarray(getattr(ct, f)),
                err_msg=f,
            )
            np.testing.assert_array_equal(
                np.asarray(getattr(ct, f)), np.asarray(getattr(ctm, f)),
                err_msg=f,
            )
        segb = rng.integers(0, 300, (3, 64, 128)).astype(np.int32)
        ctb = centroid_sums_mxu(
            jnp.asarray(segb), 512, rows_per_chunk=8, interpret=True
        )
        for z in range(3):
            ref = centroid_sums(jnp.asarray(segb[z]), 512)
            for f in cols:
                np.testing.assert_array_equal(
                    np.asarray(getattr(ref, f)),
                    np.asarray(getattr(ctb, f))[z], err_msg=f"{z}:{f}",
                )

    def test_table_lookup_mxu(self):
        from particle_col_image_segmentation_tpu.ops.regionprops_tiles import (
            table_lookup_mxu,
        )

        rng = np.random.default_rng(3)
        seg = rng.integers(0, 900, (32, 128)).astype(np.int32)
        tab = rng.integers(0, 256, 900).astype(np.int32)
        got = table_lookup_mxu(
            jnp.asarray(seg), jnp.asarray(tab), rows_per_chunk=8, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got), tab[seg])


class TestBandSweepConvergence:
    """Per-sweep convergence flags must not exit early on shapes needing many
    alternating rounds (spiral = worst case for Gauss-Seidel sweeps)."""

    def test_spiral(self):
        from particle_col_image_segmentation_tpu.ops.ccl import connected_components
        from particle_col_image_segmentation_tpu.ops.ccl_tiles import ccl_sweeps

        n = 64
        img = np.zeros((n, n), np.uint8)
        # rectangular spiral of 1s on a 0 background
        top, bot, left, right = 0, n - 1, 0, n - 1
        while left < right and top < bot:
            img[top, left:right + 1] = 1
            img[top:bot + 1, right] = 1
            img[bot, left + 2:right + 1] = 1
            img[top + 2:bot + 1, left + 2] = 1
            top += 2
            bot -= 2
            left += 2
            right -= 2
        ref = np.asarray(connected_components(jnp.asarray(img), background=0,
                                              max_iters=4096))
        got = np.asarray(
            ccl_sweeps(jnp.asarray(img), background=0, tile=8,
                       max_sweeps=256, interpret=True)
        )
        np.testing.assert_array_equal(got, ref)
        # the whole spiral is ONE component
        assert len(np.unique(ref[img == 1])) == 1

    def test_nonconvergence_detected(self):
        """Regression: exhausted iteration budgets once exited SILENTLY with
        invalid labels; with_flag must report converged=False then."""
        from particle_col_image_segmentation_tpu.ops.ccl import (
            connected_components,
        )
        from particle_col_image_segmentation_tpu.ops.ccl_tiles import ccl_sweeps

        img = synthetic_label_plane(seed=13, shape=(64, 64))
        # ample budget → certified converged
        _, conv = connected_components(
            jnp.asarray(img), with_flag=True
        )
        assert bool(conv)
        # starved budget → flagged, not silent
        _, conv = connected_components(
            jnp.asarray(img), max_iters=1, with_flag=True
        )
        assert not bool(conv)
        # Gauss-Seidel sweeps converge on blob planes in one down+up pair;
        # starve them with the spiral (many alternating rounds needed)
        n = 32
        sp = np.zeros((n, n), np.uint8)
        top, bot, left, right = 0, n - 1, 0, n - 1
        while left < right and top < bot:
            sp[top, left:right + 1] = 1
            sp[top:bot + 1, right] = 1
            sp[bot, left + 2:right + 1] = 1
            sp[top + 2:bot + 1, left + 2] = 1
            top += 2; bot -= 2; left += 2; right -= 2
        _, conv = ccl_sweeps(
            jnp.asarray(sp), background=0, tile=8, max_sweeps=1,
            interpret=True, with_flag=True,
        )
        assert not bool(conv)
        _, conv = ccl_sweeps(
            jnp.asarray(sp), background=0, tile=8, max_sweeps=256,
            interpret=True, with_flag=True,
        )
        assert bool(conv)

    def test_watershed_nonconvergence_detected(self):
        from scipy import ndimage as ndi

        from particle_col_image_segmentation_tpu.ops.watershed import watershed

        n = 64
        m = np.zeros((n, n), bool)
        m[8:56, 8:56] = True
        dist = ndi.distance_transform_edt(m)
        prob = (1.0 - dist / max(1.0, dist.max())).astype(np.float32)
        mk = np.zeros((n, n), np.int32)
        mk[32, 32] = 1
        _, conv = watershed(jnp.asarray(prob), jnp.asarray(mk),
                            jnp.asarray(m), with_flag=True)
        assert bool(conv)
        _, conv = watershed(jnp.asarray(prob), jnp.asarray(mk),
                            jnp.asarray(m), max_iters=2, with_flag=True)
        assert not bool(conv)

    def test_watershed_auto_budget_passthrough(self):
        """watershed_auto exposes both schedule budgets; an exhausted
        budget surfaces converged=False instead of a wrong answer."""
        from scipy import ndimage as ndi

        from particle_col_image_segmentation_tpu.ops.watershed import (
            watershed_auto,
        )

        # (64, 128): W=128 passes watershed_auto's lane-alignment gate, so
        # on TPU the max_sweeps budget reaches the Pallas watershed_sweeps
        # path (a 64-wide plane would silently fall back to XLA on every
        # backend and never exercise the sweep-budget plumbing)
        hgt, wid = 64, 128
        m = np.zeros((hgt, wid), bool)
        m[8:56, 8:120] = True
        dist = ndi.distance_transform_edt(m)
        prob = (1.0 - dist / max(1.0, dist.max())).astype(np.float32)
        mk = np.zeros((hgt, wid), np.int32)
        mk[32, 32] = 1
        mk[32, 96] = 2
        lab, conv = watershed_auto(
            jnp.asarray(prob), jnp.asarray(mk), jnp.asarray(m),
            with_flag=True, max_iters=1024, max_sweeps=32,
        )
        assert bool(conv)
        _, conv = watershed_auto(
            jnp.asarray(prob), jnp.asarray(mk), jnp.asarray(m),
            with_flag=True, max_iters=2, max_sweeps=1,
        )
        assert not bool(conv)

    @pytest.mark.parametrize("k", [8, 64])
    def test_watershed_quantized_realistic_regime(self, k):
        """Ilastik probability maps arrive uint8-quantized (plateaued); in
        the PIPELINE regime — markers from EDT maxima of the object mask,
        flooding confined to the mask (refine_boundaries.py:60-73) — the
        kernel must stay ≥0.99 boundary IoU vs the oracle priority flood
        at every quantization level (the measured curve lives in
        docs/PERF.md; the unconfined sparse-seed regime is documented
        out-of-contract there)."""
        from scipy import ndimage as ndi

        from particle_col_image_segmentation_tpu.oracle import ndimage as ond
        from particle_col_image_segmentation_tpu.ops.watershed import watershed
        from particle_col_image_segmentation_tpu.utils.metrics import (
            boundary_iou,
        )

        n = 256
        rng = np.random.default_rng(0)
        m = np.zeros((n, n), bool)
        yy, xx = np.mgrid[:n, :n]
        for _ in range(max(6, n // 17)):
            cy, cx = rng.integers(40, n - 40, 2)
            r2 = int(rng.integers(150, 400))
            m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r2
            m |= (yy - cy) ** 2 + (xx - cx - int(1.5 * np.sqrt(r2))) ** 2 <= r2
        dist = ndi.distance_transform_edt(m)
        prob = (1.0 - dist / max(1.0, dist.max())).astype(np.float32)
        q = (np.round(prob * (k - 1)) / (k - 1)).astype(np.float32)
        binary = q < 0.5
        markers = ond.label(
            ond.local_maxima(ndi.distance_transform_edt(binary)).astype(
                np.uint8
            )
        )
        dev, conv = watershed(
            jnp.asarray(q), jnp.asarray(markers), jnp.asarray(binary),
            max_iters=4096, with_flag=True,
        )
        assert bool(conv)
        orc = ond.watershed(q, markers, mask=binary)
        assert boundary_iou(np.asarray(dev), orc) >= 0.99


class TestWatershedTunnelBasins:
    """tunnel_basins=True: priority-flood basin tunneling via
    basin-component contraction (ops.watershed module docstring)."""

    def test_tunnel_golden_matches_oracle(self):
        """The hand-traced quantized-basin golden (test_oracle_external
        ::test_quantized_basin_tunnels_wave): the wave tunnels a 3-px
        basin in ~one BFS round, so marker 1 takes 8 of 12 cells.  The
        default key pays the basin width per pixel and splits 6/6; the
        basin-contraction key must match the oracle exactly."""
        from particle_col_image_segmentation_tpu.oracle import ndimage as ond
        from particle_col_image_segmentation_tpu.ops.watershed import watershed

        img = np.array([[2.0, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2]])
        markers = np.zeros((1, 12), np.int64)
        markers[0, 0] = 1
        markers[0, 11] = 2
        orc = ond.watershed(img, markers)
        base = np.asarray(watershed(jnp.asarray(img), jnp.asarray(markers)))
        tun, conv = watershed(
            jnp.asarray(img), jnp.asarray(markers),
            tunnel_basins=True, with_flag=True,
        )
        assert bool(conv)
        np.testing.assert_array_equal(np.asarray(tun), orc)
        assert not (base == orc).all()  # the golden separates the keys

    def test_sparse_quantized_parity_lift(self):
        """Unconfined sparse point seeds on an 8-level-quantized noise
        relief — the regime documented out-of-contract for the default
        key (docs/PERF.md: IoU ~0.4).  Basin contraction must converge
        AND lift boundary IoU vs the oracle by a wide margin
        (measured 0.41 → 0.83 at this exact fixture)."""
        from particle_col_image_segmentation_tpu.oracle import ndimage as ond
        from particle_col_image_segmentation_tpu.ops.watershed import watershed
        from particle_col_image_segmentation_tpu.utils.metrics import (
            boundary_iou,
        )

        n, k = 128, 8
        rng = np.random.default_rng(0)
        prob = rng.random((n, n)).astype(np.float32)
        q = (np.round(prob * (k - 1)) / (k - 1)).astype(np.float32)
        markers = np.zeros((n, n), np.int32)
        pts = sorted(
            {(int(y), int(x)) for y, x in
             np.random.default_rng(2).integers(0, n, (20, 2))}
        )
        for i, (cy, cx) in enumerate(pts):
            markers[cy, cx] = i + 1
        orc = ond.watershed(q, markers)
        base = np.asarray(
            watershed(jnp.asarray(q), jnp.asarray(markers), max_iters=4096)
        )
        tun, conv = watershed(
            jnp.asarray(q), jnp.asarray(markers), max_iters=4096,
            tunnel_basins=True, with_flag=True,
        )
        assert bool(conv)
        iou_base = boundary_iou(base, orc)
        iou_tun = boundary_iou(np.asarray(tun), orc)
        assert iou_tun >= iou_base + 0.2, (iou_base, iou_tun)
        assert iou_tun >= 0.7, iou_tun  # measured 0.73 (base 0.41)

    def test_pipeline_regime_unperturbed(self):
        """In the pipeline regime (EDT-seeded markers confined to the
        object mask) basins contain their own markers, so contraction
        must not move parity at all — base and tunnel keys measure the
        same boundary IoU vs the oracle (the ≥0.99 contract itself is
        pinned on the 256² fixture in
        test_watershed_quantized_realistic_regime)."""
        from scipy import ndimage as ndi

        from particle_col_image_segmentation_tpu.oracle import ndimage as ond
        from particle_col_image_segmentation_tpu.ops.watershed import watershed
        from particle_col_image_segmentation_tpu.utils.metrics import (
            boundary_iou,
        )

        n, k = 128, 8
        rng = np.random.default_rng(1)
        m = np.zeros((n, n), bool)
        yy, xx = np.mgrid[:n, :n]
        for _ in range(6):
            cy, cx = rng.integers(25, n - 25, 2)
            r2 = int(rng.integers(80, 200))
            m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r2
            m |= (yy - cy) ** 2 + (xx - cx - int(1.5 * np.sqrt(r2))) ** 2 <= r2
        dist = ndi.distance_transform_edt(m)
        prob = (1.0 - dist / max(1.0, dist.max())).astype(np.float32)
        q = (np.round(prob * (k - 1)) / (k - 1)).astype(np.float32)
        binary = q < 0.5
        markers = ond.label(
            ond.local_maxima(ndi.distance_transform_edt(binary)).astype(
                np.uint8
            )
        )
        tun, conv = watershed(
            jnp.asarray(q), jnp.asarray(markers), jnp.asarray(binary),
            max_iters=4096, tunnel_basins=True, with_flag=True,
        )
        assert bool(conv)
        base = np.asarray(
            watershed(
                jnp.asarray(q), jnp.asarray(markers), jnp.asarray(binary),
                max_iters=4096,
            )
        )
        orc = ond.watershed(q, markers, mask=binary)
        iou_base = boundary_iou(base, orc)
        iou_tun = boundary_iou(np.asarray(tun), orc)
        assert iou_tun == pytest.approx(iou_base), (iou_base, iou_tun)
        assert iou_tun >= 0.96, iou_tun  # measured 0.9707 for both keys

    def test_batched_planes_match_oracle(self):
        """A [2, H, W] batch floods both planes in one fixpoint with
        globally-unique basin segments; per-plane flags."""
        from particle_col_image_segmentation_tpu.oracle import ndimage as ond
        from particle_col_image_segmentation_tpu.ops.watershed import watershed

        markers = np.zeros((1, 12), np.int64)
        markers[0, 0] = 1
        markers[0, 11] = 2
        img_a = np.array([[2.0, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2]])
        img_b = np.array([[2.0, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2]])
        out, conv = watershed(
            jnp.asarray(np.stack([img_a, img_b])),
            jnp.asarray(np.stack([markers, markers])),
            tunnel_basins=True, with_flag=True,
        )
        out = np.asarray(out)
        assert conv.shape == (2,) and bool(np.asarray(conv).all())
        np.testing.assert_array_equal(out[0], ond.watershed(img_a, markers))
        np.testing.assert_array_equal(out[1], ond.watershed(img_b, markers))


class TestPallasMedian:
    @pytest.mark.parametrize("shape", [(64, 128), (96, 256)])
    def test_matches_scipy(self, shape):
        from particle_col_image_segmentation_tpu.ops.filters_tiles import (
            median_label_filter_pallas,
        )

        rng = np.random.default_rng(shape[0])
        img = rng.integers(0, 7, shape).astype(np.uint8)
        got = np.asarray(
            median_label_filter_pallas(jnp.asarray(img), tile=32, interpret=True)
        )
        np.testing.assert_array_equal(got, ndi.median_filter(img, size=5))

    def test_batched(self):
        from particle_col_image_segmentation_tpu.ops.filters_tiles import (
            median_label_filter_pallas,
        )

        rng = np.random.default_rng(7)
        imgs = rng.integers(0, 8, (3, 64, 128)).astype(np.uint8)
        got = np.asarray(
            median_label_filter_pallas(jnp.asarray(imgs), tile=32, interpret=True)
        )
        ref = np.stack([ndi.median_filter(i, size=5) for i in imgs])
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("size", [3, 7, 9])
    def test_non_default_sizes(self, size):
        """Regression: the horizontal taps/reflect fixes were once hardcoded
        to size=5, silently wrong for any other size."""
        from particle_col_image_segmentation_tpu.ops.filters_tiles import (
            median_label_filter_pallas,
        )

        rng = np.random.default_rng(100 + size)
        img = rng.integers(0, 6, (32, 128)).astype(np.uint8)
        got = np.asarray(
            median_label_filter_pallas(
                jnp.asarray(img), size=size, tile=8, interpret=True
            )
        )
        np.testing.assert_array_equal(
            got, ndi.median_filter(img, size=size, mode="reflect")
        )
