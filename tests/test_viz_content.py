"""Figure-CONTENT parity tests (VERDICT r1 #7/weak #6).

Round 1's viz tests only asserted that PNG files were written — a blank
figure would pass.  These inspect the returned matplotlib objects: panel
counts, titles, image payloads, scatter point counts, rectangle overlays,
and annotation counts, all cross-checked against the analysis results that
fed the figure.
"""

import os

import numpy as np
import pytest

from particle_col_image_segmentation_tpu.config import AnalysisConfig
from particle_col_image_segmentation_tpu.oracle import reference_pipeline as rp
from particle_col_image_segmentation_tpu.viz.figures import (
    create_channel_plots,
    create_plot,
    create_single_plots,
    get_color_map,
    plot_original_vs_merged,
    visualize_dapi_overlap_results,
)

from fixtures import synthetic_label_plane

CT = {1: "3D05", 2: "Particle", 3: "Background"}
CFG = AnalysisConfig()


@pytest.fixture(scope="module")
def analysis():
    img = synthetic_label_plane(seed=21, shape=(128, 128))
    den = rp.denoise(img)
    pos, clusters, particle_area, merged = rp.get_cell_positions_and_areas(
        den, CT, merged=True, cfg=CFG
    )
    return img, den, pos, clusters, merged


def _scatter_counts(ax):
    """(n_white_singles, n_red_clusters) point counts from the collections."""
    import matplotlib.collections as mc

    counts = [
        len(c.get_offsets())
        for c in ax.collections
        if isinstance(c, mc.PathCollection)
    ]
    return counts


class TestQuadFigures:
    def test_single_plots_content(self, tmp_path, analysis):
        img, den, pos, clusters, merged = analysis
        cmap, norm = get_color_map(CT)
        out = str(tmp_path / "single")
        fig = create_single_plots(
            img, cmap, norm, "base", out, den, den, pos, clusters
        )
        assert os.path.exists(f"{out}_plots.png")
        # 2×2 layout with the reference's four panel titles (ref :525-616)
        titles = [ax.get_title() for ax in fig.axes]
        assert titles == [
            "Raw segmentation", "Denoised image", "Cell positions",
            "Particle Area",
        ]
        # image panels carry the actual arrays, not blanks
        np.testing.assert_array_equal(
            np.asarray(fig.axes[0].images[0].get_array()), img
        )
        np.testing.assert_array_equal(
            np.asarray(fig.axes[1].images[0].get_array()), den
        )
        # positions panel: white singles + red cluster markers match counts
        n_singles = sum(len(v) for v in pos.values())
        n_clusters = sum(len(v) for v in clusters.values())
        counts = _scatter_counts(fig.axes[2])
        assert sum(counts) == n_singles + n_clusters
        assert n_singles > 0 and n_clusters > 0  # fixture exercises both
        assert fig.legends, "legend missing"

    def test_channel_plots_three_panel_mode(self, tmp_path, analysis):
        img, den, pos, clusters, _ = analysis
        cmap, norm = get_color_map(CT)
        out = str(tmp_path / "chan")
        # no overlap array → reference's 3-panel GridSpec layout (ref :354)
        fig = create_channel_plots(
            img, "3D05", cmap, norm, "base", out, den,
            overlap_arr=None, cell_positions=pos, cell_clusters=clusters,
        )
        assert len(fig.axes) == 3
        titles = [ax.get_title() for ax in fig.axes]
        assert titles == ["Raw segmentation", "Denoised image", "Cell positions"]

    def test_create_plot_content(self, tmp_path, analysis):
        img, den, pos, clusters, _ = analysis
        cmap, norm = get_color_map(CT)
        out = str(tmp_path / "fused.png")
        fig = create_plot(den, cmap, norm, out, pos, clusters, title="Fused")
        assert os.path.exists(out)
        ax = fig.axes[0]
        assert ax.get_title() == "Fused"
        np.testing.assert_array_equal(
            np.asarray(ax.images[0].get_array()), den
        )
        assert sum(_scatter_counts(ax)) == (
            sum(len(v) for v in pos.values())
            + sum(len(v) for v in clusters.values())
        )


class TestDapiOverlapFigure:
    def test_panels_and_overlay(self, tmp_path):
        dapi = synthetic_label_plane(seed=22, shape=(96, 96))
        other = synthetic_label_plane(seed=23, shape=(96, 96))
        updated = np.where(dapi == 1, 2, dapi).astype(dapi.dtype)
        cmap, norm = get_color_map(CT)
        dcm, dnm = get_color_map({1: "6B07", 2: "Particle", 3: "Background"})
        out = str(tmp_path / "ov")
        orig_other = other.copy()
        fig = visualize_dapi_overlap_results(
            dapi, other, updated, cmap, norm, dcm, dnm, "base", out, "RFP"
        )
        assert os.path.exists(f"{out}_dapi_RFP_overlap.png")
        titles = [ax.get_title() for ax in fig.axes]
        assert titles == [
            "Original DAPI", "Original RFP", "DAPI overlaid with RFP",
            "Updated DAPI",
        ]
        # the overlay panel stamps DAPI cells (value 2) over the other
        # channel WITHOUT mutating the inputs (ref :321 mutated in place)
        overlay = np.asarray(fig.axes[2].images[0].get_array())
        expected = np.where(dapi == 1, 2, orig_other)
        np.testing.assert_array_equal(overlay, expected)
        np.testing.assert_array_equal(other, orig_other)  # input unmutated
        np.testing.assert_array_equal(
            np.asarray(fig.axes[3].images[0].get_array()), updated
        )


class TestMergedFigure:
    def test_rect_overlays_match_analysis(self, tmp_path, analysis):
        img, den, pos, clusters, merged_regions = analysis
        os.chdir(tmp_path)
        fig = plot_original_vs_merged(
            den, merged_regions, clusters, CT, "title", "base"
        )
        assert os.path.exists("base_cell_cluster_pos.png")
        from matplotlib.patches import Rectangle

        # panel per merge context (strains + "combined"), reference :885-928
        panel_axes = [ax for ax in fig.axes if ax.get_title()]
        assert len(panel_axes) == len(merged_regions)
        for ax, (cell_type, regions) in zip(
            panel_axes, merged_regions.items()
        ):
            assert ax.get_title() == cell_type.title()
            rects = [p for p in ax.patches if isinstance(p, Rectangle)]
            oranges = [
                r for r in rects
                if r.get_edgecolor()[:3] == pytest.approx((1.0, 0.6470588, 0.0))
            ]
            greens = [r for r in rects if r not in oranges]
            n_clusters = len((clusters or {}).get(cell_type, []))
            n_multi = sum(1 for g in regions if len(g["regions"]) > 1)
            assert len(oranges) == n_clusters
            assert len(greens) == n_multi


class TestNanoSIMSFigures:
    @pytest.fixture(scope="class")
    def ns_result(self):
        from particle_col_image_segmentation_tpu.models import nanosims

        rng = np.random.default_rng(9)
        acq = 64
        rgb = np.full((80, 80, 3), 255, np.uint8)
        rgb[10:20, 10:20] = (255, 0, 0)
        rgb[40:52, 30:44] = (255, 0, 0)
        rgb[60:70, 55:65] = (0, 255, 0)
        iso = {
            k: rng.random((acq, acq)).astype(np.float32)
            for k in ("C12", "C13", "N14C12", "N15C12", "O16", "O17", "O18")
        }
        return nanosims.analyze_nanosims(iso, rgb), iso

    def test_annotations_count(self, tmp_path, ns_result):
        from particle_col_image_segmentation_tpu.viz.nanosims_figures import (
            save_annotations_figure,
        )

        result, iso = ns_result
        rgb = np.zeros((60, 60, 3), np.uint8)
        fig = save_annotations_figure(
            result, rgb, str(tmp_path / "ann.png")
        )
        n_rois = result.red.num_rois + result.green.num_rois
        assert n_rois == 3
        assert len(fig.axes[0].texts) == n_rois
        labels = sorted(t.get_text() for t in fig.axes[0].texts)
        assert labels == ["1", "1", "2"]  # per-class 1-based indices

    def test_cell_position_scatter_counts(self, tmp_path, ns_result):
        from particle_col_image_segmentation_tpu.viz.nanosims_figures import (
            save_cell_position_figure,
        )

        result, iso = ns_result
        img = np.zeros((64, 64), np.uint8)
        fig = save_cell_position_figure(
            result, img, str(tmp_path / "pos.png")
        )
        counts = _scatter_counts(fig.axes[0])
        assert counts == [result.red.num_rois, result.green.num_rois]

    def test_svg_and_bound_paint_exports(self, tmp_path, ns_result):
        """The reference exports rois_clear.svg (ref .m:89) and
        bound_paint_clear.png (ref .m:277) — VERDICT r1 missing #3."""
        from particle_col_image_segmentation_tpu.viz.nanosims_figures import (
            save_all,
        )

        result, iso = ns_result
        rgb = np.zeros((60, 60, 3), np.uint8)
        img = np.zeros((64, 64), np.uint8)
        bound_rgb = np.full((50, 50, 3), 255, np.uint8)
        bound_mask = np.zeros((50, 50), bool)
        bound_mask[20:30, 20:30] = True
        save_all(
            result, rgb, img, str(tmp_path),
            bound_mask=bound_mask, bound_rgb=bound_rgb,
        )
        for name in (
            "rois_clear.png", "rois_clear.svg", "annotations.png",
            "cell position.png", "bound_paint_clear.png", "agg_boundary.png",
        ):
            p = tmp_path / name
            assert p.exists() and p.stat().st_size > 0, name
