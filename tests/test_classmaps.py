"""Direct tests for the strain/channel/class-map rules
(reference tiff_analysis.py:7-14 docstring + :673-712)."""

import numpy as np
import pytest

from particle_col_image_segmentation_tpu.config import AnalysisConfig
from particle_col_image_segmentation_tpu.labels import classmaps
from particle_col_image_segmentation_tpu.oracle.reference_pipeline import (
    normalize_ds_arr,
)


class TestStrains:
    def test_order_follows_cell_types(self):
        assert classmaps.get_strains_from_path("x/C3M10_3D05/y") == ["3D05", "C3M10"]

    def test_case_insensitive(self):
        assert classmaps.get_strains_from_path("tp_3d05_1") == ["3D05"]

    def test_none(self):
        assert classmaps.get_strains_from_path("nothing") == []


class TestChannel:
    def test_single(self):
        assert classmaps.get_channel_from_path("Tp_1_DAPI_labels.h5") == "DAPI"

    def test_lowercase(self):
        assert classmaps.get_channel_from_path("tp_rfp_x.h5") == "RFP"


class TestCellTypeMap:
    def test_one_strain(self):
        assert classmaps.get_cell_type_map("a_3D05_b") == {
            1: "3D05", 2: "Particle", 3: "Background",
        }

    def test_three_strains(self):
        m = classmaps.get_cell_type_map("3D05_6B07_C3M10")
        assert m == {1: "3D05", 2: "6B07", 3: "C3M10", 4: "Particle", 5: "Background"}


class TestChannelMapRules:
    """The strain-condition rules from the reference module docstring."""

    def test_6b07_only_rfp_has_no_cell(self):
        assert classmaps.get_cell_type_map_from_channel(["6B07"], "RFP") == {
            1: "Particle", 2: "Background",
        }

    def test_6b07_c3m10_rfp_has_no_cell(self):
        assert classmaps.get_cell_type_map_from_channel(["6B07", "C3M10"], "RFP") == {
            1: "Particle", 2: "Background",
        }

    def test_3d05_6b07_rfp_is_3d05(self):
        assert classmaps.get_cell_type_map_from_channel(["3D05", "6B07"], "RFP") == {
            1: "3D05", 2: "Particle", 3: "Background",
        }

    def test_dapi_always_6b07(self):
        for strains in (["6B07"], ["3D05", "6B07"], ["6B07", "C3M10"]):
            assert classmaps.get_cell_type_map_from_channel(strains, "DAPI")[1] == "6B07"

    def test_gfp_is_c3m10(self):
        assert classmaps.get_cell_type_map_from_channel(["6B07", "C3M10"], "GFP")[1] == "C3M10"

    def test_helpers(self):
        m = {1: "3D05", 2: "Particle", 3: "Background"}
        assert classmaps.particle_value(m) == 2
        assert classmaps.strain_values(m) == {"3D05": 1}


class TestNormalize:
    def test_squeeze_variants(self):
        a = np.zeros((64, 64))
        np.testing.assert_array_equal(normalize_ds_arr(a[..., None]), a)
        np.testing.assert_array_equal(normalize_ds_arr(a[None]), a)
        np.testing.assert_array_equal(normalize_ds_arr(a), a)

    def test_reference_shape_enforcement(self):
        cfg = AnalysisConfig(enforce_reference_shape=True)
        with pytest.raises(ValueError):
            normalize_ds_arr(np.zeros((64, 64)), cfg)
        normalize_ds_arr(np.zeros((2048, 2048)), cfg)  # ok
