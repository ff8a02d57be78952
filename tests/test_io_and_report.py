"""Tests: TIFF I/O, z-stack splitting, folder normalization, CSV writers."""

import os

import numpy as np
import pytest

from particle_col_image_segmentation_tpu.io.discovery import (
    clean_acquisition_name,
    get_h5_files_recursively,
    get_pos_and_density_file_names,
    get_similar_files,
    normalize_capture_tree,
    remove_channels,
)
from particle_col_image_segmentation_tpu.io.tiff import (
    read_tiff_stack,
    read_zstack,
    write_tiff,
)
from particle_col_image_segmentation_tpu.models import zsplit
from particle_col_image_segmentation_tpu.oracle.ndimage import Region
from particle_col_image_segmentation_tpu.report.csvio import (
    write_cell_position_info,
    write_density_info,
    write_matrix_csv,
    write_merged_cell_position_info,
)


class TestTiff:
    def test_roundtrip_single(self, tmp_path):
        arr = np.arange(64 * 48, dtype=np.uint16).reshape(64, 48)
        p = str(tmp_path / "x.tif")
        write_tiff(p, arr)
        back = read_tiff_stack(p)
        np.testing.assert_array_equal(back, arr)

    def test_roundtrip_stack_and_reshape(self, tmp_path):
        arr = np.random.default_rng(0).integers(0, 65535, (6, 32, 32)).astype(np.uint16)
        p = str(tmp_path / "s.tif")
        write_tiff(p, arr)
        back = read_tiff_stack(p)
        np.testing.assert_array_equal(back, arr)
        z = read_zstack(p, num_channels=2)
        assert z.shape == (3, 2, 32, 32)
        np.testing.assert_array_equal(z[1, 0], arr[2])


class TestZsplit:
    def test_clean_names(self):
        ch, clean = zsplit.get_clean_file_name("Tp_CY5_RFP_GFP_DAPI_1_zstack.tif")
        assert ch == "_CY5_RFP_GFP_DAPI"
        assert clean == "Tp_1"
        ch, clean = zsplit.get_clean_file_name("Tp_RFP_GFP_2_zstack.tif")
        assert ch == "_RFP_GFP"
        assert clean == "Tp_2"
        ch, clean = zsplit.get_clean_file_name("plain.tif")
        assert ch == "" and clean == "plain"

    def test_split_planes_4ch(self):
        stack = np.arange(2 * 4 * 4 * 4).reshape(2, 4, 4, 4).astype(np.uint16)
        out = list(zsplit.split_planes(stack, [1, 2]))
        assert [(i, n) for i, n, _ in out] == [
            (0, "RFP"), (0, "GFP"), (1, "RFP"), (1, "GFP"),
        ]
        np.testing.assert_array_equal(out[0][2], stack[0, 1])

    def test_split_planes_2ch_fallback(self):
        stack = np.arange(2 * 2 * 4 * 4).reshape(2, 2, 4, 4).astype(np.uint16)
        out = list(zsplit.split_planes(stack, [1, 2]))
        # fallback: channel_indices overridden to [0,1] → RFP, GFP
        assert [(i, n) for i, n, _ in out] == [
            (0, "RFP"), (0, "GFP"), (1, "RFP"), (1, "GFP"),
        ]
        np.testing.assert_array_equal(out[0][2], stack[0, 0])

    def test_process_folder_end_to_end(self, tmp_path, monkeypatch):
        # layout: top/acq1/Tp_RFP_GFP_5_zstack.tif
        acq = tmp_path / "top" / "acq1"
        acq.mkdir(parents=True)
        stack = (
            np.random.default_rng(1).integers(0, 255, (3, 2, 16, 16)).astype(np.uint8)
        )
        write_tiff(str(acq / "Tp_RFP_GFP_5_zstack.tif"), stack.reshape(6, 16, 16))
        monkeypatch.chdir(tmp_path)
        zsplit.process_folder(str(tmp_path / "top"), [1, 2])
        # clean folder is created alongside the input (reference :42-47)
        clean = tmp_path / "top" / "acq1" / "Tp_5"
        assert (clean / "Tp_RFP_GFP_5_zstack.tif").exists()
        # channel folders derive from destination path minus channel token
        rfp_folder = str(clean / "Tp_5_zstack_RFP")
        assert os.path.isdir(rfp_folder)
        files = sorted(os.listdir(rfp_folder))
        assert files == [f"Tp_5_zstack_z{i}_RFP.tif" for i in range(3)]
        plane = read_tiff_stack(os.path.join(rfp_folder, files[0]))
        np.testing.assert_array_equal(plane, stack[0, 0])

    def test_imagej_metadata_overrides_token_guess(self, tmp_path):
        """Regression: channel count came only from filename tokens; a stack
        whose token disagrees with its real structure was regrouped wrongly.
        The TIFF's own ImageJ channels= metadata must win."""
        from PIL import Image

        from particle_col_image_segmentation_tpu.io.tiff import read_zstack

        stack = (
            np.random.default_rng(5).integers(0, 255, (12, 8, 8)).astype(np.uint8)
        )
        p = str(tmp_path / "Tp_RFP_GFP_1_zstack.tif")  # token says 2-channel
        pages = [Image.fromarray(s) for s in stack]
        pages[0].save(
            p, save_all=True, append_images=pages[1:],
            tiffinfo={270: "ImageJ=1.53c\nimages=12\nchannels=4\nslices=3\n"},
        )
        arr = read_zstack(p, num_channels=2)  # caller's (wrong) token hint
        assert arr.shape == (3, 4, 8, 8)  # metadata grouping wins
        np.testing.assert_array_equal(arr.reshape(12, 8, 8), stack)

    def test_mip_dirname_does_not_downgrade_stack(self, tmp_path, monkeypatch):
        """Regression: '_mip' anywhere in the PATH made process_tif move-only;
        only the file's basename may trigger that."""
        acq = tmp_path / "exports_mip_top" / "acq1"
        acq.mkdir(parents=True)
        stack = (
            np.random.default_rng(6).integers(0, 255, (2, 2, 16, 16)).astype(np.uint8)
        )
        write_tiff(str(acq / "Tp_RFP_GFP_7_zstack.tif"), stack.reshape(4, 16, 16))
        monkeypatch.chdir(tmp_path)
        zsplit.process_folder(str(tmp_path / "exports_mip_top"), [1, 2])
        clean = acq / "Tp_7"
        rfp = clean / "Tp_7_zstack_RFP"
        assert rfp.is_dir() and len(list(rfp.iterdir())) == 2

    def test_indivisible_pages_raise(self, tmp_path):
        """Pages not grouping into the channel count must raise, not
        silently drop the remainder (or the whole stack)."""
        from particle_col_image_segmentation_tpu.io.tiff import read_zstack

        stack = np.zeros((5, 8, 8), np.uint8)  # 5 pages, 2 channels
        p = str(tmp_path / "odd.tif")
        write_tiff(p, stack)
        with pytest.raises(ValueError, match="do not group"):
            read_zstack(p, num_channels=2)

    def test_one_channel_fallback_raises(self):
        stack = np.zeros((2, 1, 4, 4), np.uint16)
        with pytest.raises(ValueError, match="at least 2"):
            list(zsplit.split_planes(stack, [1, 2]))

    def test_uppercase_tif_still_splits(self, tmp_path, monkeypatch):
        """'.TIF' matches the folder scan case-insensitively; process_tif
        must split it, not silently move-only."""
        acq = tmp_path / "top" / "acq1"
        acq.mkdir(parents=True)
        stack = (
            np.random.default_rng(9).integers(0, 255, (2, 2, 16, 16)).astype(np.uint8)
        )
        write_tiff(str(acq / "Tp_RFP_GFP_8_zstack.TIF"), stack.reshape(4, 16, 16))
        monkeypatch.chdir(tmp_path)
        zsplit.process_folder(str(tmp_path / "top"), [1, 2])
        rfp = tmp_path / "top" / "acq1" / "Tp_8" / "Tp_8_zstack_RFP"
        assert rfp.is_dir() and len(list(rfp.iterdir())) == 2

    def test_bad_capture_does_not_stop_scan(self, tmp_path, monkeypatch):
        """One malformed capture is reported at the end; the others split."""
        acq = tmp_path / "top" / "acq1"
        acq.mkdir(parents=True)
        good = (
            np.random.default_rng(3).integers(0, 255, (2, 2, 16, 16)).astype(np.uint8)
        )
        # 'aaa' sorts before the good capture, so the failure comes first
        write_tiff(str(acq / "Tp_RFP_GFP_aaa_zstack.tif"),
                   np.zeros((5, 16, 16), np.uint8))  # 5 pages ÷ 2 channels
        write_tiff(str(acq / "Tp_RFP_GFP_zzz_zstack.tif"),
                   good.reshape(4, 16, 16))
        monkeypatch.chdir(tmp_path)
        with pytest.raises(RuntimeError, match="1 capture"):
            zsplit.process_folder(str(tmp_path / "top"), [1, 2])
        rfp = tmp_path / "top" / "acq1" / "Tp_zzz" / "Tp_zzz_zstack_RFP"
        assert rfp.is_dir() and len(list(rfp.iterdir())) == 2

    def test_mip_tif_moved_not_split(self, tmp_path, monkeypatch):
        # a 2-D projection must be moved into the clean folder, never fed
        # through the plane loop (reference defect, SURVEY.md §2.6)
        acq = tmp_path / "top" / "acq1"
        acq.mkdir(parents=True)
        mip = np.random.default_rng(2).integers(0, 255, (16, 16)).astype(np.uint8)
        write_tiff(str(acq / "Tp_RFP_GFP_5_mip.tif"), mip)
        monkeypatch.chdir(tmp_path)
        zsplit.process_folder(str(tmp_path / "top"), [1, 2])
        clean = tmp_path / "top" / "acq1" / "Tp_5"
        assert (clean / "Tp_RFP_GFP_5_mip.tif").exists()
        # nothing else was created (no channel folders, no fragments)
        assert sorted(os.listdir(clean)) == ["Tp_RFP_GFP_5_mip.tif"]


class TestDiscovery:
    def test_h5_walk(self, tmp_path):
        (tmp_path / "a" / "b").mkdir(parents=True)
        (tmp_path / "a" / "x.h5").write_bytes(b"")
        (tmp_path / "a" / "b" / "y.h5").write_bytes(b"")
        (tmp_path / "a" / "b" / "z.txt").write_bytes(b"")
        found = get_h5_files_recursively(str(tmp_path))
        assert {os.path.basename(k): v for k, v in found.items()} == {
            "a": ["x.h5"],
            "b": ["y.h5"],
        }

    def test_pos_density_names(self):
        d, p = get_pos_and_density_file_names("root/exp/24h/folder1")
        assert d.endswith("exp_24h_cell_density_info.csv")
        assert p == "root/exp/24h/folder1/folder1_cell_pos.csv"

    def test_pos_density_names_shallow_path(self):
        # a shallow relative folder must not crash the ancestor-name
        # derivation (resolved against the cwd; reference tiff_analysis.py
        # :619-624 always saw deep absolute paths)
        d, p = get_pos_and_density_file_names("folder1")
        assert d.endswith("_cell_density_info.csv")
        assert p == os.path.join("folder1", "folder1_cell_pos.csv")

    def test_pos_density_names_shallow_absolute(self):
        # even an ABSOLUTE path can have <3 components ("/data" →
        # ["", "data"]); the derivation pads instead of IndexError
        # (ADVICE r1 low)
        d, p = get_pos_and_density_file_names(os.sep + "data")
        assert d.endswith("_cell_density_info.csv")  # empty ancestor tokens
        assert p == os.path.join(os.sep + "data", "data_cell_pos.csv")

    def test_remove_channels_and_clean(self):
        assert remove_channels("Tp_RFP_1_zstack.tif") == "Tp_1_zstack.tif"
        assert clean_acquisition_name("Tp_GFP_2_zstack.tif") == "Tp_2"

    def test_similar_files_token_boundary(self, tmp_path):
        """'run_Pos1' must not claim 'run_Pos10_mip.tif' — a substring
        match silently misfiled the sibling acquisition's MIP on disk."""
        names = [
            "run_Pos1_DAPI_zstack.tif",
            "run_Pos1_DAPI_mip.tif",
            "run_Pos10_DAPI_mip.tif",
        ]
        for n in names:
            (tmp_path / n).write_bytes(b"x")
        got = {
            os.path.basename(p)
            for p in get_similar_files("run_Pos1_DAPI_zstack.tif", str(tmp_path))
        }
        assert got == {"run_Pos1_DAPI_zstack.tif", "run_Pos1_DAPI_mip.tif"}

    def test_normalize_capture_tree(self, tmp_path, monkeypatch):
        d = tmp_path / "cap" / "run1"
        d.mkdir(parents=True)
        (d / "Tp_RFP_3_zstack.tif").write_bytes(b"II*\x00")
        (d / "Tp_RFP_3_mip.tif").write_bytes(b"II*\x00")
        (d / "Tp_RFP_3_mip.jpg").write_bytes(b"")
        monkeypatch.chdir(tmp_path)
        folders = normalize_capture_tree(str(tmp_path / "cap"))
        # clean folder is created alongside the input files
        assert folders == [str(tmp_path / "cap" / "run1" / "Tp_3")]
        moved = sorted(os.listdir(folders[0]))
        assert moved == ["Tp_RFP_3_mip.jpg", "Tp_RFP_3_mip.tif", "Tp_RFP_3_zstack.tif"]


class TestCSV:
    def _region(self, lab, area, cy, cx, cells=None):
        r = Region(lab, area, (cy, cx), (0, 0, 1, 1), None)
        if cells is not None:
            r.cells = cells
        return r

    def test_position_schema(self, tmp_path):
        pos = {"3D05": [self._region(1, 50, 10.456, 20.123)]}
        clusters = {"3D05": [self._region(2, 300, 30.5, 40.5, cells=4)]}
        p = str(tmp_path / "pos.csv")
        write_cell_position_info(pos, clusters, p, 10000)
        lines = open(p).read().splitlines()
        assert lines[0] == "strain,cell_type,x_pos,y_pos,cell_area,cell_area_ratio,cell_count"
        conv = 9.95**2
        # cell row: area rounded 5dp; ratio 8dp
        assert lines[1] == (
            f"3D05,cell,20.12,10.46,{round(50/conv,5)},{round((50/conv)/(10000/conv),8)},1"
        )
        # cluster row: area UNROUNDED (reference :1063)
        assert lines[2] == (
            f"3D05,cluster,40.5,30.5,{300/conv},{round((300/conv)/(10000/conv),8)},4"
        )

    def test_merged_schema(self, tmp_path):
        merged = {
            "combined": [
                {"area": 500, "centroid": np.array([12.0, 14.0]),
                 "regions": [1, 2, 3], "bbox": (0, 0, 5, 5)}
            ]
        }
        p = str(tmp_path / "m.csv")
        write_merged_cell_position_info(merged, p, 10000)
        lines = open(p).read().splitlines()
        assert lines[0] == "strain_type,x_pos,y_pos,cell_area,cell_area_ratio,cell_num"
        assert lines[1].startswith("combined,14.0,12.0,")
        assert lines[1].endswith(",3")

    def test_density_dedup(self, tmp_path):
        p = str(tmp_path / "d.csv")
        write_density_info(p, "f1", {"3D05": 0.5}, {"3D05": 0.1}, {"3D05": 10})
        write_density_info(p, "f2", {"3D05": 0.6}, {"3D05": 0.2}, {"3D05": 20})
        write_density_info(p, "f1", {"3D05": 0.7}, {"3D05": 0.3}, {"3D05": 30})
        lines = open(p).read().splitlines()
        assert lines[0] == "folder,strain,cell_density,cell_area_ratio,cell_count"
        assert len(lines) == 3
        assert any(line == "f2,3D05,0.6,0.2,20" for line in lines)
        assert any(line == "f1,3D05,0.7,0.3,30" for line in lines)
        assert not any("0.5" in line for line in lines)

    def test_matrix_csv_matlab_format(self, tmp_path):
        p = str(tmp_path / "x.csv")
        write_matrix_csv(p, np.array([[1.0, 0.123456789, 12345.6789]]))
        assert open(p).read() == "1,0.12346,12346\n"
