"""Tests: manifest, prefetch loader, batch pipeline, viz figures, CLI."""

import json
import os

import numpy as np
import pytest

import jax

from particle_col_image_segmentation_tpu.config import AnalysisConfig
from particle_col_image_segmentation_tpu.io.loader import (
    batched_device_iterator,
    prefetch_map,
)
from particle_col_image_segmentation_tpu.models.batch import run_batch
from particle_col_image_segmentation_tpu.utils.manifest import RunManifest

from fixtures import synthetic_label_plane

CFG = AnalysisConfig(max_regions=4096)


class TestManifest:
    def test_roundtrip_and_resume(self, tmp_path):
        p = str(tmp_path / "run.jsonl")
        m = RunManifest(p)
        assert not m.is_done("a")
        m.mark_done("a", meta={"regions": 3})
        m.mark_done("b")
        assert m.is_done("a") and m.done_count == 2
        # new instance reads back state (resume)
        m2 = RunManifest(p)
        assert m2.is_done("a") and m2.is_done("b") and not m2.is_done("c")

    def test_torn_tail_ignored(self, tmp_path):
        p = str(tmp_path / "run.jsonl")
        RunManifest(p).mark_done("a")
        with open(p, "a") as f:
            f.write('{"key": "b", "sta')  # crash mid-write
        m = RunManifest(p)
        assert m.is_done("a") and not m.is_done("b")
        # appending after the torn tail must not weld the new record into
        # the garbage line (losing BOTH on the next resume)
        m.mark_done("b")
        m3 = RunManifest(p)
        assert m3.is_done("a") and m3.is_done("b") and m3.done_count == 2


class TestLoader:
    def test_prefetch_order(self):
        out = list(prefetch_map(lambda s: np.full((2, 2), int(s)), ["3", "1", "7"]))
        assert [o[0, 0] for o in out] == [3, 1, 7]

    def test_batched_device_iterator_padding(self):
        planes = {f"p{i}": np.full((8, 8), i, np.uint8) for i in range(5)}
        batches = list(
            batched_device_iterator(lambda k: planes[k], list(planes), batch_size=2)
        )
        counts = [c for _, c in batches]
        assert counts == [2, 2, 1]
        last = np.asarray(batches[-1][0])
        assert last.shape == (2, 8, 8)  # padded to full batch
        assert (last[0] == 4).all() and (last[1] == 4).all()  # repeat-pad


class TestBatchPipeline:
    def test_stats_and_manifest_resume(self, tmp_path):
        planes = {
            f"plane{i}": synthetic_label_plane(seed=i, shape=(96, 96))
            for i in range(3)
        }
        manifest = RunManifest(str(tmp_path / "m.jsonl"))
        stats = dict(
            run_batch(
                list(planes), lambda k: planes[k], CFG, batch_size=2,
                particle_val=2, manifest=manifest,
            )
        )
        assert set(stats) == set(planes)
        for key, s in stats.items():
            from scipy import ndimage as ndi

            den = ndi.median_filter(planes[key], size=5)
            assert s.particle_px == int(np.sum(den == 2))
            assert s.class_px[2] == s.particle_px
            assert s.num_regions > 0
        # resume: everything already done → nothing yielded
        again = list(
            run_batch(list(planes), lambda k: planes[k], CFG, batch_size=2,
                      manifest=manifest)
        )
        assert again == []

    def test_empty_cell_vals(self):
        """Regression: cell_vals=() (RFP plane with no cell class under the
        6B07/6B07+C3M10 rules) crashed run_batch with a 0-d cell_px."""
        plane = synthetic_label_plane(
            seed=3, cell_types={1: "Particle", 2: "Background"},
            shape=(64, 64), n_cells_per_strain=0, n_clusters_per_strain=0,
        )
        (_, stats), = run_batch(
            ["p"], lambda k: plane, CFG, batch_size=1,
            particle_val=1, cell_vals=(),
        )
        assert stats.cell_px == 0 and stats.particle_px > 0

    def test_csv_resume_appends(self, tmp_path):
        """Regression: the batch CLI truncated --csv on a manifest resume,
        permanently losing rows of already-done planes."""
        from particle_col_image_segmentation_tpu.cli import main as cli_main
        from particle_col_image_segmentation_tpu.io.hdf5 import save_h5_plane

        d = tmp_path / "3D05" / "a"
        d.mkdir(parents=True)
        for i in range(2):
            save_h5_plane(
                str(d / f"Tp_3D05_{i}_scan.h5"),
                synthetic_label_plane(seed=i, shape=(64, 64)),
            )
        csv = str(tmp_path / "out.csv")
        mani = str(tmp_path / "m.jsonl")
        args = ["batch", str(tmp_path), "--batch-size", "1",
                "--manifest", mani, "--csv", csv]
        assert cli_main(args) == 0
        rows1 = open(csv).read().strip().splitlines()
        assert len(rows1) == 3  # header + 2 planes
        # resume: everything done → nothing new, but nothing LOST either
        assert cli_main(args) == 0
        rows2 = open(csv).read().strip().splitlines()
        assert rows2 == rows1

    def test_overflow_flagged(self):
        """Regression: planes with more components than max_regions silently
        undercounted; now they carry overflow=True (and a manifest marker)."""
        from particle_col_image_segmentation_tpu.config import AnalysisConfig

        rng = np.random.default_rng(0)
        plane = rng.integers(1, 4, (64, 64)).astype(np.uint8)  # speckle
        tiny = AnalysisConfig(max_regions=8)
        (_, stats), = run_batch(["p"], lambda k: plane, tiny, batch_size=1,
                                particle_val=2)
        assert stats.num_regions > 8
        assert stats.overflow

    def test_overflow_not_marked_done(self, tmp_path):
        """Regression: overflowed planes were marked done, so the documented
        remedy — resume with a larger max_regions — silently skipped exactly
        those planes.  They must stay un-done and be retried."""
        from particle_col_image_segmentation_tpu.config import AnalysisConfig

        rng = np.random.default_rng(0)
        plane = rng.integers(1, 4, (64, 64)).astype(np.uint8)
        manifest = RunManifest(str(tmp_path / "m.jsonl"))
        tiny = AnalysisConfig(max_regions=8)
        (_, s1), = run_batch(["p"], lambda k: plane, tiny, batch_size=1,
                             manifest=manifest)
        assert s1.overflow and not manifest.is_done("p")
        # resume with enough capacity: the plane is retried and completes
        (_, s2), = run_batch(["p"], lambda k: plane, CFG, batch_size=1,
                             manifest=manifest)
        assert not s2.overflow and manifest.is_done("p")

    def test_corrupt_file_skipped_not_fatal(self, tmp_path, caplog):
        """One failing decode must not kill the stream: the bad plane is
        logged + skipped (and never marked done), every other plane's stats
        stay path-aligned, and a later resume retries only the bad one."""
        planes = {
            f"plane{i}": synthetic_label_plane(seed=i, shape=(96, 96))
            for i in range(3)
        }

        def load(key):
            if key == "plane1":
                raise OSError("truncated file")
            return planes[key]

        manifest = RunManifest(str(tmp_path / "m.jsonl"))
        got = dict(run_batch(list(planes), load, CFG, batch_size=2,
                             manifest=manifest))
        assert set(got) == {"plane0", "plane2"}
        from scipy import ndimage as ndi

        for key, s in got.items():  # alignment: stats match THEIR plane
            den = ndi.median_filter(planes[key], size=5)
            assert s.particle_px == int(np.sum(den == 2)), key
        assert manifest.is_done("plane0") and not manifest.is_done("plane1")
        # resume after the file is fixed: only plane1 is retried
        again = dict(run_batch(list(planes), lambda k: planes[k], CFG,
                               batch_size=2, manifest=manifest))
        assert set(again) == {"plane1"}

    def test_run_batch_on_error_raise_fails_fast(self):
        """Manifest-less callers can opt out of skip-and-continue: with
        on_error="raise" a decode failure propagates instead of silently
        thinning the output stream."""
        planes = {
            f"plane{i}": synthetic_label_plane(seed=i, shape=(96, 96))
            for i in range(3)
        }

        def load(key):
            if key == "plane1":
                raise OSError("truncated file")
            return planes[key]

        with pytest.raises(OSError, match="truncated"):
            dict(run_batch(list(planes), load, CFG, batch_size=2,
                           on_error="raise"))

    def test_prefetch_map_raises_by_default(self):
        with pytest.raises(OSError):
            list(prefetch_map(
                lambda s: (_ for _ in ()).throw(OSError(s)), ["x"]
            ))

    def test_pack_nibbles_rejects_wide_values(self):
        """Regression: a stray 0/255 mask silently corrupted BOTH pixels of
        each packed pair; out-of-range values must fail loudly."""
        from particle_col_image_segmentation_tpu.io.loader import (
            pack_nibbles, unpack_nibbles,
        )

        ok = np.arange(16, dtype=np.uint8).reshape(2, 8)
        rt = np.asarray(unpack_nibbles(jax.numpy.asarray(pack_nibbles(ok))))
        np.testing.assert_array_equal(rt, ok)
        with pytest.raises(ValueError, match="outside"):
            pack_nibbles(np.full((2, 8), 255, np.uint8))
        with pytest.raises(ValueError, match="even width"):
            pack_nibbles(np.zeros((2, 7), np.uint8))

    def test_derive_class_values(self):
        from particle_col_image_segmentation_tpu.models.batch import (
            derive_class_values,
        )

        sig = derive_class_values(
            {
                # single-file folder: strains read from the FILE name
                "/data/run/acq1": ["3D05_C3M10_scan.h5"],
                # multi-file folder: strains from the folder, channel per file
                "/data/3D05_6B07/acq2": [
                    "scan_RFP_x.h5",
                    "scan_DAPI_x.h5",
                ],
                # nothing derivable → defaults
                "/data/misc": ["plain.h5"],
            }
        )
        # {1:3D05, 2:C3M10, 3:Particle, 4:Background}
        assert sig["/data/run/acq1/3D05_C3M10_scan.h5"] == (3, (1, 2))
        # RFP with strains [3D05, 6B07] → {1:3D05, 2:Particle, 3:Background}
        assert sig["/data/3D05_6B07/acq2/scan_RFP_x.h5"] == (2, (1,))
        assert sig["/data/3D05_6B07/acq2/scan_DAPI_x.h5"] == (2, (1,))
        assert sig["/data/misc/plain.h5"] == (2, (1,))


class TestViz:
    def test_figures_written(self, tmp_path, monkeypatch):
        from particle_col_image_segmentation_tpu.models import analyze_plane
        from particle_col_image_segmentation_tpu.viz import (
            create_plot,
            create_single_plots,
            get_color_map,
            plot_original_vs_merged,
            visualize_dapi_overlap_results,
        )

        monkeypatch.chdir(tmp_path)
        cell_types = {1: "3D05", 2: "Particle", 3: "Background"}
        img = synthetic_label_plane(seed=6, cell_types=cell_types, shape=(96, 96))
        res = analyze_plane(img, cell_types, CFG, merged=True)
        cmap, norm = get_color_map(cell_types)
        create_single_plots(
            img, cmap, norm, "t", "out1", res.denoised, res.filled,
            cell_positions=res.cell_pos, cell_clusters=res.cell_clusters,
        )
        assert os.path.getsize("out1_plots.png") > 10000
        plot_original_vs_merged(
            res.denoised, res.merged_clusters, res.cell_clusters, cell_types,
            "t", "out2",
        )
        assert os.path.getsize("out2_cell_cluster_pos.png") > 10000
        create_plot(res.denoised, cmap, norm, "out3.png",
                    cell_positions=res.cell_pos, cell_clusters=res.cell_clusters)
        assert os.path.getsize("out3.png") > 10000
        other = np.where(img == 1, 2, img).astype(np.uint8)
        visualize_dapi_overlap_results(
            img, other, img, cmap, norm, cmap, norm, "t", "out4", "RFP"
        )
        assert os.path.getsize("out4_dapi_RFP_overlap.png") > 10000


class TestCLIParsing:
    def test_help_and_defaults(self, capsys):
        from particle_col_image_segmentation_tpu.cli import main

        with pytest.raises(SystemExit):
            main(["--help"])
        out = capsys.readouterr().out
        for sub in ("analyze", "split", "normalize", "refine", "nanosims", "bench"):
            assert sub in out

    def test_bad_subcommand(self):
        from particle_col_image_segmentation_tpu.cli import main

        with pytest.raises(SystemExit):
            main(["frobnicate"])

    def test_batch_subcommand_end_to_end(self, tmp_path, capsys):
        """CLI batch: recursive discovery → fused stats → manifest + CSV;
        a second invocation skips manifest-completed planes."""
        import csv

        import h5py

        from particle_col_image_segmentation_tpu.cli import main

        exp = tmp_path / "exp"
        exp.mkdir()
        for i in range(3):
            img = synthetic_label_plane(seed=40 + i, shape=(64, 64))
            with h5py.File(exp / f"3D05_p{i}_RFP.h5", "w") as f:
                f.create_dataset("exported_data", data=img[None])
        manifest = str(tmp_path / "m.json")
        stats_csv = str(tmp_path / "stats.csv")
        rc = main(
            ["batch", str(exp), "--batch-size", "2", "--manifest", manifest,
             "--csv", stats_csv, "--max-regions", "1023"]
        )
        assert rc == 0
        with open(stats_csv) as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["plane", "regions", "particle_px", "cell_px", "status"]
        assert len(rows) == 4 and all(int(r[1]) > 0 for r in rows[1:])
        assert all(r[4] == "ok" for r in rows[1:])
        capsys.readouterr()
        rc = main(
            ["batch", str(exp), "--batch-size", "2", "--manifest", manifest,
             "--max-regions", "1023"]
        )
        assert rc == 0
        # everything already done: no per-plane lines
        assert "regions=" not in capsys.readouterr().out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_run_batch_space_mesh_matches_single_device():
    """run_batch on a 4×2 data×space mesh (rows halo-exchange sharded) must
    yield identical per-plane stats to the single-device fused pass — the
    user-reachable spatial-sharding path (VERDICT r2 #2)."""
    from particle_col_image_segmentation_tpu.parallel.mesh import make_mesh

    planes = {
        f"p{i}": synthetic_label_plane(seed=90 + i, shape=(64, 64))
        for i in range(8)
    }
    mesh = make_mesh(n_data=4, n_space=2)
    got = dict(run_batch(list(planes), lambda k: planes[k], CFG,
                         batch_size=4, mesh=mesh))
    ref = dict(run_batch(list(planes), lambda k: planes[k], CFG, batch_size=4))
    assert set(got) == set(ref)
    for k in ref:
        assert got[k].num_regions == ref[k].num_regions
        assert got[k].particle_px == ref[k].particle_px
        assert got[k].cell_px == ref[k].cell_px
        assert got[k].converged == ref[k].converged
        np.testing.assert_array_equal(got[k].class_px, ref[k].class_px)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_run_batch_space_mesh_rejects_pack_transfer():
    from particle_col_image_segmentation_tpu.parallel.mesh import make_mesh

    planes = {"p0": synthetic_label_plane(seed=5, shape=(64, 64))}
    mesh = make_mesh(n_data=1, n_space=2)
    with pytest.raises(ValueError, match="pack_transfer"):
        list(run_batch(list(planes), lambda k: planes[k], CFG, batch_size=1,
                       mesh=mesh, pack_transfer=True))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_cli_batch_space_parallel_csv_byte_identical(tmp_path):
    """CLI `batch --data-parallel 4 --space-parallel 2` writes a CSV
    byte-identical to the single-device run (VERDICT r2 #2 done-criterion)."""
    import h5py

    from particle_col_image_segmentation_tpu.cli import main

    exp = tmp_path / "exp"
    exp.mkdir()
    for i in range(4):
        img = synthetic_label_plane(seed=70 + i, shape=(64, 64))
        with h5py.File(exp / f"3D05_p{i}_RFP.h5", "w") as f:
            f.create_dataset("exported_data", data=img[None])
    single_csv = tmp_path / "single.csv"
    sharded_csv = tmp_path / "sharded.csv"
    rc = main(["batch", str(exp), "--batch-size", "4",
               "--max-regions", "1023", "--csv", str(single_csv)])
    assert rc == 0
    rc = main(["batch", str(exp), "--batch-size", "4",
               "--max-regions", "1023", "--csv", str(sharded_csv),
               "--data-parallel", "4", "--space-parallel", "2"])
    assert rc == 0
    assert single_csv.read_bytes() == sharded_csv.read_bytes()
    assert b",ok" in single_csv.read_bytes()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_run_batch_mesh_matches_single_device():
    """run_batch(mesh=...) (shard_map data-parallel) must yield identical
    per-plane stats to the single-device path."""
    from particle_col_image_segmentation_tpu.parallel.mesh import make_mesh

    planes = {
        f"p{i}": synthetic_label_plane(seed=60 + i, shape=(64, 64))
        for i in range(8)
    }
    mesh = make_mesh(n_data=4, n_space=1)
    got = dict(
        (path, s)
        for path, s in run_batch(
            list(planes), lambda k: planes[k], CFG, batch_size=4, mesh=mesh
        )
    )
    ref = dict(
        (path, s)
        for path, s in run_batch(
            list(planes), lambda k: planes[k], CFG, batch_size=4
        )
    )
    assert set(got) == set(ref)
    for k in ref:
        assert got[k].num_regions == ref[k].num_regions
        assert got[k].particle_px == ref[k].particle_px
        assert got[k].cell_px == ref[k].cell_px
        np.testing.assert_array_equal(got[k].class_px, ref[k].class_px)
