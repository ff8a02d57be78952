"""Tests: native C++ TIFF codec + prefetch pool vs the PIL codec."""

import numpy as np
import pytest

from particle_col_image_segmentation_tpu.io import native
from particle_col_image_segmentation_tpu.io.tiff import read_tiff_stack, write_tiff

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native io unavailable (no g++)"
)


def test_roundtrip_native(tmp_path):
    for dtype in (np.uint8, np.uint16):
        arr = np.random.default_rng(0).integers(
            0, np.iinfo(dtype).max, (48, 64)
        ).astype(dtype)
        p = str(tmp_path / f"x_{dtype.__name__}.tif")
        assert native.write_tiff(p, arr)
        back = native.read_tiff(p)
        np.testing.assert_array_equal(back, arr)


def test_native_read_matches_pil(tmp_path):
    from PIL import Image

    arr = np.random.default_rng(1).integers(0, 65535, (32, 40)).astype(np.uint16)
    p = str(tmp_path / "pil.tif")
    Image.fromarray(arr).save(p)  # PIL writes uncompressed by default
    got = native.read_tiff(p)
    if got is None:
        pytest.skip("PIL wrote a layout the native codec rejects (fallback works)")
    np.testing.assert_array_equal(got, arr)


def test_mixed_page_sizes_rejected(tmp_path):
    """Regression: multipage TIFFs whose pages differ in geometry (embedded
    thumbnails / pyramid levels) were packed misaligned into the
    (pages, h0, w0) buffer; the codec must punt them to the PIL fallback."""
    from PIL import Image

    big = Image.fromarray(np.zeros((16, 20), np.uint8))
    small = Image.fromarray(np.ones((8, 10), np.uint8))
    p = str(tmp_path / "mixed.tif")
    big.save(p, save_all=True, append_images=[small])
    assert native.read_tiff(p) is None  # → tiff.read_tiff_stack uses PIL


def test_pil_reads_native_output(tmp_path):
    from PIL import Image

    arr = np.random.default_rng(2).integers(0, 255, (20, 24)).astype(np.uint8)
    p = str(tmp_path / "native.tif")
    assert native.write_tiff(p, arr)
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, arr)


def test_tiff_io_uses_native_path(tmp_path):
    arr = np.random.default_rng(3).integers(0, 65535, (16, 128)).astype(np.uint16)
    p = str(tmp_path / "via_api.tif")
    write_tiff(p, arr)
    np.testing.assert_array_equal(read_tiff_stack(p), arr)


def test_prefetcher(tmp_path):
    arrays = []
    paths = []
    for i in range(6):
        a = np.random.default_rng(i).integers(0, 255, (32, 32)).astype(np.uint8)
        p = str(tmp_path / f"f{i}.tif")
        assert native.write_tiff(p, a)
        arrays.append(a)
        paths.append(p)
    pf = native.NativePrefetcher(paths, num_threads=3)
    # out-of-order consumption
    for idx in (3, 0, 5, 1, 4, 2):
        got = pf.get(idx)
        np.testing.assert_array_equal(got, arrays[idx])
    pf.close()


def test_unsupported_returns_none(tmp_path):
    p = tmp_path / "not_a_tiff.tif"
    p.write_bytes(b"garbage data not tiff")
    assert native.read_tiff(str(p)) is None


class TestCompressedAndExoticLayouts:
    """Native decode of real-world microscope TIFF layouts the reference
    reads via tifffile (split_zstack.py:50-51): LZW, deflate, horizontal
    predictor, tiled pages, BigTIFF, multi-page 16-bit."""

    @pytest.mark.parametrize("comp", ["tiff_lzw", "tiff_adobe_deflate"])
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    def test_pil_written_compressed(self, tmp_path, comp, dtype):
        from PIL import Image

        arr = np.random.default_rng(11).integers(
            0, np.iinfo(dtype).max, (70, 90)
        ).astype(dtype)
        p = str(tmp_path / f"{comp}_{dtype.__name__}.tif")
        Image.fromarray(arr).save(p, compression=comp)
        got = native.read_tiff(p)
        assert got is not None, "native codec rejected a compressed TIFF"
        np.testing.assert_array_equal(got, arr)

    def test_multipage_16bit_lzw(self, tmp_path):
        from PIL import Image

        stacks = [
            np.random.default_rng(i).integers(0, 65535, (24, 30)).astype(np.uint16)
            for i in range(4)
        ]
        p = str(tmp_path / "zstack_lzw.tif")
        ims = [Image.fromarray(a) for a in stacks]
        ims[0].save(p, save_all=True, append_images=ims[1:], compression="tiff_lzw")
        got = native.read_tiff(p)
        assert got is not None and got.shape == (4, 24, 30)
        np.testing.assert_array_equal(got, np.stack(stacks))

    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    @pytest.mark.parametrize(
        "kw",
        [
            dict(compression=8, predictor=2, rows_per_strip=16),
            dict(compression=8, tile=(32, 16)),
            dict(compression=8, predictor=2, tile=(16, 32)),
            dict(bigtiff=True, rows_per_strip=20),
            dict(compression=8, bigtiff=True, rows_per_strip=33),
            dict(compression=8, predictor=2, tile=(32, 32), bigtiff=True),
        ],
        ids=["pred2", "tiled", "tiled-pred2", "bigtiff", "bigtiff-deflate",
             "bigtiff-tiled-pred2"],
    )
    def test_crafted_layouts(self, tmp_path, dtype, kw):
        from fixtures import craft_tiff

        arr = np.random.default_rng(13).integers(
            0, np.iinfo(dtype).max, (70, 90)
        ).astype(dtype)
        p = str(tmp_path / "crafted.tif")
        craft_tiff(p, arr, **kw)
        got = native.read_tiff(p)
        assert got is not None, f"native codec rejected layout {kw}"
        np.testing.assert_array_equal(got, arr)

    def test_crafter_matches_pil(self, tmp_path):
        """The crafter itself is validated against PIL's independent reader
        (so crafted-layout tests aren't self-referential)."""
        from PIL import Image

        from fixtures import craft_tiff

        arr = np.random.default_rng(17).integers(0, 255, (70, 90)).astype(np.uint8)
        for kw in (
            dict(compression=8, predictor=2, rows_per_strip=16),
            dict(compression=8, tile=(32, 16)),
        ):
            p = str(tmp_path / "check.tif")
            craft_tiff(p, arr, **kw)
            np.testing.assert_array_equal(np.asarray(Image.open(p)), arr)

    def test_prefetcher_compressed(self, tmp_path):
        """Prefetch pool decodes compressed files; geometry comes from the
        workers (no up-front serial inspect — ADVICE r1 medium)."""
        from PIL import Image

        arrays, paths = [], []
        for i in range(5):
            a = np.random.default_rng(20 + i).integers(0, 65535, (40, 40)).astype(np.uint16)
            p = str(tmp_path / f"c{i}.tif")
            Image.fromarray(a).save(p, compression="tiff_lzw")
            arrays.append(a)
            paths.append(p)
        pf = native.NativePrefetcher(paths, num_threads=2)
        for idx in (4, 1, 0, 3, 2):
            np.testing.assert_array_equal(pf.get(idx), arrays[idx])
        pf.close()


class TestMaliciousTiffs:
    """Crafted hostile inputs must fail cleanly (None / error code), never
    read or write out of bounds, allocate unboundedly, or kill the process
    (review r2: wrap-prone 'off + k <= n' bounds tests, untrusted resize)."""

    @staticmethod
    def _classic(entries, extra=b""):
        import struct

        ifd_off = 8
        out = struct.pack("<2sHI", b"II", 42, ifd_off)
        out += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            out += struct.pack("<HHII", tag, typ, cnt, val)
        out += struct.pack("<I", 0)
        return out + extra

    @staticmethod
    def _bigtiff(entries, ifd_off=16, extra=b""):
        import struct

        out = struct.pack("<2sHHHQ", b"II", 43, 8, 0, ifd_off)
        if ifd_off == 16:
            out += struct.pack("<Q", len(entries))
            for tag, typ, cnt, val in entries:
                out += struct.pack("<HHQQ", tag, typ, cnt, val)
            out += struct.pack("<Q", 0)
        return out + extra

    def _inspect(self, tmp_path, blob):
        p = str(tmp_path / "evil.tif")
        with open(p, "wb") as f:
            f.write(blob)
        return p, native.read_tiff(p)

    def test_wrapping_ifd_offset(self, tmp_path):
        # first-IFD offset near 2^64: 'off + 8 <= n' would wrap and pass
        _, out = self._inspect(
            tmp_path, self._bigtiff([], ifd_off=0xFFFFFFFFFFFFFFFE)
        )
        assert out is None

    def test_wrapping_strip_offset(self, tmp_path):
        # valid geometry, strip offset near 2^64 with small count: the
        # segment bound 'off + cnt > n' would wrap to a tiny value and pass,
        # then decode reads ~2^64 past the mapping
        entries = [
            (256, 4, 1, 4), (257, 4, 1, 4), (258, 3, 1, 8), (259, 3, 1, 1),
            (277, 3, 1, 1), (278, 4, 1, 4),
            (273, 16, 1, 0xFFFFFFFFFFFFFFF0), (279, 16, 1, 0x20),
        ]
        _, out = self._inspect(tmp_path, self._bigtiff(entries))
        assert out is None

    def test_huge_strip_count_no_alloc(self, tmp_path):
        # tag 273 claiming 2^32-1 strips would resize a 32 GiB vector
        entries = [
            (256, 4, 1, 4), (257, 4, 1, 4), (258, 3, 1, 8), (259, 3, 1, 1),
            (273, 4, 0xFFFFFFFF, 8), (279, 4, 1, 16),
        ]
        _, out = self._inspect(tmp_path, self._classic(entries))
        assert out is None

    def test_overflowing_dimensions(self, tmp_path):
        # width*height*pix wrapping uint64 would pass the output-size check
        # with a tiny wrapped value and then memcpy far out of bounds
        entries = [
            (256, 4, 1, 0x80000001), (257, 4, 1, 0xFFFFFFFF),
            (258, 3, 1, 16), (259, 3, 1, 1), (277, 3, 1, 1),
            (273, 4, 1, 8), (279, 4, 1, 16),
        ]
        _, out = self._inspect(tmp_path, self._classic(entries))
        assert out is None

    def test_prefetcher_use_after_close_raises(self, tmp_path):
        from PIL import Image

        a = np.zeros((8, 8), np.uint8)
        p = str(tmp_path / "a.tif")
        Image.fromarray(a).save(p)
        pf = native.NativePrefetcher([p], num_threads=1)
        pf.close()
        with pytest.raises(RuntimeError, match="after close"):
            pf.get(0)
