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
