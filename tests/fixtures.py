"""Synthetic label-plane generators for parity tests.

Planes mimic the Ilastik label maps the reference consumes
(tiff_analysis.py module docstring): small-int class ids where strains get
1..n, Particle n+1, Background n+2.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def paint_disk(arr: np.ndarray, cy: int, cx: int, r: int, value: int) -> None:
    H, W = arr.shape
    y0, y1 = max(0, cy - r), min(H, cy + r + 1)
    x0, x1 = max(0, cx - r), min(W, cx + r + 1)
    yy, xx = np.mgrid[y0:y1, x0:x1]
    m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    arr[y0:y1, x0:x1][m] = value


def synthetic_label_plane(
    shape=(192, 192),
    cell_types: Dict[int, str] | None = None,
    seed: int = 0,
    n_particles: int = 2,
    n_cells_per_strain: int = 14,
    n_clusters_per_strain: int = 2,
) -> np.ndarray:
    """Random plane with particles, single cells, and clusters.

    Background fills everything else. Cells are painted near particles so the
    particle-fill path has work to do.
    """
    if cell_types is None:
        cell_types = {1: "3D05", 2: "Particle", 3: "Background"}
    strain_vals = [v for v, n in cell_types.items() if n not in ("Particle", "Background")]
    particle_val = [v for v, n in cell_types.items() if n == "Particle"][0]
    background_val = [v for v, n in cell_types.items() if n == "Background"][0]

    rng = np.random.default_rng(seed)
    H, W = shape
    arr = np.full(shape, background_val, dtype=np.uint8)
    centers = []
    for _ in range(n_particles):
        cy, cx = rng.integers(H // 4, 3 * H // 4), rng.integers(W // 4, 3 * W // 4)
        paint_disk(arr, int(cy), int(cx), int(rng.integers(18, 30)), particle_val)
        centers.append((int(cy), int(cx)))
    for v in strain_vals:
        for _ in range(n_cells_per_strain):
            base = centers[rng.integers(0, len(centers))]
            cy = int(np.clip(base[0] + rng.integers(-60, 60), 2, H - 3))
            cx = int(np.clip(base[1] + rng.integers(-60, 60), 2, W - 3))
            paint_disk(arr, cy, cx, int(rng.integers(2, 4)), v)
        for _ in range(n_clusters_per_strain):
            cy = int(rng.integers(12, H - 12))
            cx = int(rng.integers(12, W - 12))
            paint_disk(arr, cy, cx, int(rng.integers(9, 13)), v)
    return arr


def random_class_plane(shape=(96, 96), n_classes: int = 5, seed: int = 0) -> np.ndarray:
    """Speckle plane: random class per pixel then a light smoothing pass, to
    stress CCL/median with many tiny regions."""
    rng = np.random.default_rng(seed)
    arr = rng.integers(1, n_classes + 1, size=shape).astype(np.uint8)
    return arr


def random_binary(shape=(128, 128), p: float = 0.3, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.random(shape) < p


# ---------------------------------------------------------------------------
# hand-crafted TIFF writer for codec tests (deflate / predictor / tiles /
# BigTIFF — layouts PIL cannot or will not write).  Validated against PIL's
# independent reader in test_native_io.py.
# ---------------------------------------------------------------------------

def _diff_predict(arr: np.ndarray) -> np.ndarray:
    out = arr.astype(np.int64).copy()
    out[:, 1:] = out[:, 1:] - out[:, :-1]
    return out.astype(arr.dtype)


def craft_tiff(path, arr, *, compression=1, predictor=1, tile=None,
               bigtiff=False, rows_per_strip=None):
    """Write [H,W] uint8/uint16 as LE classic or BigTIFF, strip or tiled,
    uncompressed (1) or deflate (8), optional horizontal predictor (2)."""
    import struct
    import zlib

    h, w = arr.shape
    bps = arr.dtype.itemsize * 8
    segs = []
    if tile is None:
        rps = rows_per_strip or h
        for r0 in range(0, h, rps):
            seg = arr[r0:r0 + rps]
            if predictor == 2:
                seg = _diff_predict(seg)
            raw = seg.astype('<' + arr.dtype.str[1:]).tobytes()
            segs.append(zlib.compress(raw) if compression == 8 else raw)
    else:
        tw, th = tile
        assert tw % 16 == 0 and th % 16 == 0
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                t = np.zeros((th, tw), arr.dtype)
                blk = arr[ty:ty + th, tx:tx + tw]
                t[:blk.shape[0], :blk.shape[1]] = blk
                if predictor == 2:
                    t = _diff_predict(t)
                raw = t.astype('<' + arr.dtype.str[1:]).tobytes()
                segs.append(zlib.compress(raw) if compression == 8 else raw)

    entries = []

    def E(tag, typ, vals):
        entries.append((tag, typ, vals if isinstance(vals, list) else [vals]))

    E(256, 4, w); E(257, 4, h); E(258, 3, bps); E(259, 3, compression)
    E(262, 3, 1); E(277, 3, 1)
    if predictor == 2:
        E(317, 3, predictor)
    if tile is None:
        E(278, 4, rows_per_strip or h)
        off_tag, cnt_tag = 273, 279
    else:
        E(322, 3, tile[0]); E(323, 3, tile[1])
        off_tag, cnt_tag = 324, 325

    hdr = 16 if bigtiff else 8
    seg_offsets, cur = [], hdr
    for s in segs:
        seg_offsets.append(cur)
        cur += len(s) + (len(s) & 1)
    E(off_tag, 16 if bigtiff else 4, seg_offsets)
    E(cnt_tag, 16 if bigtiff else 4, [len(s) for s in segs])
    entries.sort()
    ifd_off = cur

    TYPE_SZ = {3: 2, 4: 4, 16: 8}
    FMT = {3: '<H', 4: '<I', 16: '<Q'}
    inline_cap = 8 if bigtiff else 4
    entry_sz = 20 if bigtiff else 12
    n = len(entries)
    ifd_size = (8 + entry_sz * n + 8) if bigtiff else (2 + entry_sz * n + 4)
    ext_off = ifd_off + ifd_size
    ifd = struct.pack('<Q', n) if bigtiff else struct.pack('<H', n)
    ext = b''
    for tag, typ, vals in entries:
        sz = TYPE_SZ[typ] * len(vals)
        payload = b''.join(struct.pack(FMT[typ], v) for v in vals)
        ifd += struct.pack('<HH', tag, typ)
        ifd += struct.pack('<Q', len(vals)) if bigtiff else struct.pack('<I', len(vals))
        if sz <= inline_cap:
            ifd += payload + b'\0' * (inline_cap - sz)
        else:
            ifd += struct.pack('<Q' if bigtiff else '<I', ext_off)
            ifd += b'\0' * (inline_cap - (8 if bigtiff else 4))
            ext += payload
            ext_off += sz
    ifd += struct.pack('<Q', 0) if bigtiff else struct.pack('<I', 0)

    with open(path, 'wb') as f:
        if bigtiff:
            f.write(b'II' + struct.pack('<HHHQ', 43, 8, 0, ifd_off))
        else:
            f.write(b'II' + struct.pack('<HI', 42, ifd_off))
        for s in segs:
            f.write(s)
            if len(s) & 1:
                f.write(b'\0')
        f.write(ifd)
        f.write(ext)
