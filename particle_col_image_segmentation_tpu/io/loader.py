"""Prefetching batch loader: host decode overlapped with device compute.

Host-side pipeline parallelism (SURVEY.md §2.8): a thread pool decodes
TIFF/HDF5 planes ahead of the device while the current batch computes, and
batches are shipped with ``jax.device_put`` ahead of use.  This replaces the
reference's synchronous per-file loop (tiff_analysis.py:107-153).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Iterator, List, Sequence

import numpy as np


def prefetch_map(
    load_fn: Callable[[str], np.ndarray],
    paths: Sequence[str],
    num_workers: int = 4,
    prefetch: int = 8,
) -> Iterator[np.ndarray]:
    """Yield ``load_fn(path)`` in order with ``prefetch`` loads in flight."""
    with cf.ThreadPoolExecutor(num_workers) as pool:
        futures: List[cf.Future] = []
        it = iter(paths)
        for _ in range(prefetch):
            try:
                futures.append(pool.submit(load_fn, next(it)))
            except StopIteration:
                break
        while futures:
            done = futures.pop(0)
            try:
                futures.append(pool.submit(load_fn, next(it)))
            except StopIteration:
                pass
            yield done.result()


def pack_nibbles(arr: np.ndarray) -> np.ndarray:
    """Host-side 4-bit packing of a label batch [..., W] (values < 16,
    W even) → [..., W/2] uint8: halves the host→device transfer."""
    a = arr.astype(np.uint8)
    return (a[..., 0::2] << 4) | a[..., 1::2]


def unpack_nibbles(packed, dtype=None):
    """Device-side inverse of pack_nibbles: [..., W/2] → [..., W]."""
    import jax.numpy as jnp

    hi = (packed >> 4) & 0xF
    lo = packed & 0xF
    out = jnp.stack([hi, lo], axis=-1).reshape(packed.shape[:-1] + (-1,))
    return out if dtype is None else out.astype(dtype)


def batched_device_iterator(
    load_fn: Callable[[str], np.ndarray],
    paths: Sequence[str],
    batch_size: int,
    num_workers: int = 4,
    sharding=None,
    pad_to_full: bool = True,
    pack: bool = False,
) -> Iterator[tuple]:
    """Yield (device_batch [B,H,W], count) with decode + transfer pipelined.

    The final short batch is padded by repeating its last plane (count tells
    the consumer how many rows are real) so every step reuses one compiled
    shape.  ``sharding`` (e.g. NamedSharding over the mesh data axis) places
    the batch directly in its sharded layout.  ``pack`` ships label planes
    as 4-bit nibbles (values < 16, even width) — half the PCIe/relay bytes;
    the consumer unpacks on device (io.loader.unpack_nibbles).
    """
    import jax

    def ship(batch: List[np.ndarray]):
        n = len(batch)
        if pad_to_full and n < batch_size:
            batch = batch + [batch[-1]] * (batch_size - n)
        arr = np.stack(batch)
        if pack:
            arr = pack_nibbles(arr)
        if sharding is not None:
            return jax.device_put(arr, sharding), n
        return jax.device_put(arr), n

    batch: List[np.ndarray] = []
    pending = None
    for plane in prefetch_map(load_fn, paths, num_workers=num_workers,
                              prefetch=2 * batch_size):
        batch.append(plane)
        if len(batch) == batch_size:
            if pending is not None:
                yield pending
            pending = ship(batch)  # transfer overlaps the consumer's compute
            batch = []
    if batch:
        if pending is not None:
            yield pending
        pending = ship(batch)
    if pending is not None:
        yield pending
