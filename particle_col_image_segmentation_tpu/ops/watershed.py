"""Marker-based watershed on TPU (two-phase minimax flooding).

Replaces skimage.segmentation.watershed (reference: refine_boundaries.py:73)
with an iteration-order-independent formulation in two confluent phases:

  1. **costs**: every masked pixel's minimax distance to the seed set —
     min over paths of the maximum relief along the path (Bellman-Ford-style
     relaxation of a min/max semilattice → unique fixpoint);
  2. **labels**: with costs FIXED, propagate the lexicographically smallest
     (geodesic step count, marker id) pair through "optimal edges" (n → p is
     optimal iff max(cost[n], img[p]) == cost[p]) — a lexicographic min is
     still a semilattice meet, so this remains a unique-fixpoint phase.

The distance component is the plateau tie-breaker: skimage's priority flood
claims equal-cost plateaus by arrival order (BFS from the entry points), so
"nearest marker along an optimal path, then smallest id" tracks it far more
closely than a bare min-id (which hands every plateau to marker 1).

A joint (cost, label) relaxation is monotone but NOT confluent (a label can
ratchet onto a justification that later disappears), so different schedules
(Jacobi vs Gauss-Seidel, XLA vs Pallas) would disagree; the two-phase split
makes every schedule produce identical output.  Agreement with skimage's
sequential priority flood is by boundary IoU (exact queue-order ties still
differ; BASELINE.json contract).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["watershed", "watershed_auto"]

_INF = 3.4e38
_BIG_LAB = jnp.iinfo(jnp.int32).max


def _offsets(connectivity: int):
    offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 2:
        offsets += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    return offsets


def _shifted(x, dy, dx, fill):
    H, W = x.shape
    sl_src = (
        slice(max(0, -dy), H - max(0, dy)),
        slice(max(0, -dx), W - max(0, dx)),
    )
    sl_dst = (
        slice(max(0, dy), H - max(0, -dy)),
        slice(max(0, dx), W - max(0, -dx)),
    )
    return jnp.full((H, W), fill, x.dtype).at[sl_dst].set(x[sl_src])


@partial(jax.jit, static_argnames=("connectivity", "max_iters", "with_flag"))
def watershed(
    image: jnp.ndarray,
    markers: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    connectivity: int = 1,
    max_iters: int = 1024,
    with_flag: bool = False,
) -> jnp.ndarray:
    """Flood ``markers`` over the relief ``image`` within ``mask``.

    Args:
      image: [H, W] relief (e.g. boundary probability).
      markers: [H, W] int marker labels (>0 seeds, 0 elsewhere).
      mask: optional [H, W] bool; pixels outside stay 0.
      connectivity: 1 (4-neighbors, skimage default) or 2 (8).
      with_flag: also return a bool ``converged`` — False means a phase hit
        ``max_iters`` with work left (huge/winding basins); unreached in-mask
        pixels would then silently read 0, so callers must surface it.

    Returns [H, W] int32 labels.
    """
    H, W = image.shape
    img = image.astype(jnp.float32)
    lab0 = markers.astype(jnp.int32)
    m = jnp.ones((H, W), bool) if mask is None else mask.astype(bool)
    seeded = (lab0 > 0) & m
    cost0 = jnp.where(seeded, img, jnp.float32(_INF))
    offsets = _offsets(connectivity)

    # ---- phase 1: minimax costs --------------------------------------
    def cost_body(state):
        cost, _, i = state
        best = cost
        for dy, dx in offsets:
            nc = _shifted(cost, dy, dx, jnp.float32(_INF))
            best = jnp.minimum(best, jnp.maximum(nc, img))
        new = jnp.where(seeded, cost0, jnp.where(m, best, jnp.float32(_INF)))
        return new, jnp.any(new != cost), i + 1

    def cond(state):
        _, changed, i = state
        return changed & (i < max_iters)

    cost, c_changed, _ = jax.lax.while_loop(
        cond, cost_body, (cost0, jnp.bool_(True), 0)
    )

    # ---- phase 2: lexicographic (dist, label) over optimal edges -----
    lab_init = jnp.where(seeded, lab0, _BIG_LAB)
    dist_init = jnp.where(seeded, 0, _BIG_LAB)

    def lab_body(state):
        lab, dist, _, i = state
        best_l, best_d = lab, dist
        for dy, dx in offsets:
            nc = _shifted(cost, dy, dx, jnp.float32(_INF))
            nl = _shifted(lab, dy, dx, _BIG_LAB)
            nd = _shifted(dist, dy, dx, _BIG_LAB)
            optimal = jnp.maximum(nc, img) == cost
            cand_d = jnp.where(optimal & (nd < _BIG_LAB), nd + 1, _BIG_LAB)
            cand_l = jnp.where(optimal, nl, _BIG_LAB)
            take = (cand_d < best_d) | ((cand_d == best_d) & (cand_l < best_l))
            best_d = jnp.where(take, cand_d, best_d)
            best_l = jnp.where(take, cand_l, best_l)
        new_l = jnp.where(seeded, lab0, jnp.where(m, best_l, _BIG_LAB))
        new_d = jnp.where(seeded, 0, jnp.where(m, best_d, _BIG_LAB))
        ch = jnp.any(new_l != lab) | jnp.any(new_d != dist)
        return new_l, new_d, ch, i + 1

    def lab_cond(state):
        _, _, changed, i = state
        return changed & (i < max_iters)

    lab, _, l_changed, _ = jax.lax.while_loop(
        lab_cond, lab_body, (lab_init, dist_init, jnp.bool_(True), 0)
    )
    reached = m & (cost < _INF) & (lab != _BIG_LAB)
    out = jnp.where(reached, lab, 0)
    if with_flag:
        return out, ~(c_changed | l_changed)
    return out

def watershed_auto(
    image: jnp.ndarray,
    markers: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    connectivity: int = 1,
    with_flag: bool = False,
) -> jnp.ndarray:
    """watershed with automatic kernel selection: the Pallas band sweeps on
    TPU backends (band-divisible heights), the XLA fixpoint elsewhere.
    Both produce identical labels (two-phase confluence).  ``with_flag=True``
    appends a bool ``converged``."""
    backend = jax.default_backend()
    H, W = image.shape[-2:]
    tile = next((t for t in (64, 32, 16, 8) if H % t == 0), None)
    # band DMAs need lane-aligned widths (Mosaic memref slicing), same
    # gating as connected_components_auto
    if tile is None or W % 128 != 0 or backend in ("cpu", "gpu"):
        return watershed(
            image, markers, mask, connectivity=connectivity, with_flag=with_flag
        )
    from particle_col_image_segmentation_tpu.ops.watershed_tiles import (
        watershed_sweeps,
    )

    return watershed_sweeps(
        image, markers, mask, connectivity=connectivity, tile=tile,
        with_flag=with_flag,
    )
