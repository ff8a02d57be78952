"""Pallas single-pass capped EDT (squared), VMEM-resident.

The XLA capped transform (ops/edt.py edt_sq) is a 2·cap+1-tap sublane
stencil over an HBM-resident dh² plane: every tap re-reads the plane, so at
cap=32 the phase-2 min-plus alone moves ~65 plane-reads of traffic and the
whole transform measured 6.4–9.4 ms at [32, 512²] in the refine graph
(docs/PERF.md round-4 prefix profiles).  This kernel computes BOTH phases
inside one VMEM band window — read the uint8 feature band (+cap-row halo)
once, log-doubling row distances and the unrolled column min-plus entirely
in VMEM, write the int32 dh² band once.  No fixpoint, no sweeps: a single
grid pass, output bit-identical to ``edt_sq`` (parity-tested, both
schedules compute the same exact capped distances).

Reference call sites this serves (via edt_sq_auto): refine marker seeding
(refine_boundaries.py:60 — the certified-exact probe), particle fill
(tiff_analysis.py:996, cap=20) and disk dilation (tiff_analysis.py:827-830
via EDT ≤ r).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["edt_sq_pallas", "edt_sq_auto"]


def _shift_lanes(x, dx: int, fill):
    """result[:, j] = x[:, j-dx] with ``fill`` shifted in at the edge."""
    W = x.shape[-1]
    out = jnp.roll(x, dx, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    bad = cols < dx if dx > 0 else cols >= W + dx
    return jnp.where(bad, fill, out)


def _edt_kernel(feat_hbm, out_ref, *, T, cap, pad, slot):
    """One [T, W] dh² output chunk from a [T+2·pad, W] feature window.

    Phase 1 (per-row, lane axis): bounded log-doubling min-plus — the same
    recurrence as ops.edt._doubling_dist, on every window row.  Phase 2
    (across rows, sublane axis): unrolled 2·cap+1 static sublane slices.
    Pad rows carry feature=0, so their row distance is exactly c1 and their
    dh² is c1² — the same +inf the XLA path pads with (bit-parity).
    """
    plane = pl.program_id(0)
    chunk = pl.program_id(1)
    start = plane * slot + chunk * T
    W = feat_hbm.shape[-1]
    win = T + 2 * pad
    c1 = cap + 1
    inf = c1 * c1

    def run(feat_s, sem):
        cp = pltpu.make_async_copy(
            feat_hbm.at[pl.ds(start, win), :], feat_s, sem
        )
        cp.start()
        cp.wait()
        # phase 1: capped row distance via log-doubling (both directions).
        # No i1 vectors: Mosaic rejects relayouts of stored bool masks
        # (ccl_tiles has the same rule), so the 0/1 feature byte maps to
        # {0, c1} arithmetically.
        x = feat_s[:, :].astype(jnp.int32)
        d0 = (1 - x) * c1
        df = d0
        db = d0
        s = 1
        while s < c1:
            df = jnp.minimum(df, _shift_lanes(df, s, c1) + s)
            db = jnp.minimum(db, _shift_lanes(db, -s, c1) + s)
            s *= 2
        dh = jnp.minimum(jnp.minimum(df, db), c1)
        dh2 = dh * dh
        # phase 2: min-plus over row offsets — static sublane slices
        off = pad - cap  # first window row feeding output row 0's stencil
        out = jnp.full((T, W), inf, jnp.int32)
        for dy in range(-cap, cap + 1):
            piece = dh2[off + cap + dy : off + cap + dy + T, :]
            out = jnp.minimum(out, piece + dy * dy)
        out_ref[0, :, :] = jnp.minimum(out, inf)

    pl.run_scoped(
        run,
        pltpu.VMEM((win, W), jnp.uint8),
        pltpu.SemaphoreType.DMA,
    )


@partial(jax.jit, static_argnames=("cap", "tile", "interpret"))
def edt_sq_pallas(
    feature: jnp.ndarray,
    cap: int,
    tile: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Squared distance to the nearest True of ``feature`` [..., H, W],
    exact for distances ≤ cap, saturating to (cap+1)² — bit-identical to
    ``ops.edt.edt_sq`` in one Pallas pass (see module docstring)."""
    batch_shape = feature.shape[:-2]
    H, W = feature.shape[-2:]
    B = 1
    for d in batch_shape:
        B *= d
    f3 = (feature != 0).reshape(B, H, W).astype(jnp.uint8)
    T = tile
    assert H % T == 0, (H, T)
    # per-plane slot: [pad ‖ H rows ‖ pad(+8-align tail)], pad rows are
    # feature-free (their dh² is the saturation value, matching the XLA
    # pad); pad ≥ cap keeps every phase-2 tap inside the owning slot
    pad = ((cap + 7) // 8) * 8
    slot = H + 2 * pad
    zeros = jnp.zeros((B, pad, W), jnp.uint8)
    feat_p = jnp.concatenate([zeros, f3, zeros], axis=1).reshape(B * slot, W)

    kernel = partial(_edt_kernel, T=T, cap=cap, pad=pad, slot=slot)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // T),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, T, W), lambda b, c: (b, c, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        interpret=interpret,
    )(feat_p)
    return out.reshape(feature.shape)


def edt_sq_auto(feature: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Capped squared EDT with backend dispatch: the single-pass Pallas band
    kernel on TPU (lane-aligned widths, band-divisible heights, cap big
    enough that the XLA stencil's HBM traffic dominates), the XLA stencil
    elsewhere.  Values are identical either way — both compute the exact
    capped transform — so callers may mix them freely."""
    from particle_col_image_segmentation_tpu.ops.edt import edt_sq

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    H, W = feature.shape[-2:]
    if on_tpu and cap > 8 and W % 128 == 0:
        for t in (64, 32, 16, 8):
            if H % t == 0:
                return edt_sq_pallas(feature, cap, tile=t)
    return edt_sq(feature, cap)
