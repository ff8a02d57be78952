"""Pipeline-stage tracing (SURVEY.md §5: build jax.profiler annotations +
MP/s counters; the reference has none)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

from particle_col_image_segmentation_tpu.utils.logging import get_logger

_log = get_logger("profile")

# cumulative wall time per stage name for this process
STAGE_TOTALS: Dict[str, float] = {}


@contextlib.contextmanager
def stage(name: str, megapixels: Optional[float] = None) -> Iterator[None]:
    """Annotate a pipeline stage: a jax.profiler TraceAnnotation (visible in
    XLA traces) plus wall-time / MP/s accounting."""
    import jax

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    STAGE_TOTALS[name] = STAGE_TOTALS.get(name, 0.0) + dt
    if megapixels is not None and dt > 0:
        _log.debug("%s: %.1f ms (%.1f MP/s)", name, dt * 1e3, megapixels / dt)
    else:
        _log.debug("%s: %.1f ms", name, dt * 1e3)
