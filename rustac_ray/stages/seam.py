"""Sorted-contiguous seam processing: the two-level alternative to
whole-group ``map_groups`` on a skewed key.

The pattern (shared by scene_gaps / rolling_window_counts /
session_windows, and the same one nearest_neighbor_join uses for cells):

1. ``sort`` the metadata triples by (key, order-col) — Ray's sort range-
   partitions them, so a 99%-of-rows key is SPREAD across partitions
   instead of landing on one task.
2. With ``preserve_order=True`` each map task receives a CONTIGUOUS slice
   of the global sorted stream, so key runs inside a batch are complete
   except at the two batch edges.
3. Each task emits per-run partials / final rows; only the O(batches)
   seam rows reach the driver, where they are merged.

``contiguous_run_bounds`` returns the run boundaries of a key column
inside one batch; ``preserve_order_execution`` is the context manager
every consumer must hold while the pipeline EXECUTES (execution options
are read at execution, not at pipeline-build time).
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np

__all__ = ["preserve_order_execution", "contiguous_run_bounds", "check_sorted_batch"]


@contextmanager
def preserve_order_execution():
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        yield
    finally:
        ctx.execution_options.preserve_order = prev


def contiguous_run_bounds(keys: np.ndarray) -> np.ndarray:
    """[0, run starts..., n] for a batch whose ``keys`` are grouped
    contiguously (guaranteed by sort + preserve_order)."""
    n = len(keys)
    if n == 0:
        return np.array([0], np.int64)
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    return np.concatenate([[0], change, [n]]).astype(np.int64)


def check_sorted_batch(keys: np.ndarray, order_vals: np.ndarray) -> bool:
    """True iff the batch is sorted by (key, order) — the contiguity
    precondition. A False here under preserve_order indicates an executor
    bundling bug; callers raise rather than silently mis-aggregate."""
    if len(keys) < 2:
        return True
    k_ok = ~(keys[1:] < keys[:-1])
    t_ok = (keys[1:] != keys[:-1]) | (order_vals[1:] >= order_vals[:-1])
    return bool(np.all(k_ok & t_ok))
