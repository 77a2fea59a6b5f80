"""Distributed tree-reduction of per-block partials (r03 verdict #8).

``tree_fold`` collapses a Dataset of mergeable partial rows through
fan-in rounds: each round coalesces the stream into ~count/fanin blocks
and runs the caller's combiner once per block (``map_batches`` with
``batch_size=None`` = one whole block per call), until at most ``fanin``
rows remain for the caller's final driver merge. Driver cost becomes
O(fanin × row size) regardless of how many blocks produced partials —
the serial ``for row in take_all(): acc |= row`` loop this replaces is
O(blocks × row size) through one thread, which at 10⁵+ blocks dominates
the whole job.

Combiners must be associative+commutative (OR of Bloom bit blobs, sums
of fixed-size count grids, groupby-compaction of (key, cnt) tables).
For compaction combiners that cannot shrink below one row per distinct
key, the loop exits when a round stops making progress instead of
spinning.
"""

from __future__ import annotations

import math

__all__ = ["tree_fold"]


def tree_fold(partials_ds, combine_batch, *, fanin: int = 32):
    """Reduce ``partials_ds`` through distributed fan-in rounds.

    ``combine_batch(table) -> table`` merges one block's rows (ideally
    to a single row). Returns a MATERIALIZED dataset with ≤ ``fanin``
    rows when possible — the caller finishes with one tiny driver merge.
    """
    ds = partials_ds.materialize()
    n = ds.count()
    while n > fanin:
        nblocks = max(1, math.ceil(n / fanin))
        ds = (
            ds.repartition(nblocks)
            .map_batches(combine_batch, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        n2 = ds.count()
        if n2 >= n:  # compaction-style combiner hit its floor
            break
        n = n2
    return ds
