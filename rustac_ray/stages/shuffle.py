"""Deterministic global shuffle + training-shard writer.

The last step of a training-data pipeline is materializing SHUFFLED
shards. ``Dataset.random_shuffle`` is an all-to-all exchange with
non-reproducible output — a re-run after a mid-job failure produces a
different order, defeating resume. This module shuffles by a
DETERMINISTIC hash order instead:

    order = (key * 2654435761) mod 2^32   (Knuth multiplicative hash,
                                           the same SQL-twin-able hash
                                           stages/sampling.py uses)

- same statistical decorrelation from the original layout as a random
  permutation for id-like keys;
- reproducible across runs, block layouts and cluster sizes → resumable
  shard writes (skip finished shards via the lineage manifest) and an
  exact ANSI-SQL oracle (``row_number() OVER (ORDER BY hash, key)``);
- executes as one range-partitioned ``ds.sort`` — the one unavoidable
  all-to-all, balanced by Ray's sort sampling, moving each row once.

``salt`` gives a different-but-still-deterministic epoch order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["deterministic_shuffle", "shuffle_positions", "write_training_shards", "iter_training_batches"]

_KNUTH = 2654435761
_MOD32 = 1 << 32


def _order_key(keys: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (
            (keys.astype(np.uint64) + np.uint64(salt)) * np.uint64(_KNUTH)
        ) % np.uint64(_MOD32)


def deterministic_shuffle(ds, key_col: str, *, salt: int = 0):
    """→ the dataset globally ordered by the shuffle hash (ties by key).

    One range-partitioned sort; the temporary ``__shuffle`` column is
    dropped after ordering. Requires a non-negative integer key column.
    """

    def add(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__shuffle", pa.array(_order_key(keys, salt).astype(np.int64))
        )

    out = ds.map_batches(add, batch_format="pyarrow").sort(["__shuffle", key_col])
    return out.drop_columns(["__shuffle"])


def shuffle_positions(ds, key_col: str, *, salt: int = 0, rows_per_shard: int = 100):
    """→ pandas DataFrame (key_col, shard, pos_in_shard) for the
    deterministic shuffle order.

    Global positions are inherently sequential metadata: the sorted
    blocks are STREAMED past the driver in order and offsets assigned
    incrementally (O(1) driver state) — the data itself was ordered by
    the distributed sort. Matches the SQL
    ``row_number() OVER (ORDER BY hash, key)`` exactly.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        shuffled = deterministic_shuffle(ds, key_col, salt=salt)
        keys, shards, poss = [], [], []
        pos = 0
        for b in shuffled.iter_batches(batch_format="pyarrow"):
            k = b[key_col].to_numpy(zero_copy_only=False)
            idx = pos + np.arange(len(k), dtype=np.int64)
            keys.append(k)
            shards.append(idx // rows_per_shard)
            poss.append(idx % rows_per_shard)
            pos += len(k)
    finally:
        ctx.execution_options.preserve_order = prev
    if not keys:
        return pd.DataFrame({key_col: [], "shard": [], "pos_in_shard": []})
    return pd.DataFrame(
        {
            key_col: np.concatenate(keys),
            "shard": np.concatenate(shards),
            "pos_in_shard": np.concatenate(poss),
        }
    )


def write_training_shards(
    ds,
    out_dir: str,
    key_col: str,
    *,
    salt: int = 0,
    rows_per_shard: int = 10_000,
    resume: bool = True,
):
    """Deterministic-shuffle the dataset and write it as resumable
    partitioned parquet shards (lineage manifest; finished shards are
    skipped on re-run — the reproducible order is what makes the resume
    semantics exact). Returns the manifest records."""
    from ..state.manifest import write_partitioned

    shuffled = deterministic_shuffle(ds, key_col, salt=salt).repartition(
        max(ds.count() // rows_per_shard, 1)
    )
    return write_partitioned(shuffled, out_dir, resume=resume)


def iter_training_batches(
    ds,
    key_col: str,
    *,
    epochs: int = 1,
    batch_size: int = 1024,
    base_salt: int = 0,
    batch_format: str = "pyarrow",
):
    """Multi-epoch training iterator: epoch e streams the dataset in the
    ``salt = base_salt + e`` deterministic-shuffle order.

    Each epoch is one fresh range-partitioned sort of the lazy dataset —
    no epoch ever materializes, and a restarted job replays the exact
    same batch sequence (the property random_shuffle cannot give).
    Yields (epoch, batch).
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        for epoch in range(epochs):
            shuffled = deterministic_shuffle(ds, key_col, salt=base_salt + epoch)
            for batch in shuffled.iter_batches(
                batch_size=batch_size, batch_format=batch_format
            ):
                yield epoch, batch
    finally:
        ctx.execution_options.preserve_order = prev
