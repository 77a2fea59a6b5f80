"""Checkpoint manifest + resumable partitioned output (SURVEY.md A4, §4).

Output layout: ``out/part-{partition_id:05d}.parquet`` + ``_manifest.jsonl`` (underscore-prefixed so parquet
dataset discovery skips it, like Spark's _SUCCESS markers)
where each line is one completed partition's lineage record::

    {"partition_id": 3, "rows": 12345, "input_fragments": [...],
     "digest": "<order-insensitive content hash>"}

``write_partitioned`` maps each input block through a writer task that
writes its partition file ATOMICALLY (tmp name + rename) and returns the
lineage record; the driver appends records to the manifest as they stream
in. On resume, completed partition ids are read from the manifest and those
partitions are SKIPPED (the driver filters the work list) — exact-once
output without re-running finished work, which is what "resumable from
checkpoint mid-shuffle" means for a batch pipeline.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["Manifest", "write_partitioned", "content_digest"]


def content_digest(table: pa.Table, key_cols: list[str] | None = None) -> str:
    """Order-insensitive digest: vectorized per-row hashes XOR-folded
    (pandas' siphash with its fixed default key is deterministic across
    runs and machines; XOR makes the fold row-order-independent, so a
    re-written partition compares equal regardless of block order)."""
    import numpy as np
    import pandas as pd

    cols = key_cols or table.column_names
    df = table.select(cols).to_pandas()
    if len(df) == 0:
        return f"{0:016x}"
    for c in df.columns:
        # list/struct columns come back as unhashable python containers —
        # canonicalize them to json strings before the vectorized row hash
        if df[c].dtype == object and df[c].map(
            lambda v: isinstance(v, (list, dict, np.ndarray))
        ).any():
            df[c] = df[c].map(
                lambda v: json.dumps(
                    v.tolist() if isinstance(v, np.ndarray) else v,
                    sort_keys=True,
                    default=str,
                )
                if isinstance(v, (list, dict, np.ndarray))
                else v
            )
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    return f"{int(np.bitwise_xor.reduce(h)):016x}"


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def completed(self) -> dict[int, dict]:
        done = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        done[rec["partition_id"]] = rec
        return done

    def append(self, record: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")


def _write_one(
    table: pa.Table, out_dir: str, partition_id: int, input_fragment: str
) -> dict:
    final = os.path.join(out_dir, f"part-{partition_id:05d}.parquet")
    tmp = final + f".tmp.{os.getpid()}"
    pq.write_table(table, tmp, compression="zstd", row_group_size=150_000)
    os.rename(tmp, final)  # atomic publish
    return {
        "partition_id": partition_id,
        "rows": table.num_rows,
        "input_fragments": [input_fragment],
        "digest": content_digest(table),
    }


def write_partitioned(
    ds,
    out_dir: str,
    *,
    resume: bool = True,
    digest_cols: list[str] | None = None,
) -> list[dict]:
    """Write a Dataset as resumable partitioned parquet; returns the full
    manifest (old + new records).

    Each input block becomes one partition (stable ids from block order).
    Partitions already present in the manifest are skipped on resume. The
    write itself streams: blocks are written by remote tasks as the
    upstream pipeline produces them; only lineage records come back.
    """
    import ray
    from ray.data import DataContext

    # stable partition ids require deterministic block order across runs
    ctx = DataContext.get_current()
    prev_preserve = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True

    man = Manifest(out_dir)
    done = man.completed() if resume else {}

    @ray.remote
    def write_task(block_ref_table: pa.Table, pid: int, frag: str, cols) -> dict:
        rec = _write_one(block_ref_table, out_dir, pid, frag)
        if cols:
            rec["digest"] = content_digest(block_ref_table, cols)
        return rec

    try:
        futures = []
        pid = 0
        for block_ref in ds.to_arrow_refs():
            if pid in done:
                pid += 1
                continue
            futures.append(
                write_task.remote(block_ref, pid, f"block-{pid}", digest_cols)
            )
            pid += 1
        for fut in futures:
            rec = ray.get(fut)
            man.append(rec)
            done[rec["partition_id"]] = rec
    finally:
        ctx.execution_options.preserve_order = prev_preserve
    return [done[k] for k in sorted(done)]
