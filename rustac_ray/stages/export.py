"""WebDataset-style tar shard export for image+caption training.

The de-facto loader format for large-scale image-text training (CLIP,
LAION pipelines) is sequential tar shards: one tar per shard, each sample
a group of same-stem members ``{key}.img`` / ``{key}.txt`` / ``{key}.json``
read by streaming the archive front to back. This writer produces that
layout from the input_hint image table with the engine's standard resume
semantics:

- **One tar per input block**, written ATOMICALLY (tmp + rename) by a
  remote task as the upstream pipeline streams — payload bytes never pass
  through the driver, and blocks are bounded by
  ``DataContext.target_max_block_size`` so a shard fits a worker's heap.
- **Lineage manifest** (state/manifest.Manifest): finished shard ids are
  skipped on re-run, same exact-once contract as the parquet writer.
- **Byte-deterministic tars**: members are emitted in row order with
  zeroed mtime/uid/gid, so a re-written shard is byte-identical and the
  manifest digest is stable.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import pyarrow as pa

__all__ = ["write_webdataset_shards", "read_webdataset_shard", "read_webdataset"]

_META_COLS = ("w", "h", "fmt", "phash")


def _tar_bytes(table: pa.Table) -> bytes:
    buf = io.BytesIO()
    ids = table["image_id"].to_pylist()
    payloads = table["bytes"].to_pylist()
    captions = table["caption"].to_pylist() if "caption" in table.column_names else [""] * len(ids)
    metas = {
        c: table[c].to_pylist() for c in _META_COLS if c in table.column_names
    }
    with tarfile.open(fileobj=buf, mode="w") as tf:

        def add(name: str, data: bytes) -> None:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))

        for i, key in enumerate(ids):
            add(f"{key}.img", payloads[i])
            add(f"{key}.txt", str(captions[i]).encode())
            add(
                f"{key}.json",
                json.dumps(
                    {c: metas[c][i] for c in metas}, sort_keys=True
                ).encode(),
            )
    return buf.getvalue()


def write_webdataset_shards(ds, out_dir: str, *, resume: bool = True) -> list[dict]:
    """Write ``ds`` (input_hint schema: image_id, bytes, caption, ...) as
    WebDataset tar shards ``shard-{id:05d}.tar`` + lineage manifest;
    returns the manifest records. Finished shards skip on re-run."""
    import ray
    from ray.data import DataContext

    from ..state.manifest import Manifest

    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True  # stable shard ids

    man = Manifest(out_dir)
    done = man.completed() if resume else {}

    @ray.remote
    def write_task(table: pa.Table, pid: int) -> dict:
        data = _tar_bytes(table)
        final = os.path.join(out_dir, f"shard-{pid:05d}.tar")
        tmp = final + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.rename(tmp, final)
        import hashlib

        return {
            "partition_id": pid,
            "rows": table.num_rows,
            "first_key": str(table["image_id"][0]) if table.num_rows else "",
            "input_fragments": [f"block-{pid}"],
            "digest": hashlib.blake2b(data, digest_size=8).hexdigest(),
            "bytes": len(data),
        }

    @ray.remote
    def ident_task(table: pa.Table, pid: int) -> tuple[int, str, int]:
        # input identity for resume verification: (first key, row count)
        # — detects a changed block layout without re-tarring the payload
        return pid, (str(table["image_id"][0]) if table.num_rows else ""), table.num_rows

    try:
        futures, checks, pid = [], [], 0
        for block_ref in ds.to_arrow_refs():
            if pid in done:
                # a completed pid is only SKIPPED if the current input
                # block still matches the manifest's recorded identity;
                # stale shards (different block layout / upstream change,
                # or a legacy record without an identity) are rewritten
                # (r02 advice: pid-keyed resume silently kept stale tars)
                checks.append((ident_task.remote(block_ref, pid), block_ref))
                pid += 1
                continue
            futures.append(write_task.remote(block_ref, pid))
            pid += 1
        for fut, block_ref in checks:
            cpid, first_key, rows = ray.get(fut)
            rec = done[cpid]
            if rec.get("first_key") == first_key and rec.get("rows") == rows:
                continue
            futures.append(write_task.remote(block_ref, cpid))
            del done[cpid]
        for fut in futures:
            rec = ray.get(fut)
            man.append(rec)
            done[rec["partition_id"]] = rec
    finally:
        ctx.execution_options.preserve_order = prev
    return [done[k] for k in sorted(done)]


def read_webdataset_shard(path: str) -> list[dict]:
    """Stream one tar shard back into sample dicts (test/verification
    helper and the template for a loader-side ray.data datasource)."""
    out: list[dict] = []
    with tarfile.open(path) as tf:
        cur: dict = {}
        for m in tf:
            stem, ext = m.name.rsplit(".", 1)
            if cur.get("__key__") != stem:
                if cur:
                    out.append(cur)
                cur = {"__key__": stem}
            data = tf.extractfile(m).read()
            cur[ext] = (
                json.loads(data) if ext == "json"
                else data.decode() if ext == "txt"
                else data
            )
        if cur:
            out.append(cur)
    return out


def read_webdataset(shard_dir: str):
    """Distributed WebDataset reader: one Ray task per tar shard →
    Dataset with the input_hint schema (image_id, bytes, w, h, fmt,
    caption, phash) — the loader-side inverse of
    :func:`write_webdataset_shards`.

    Scale shape: the SHARD is the parallelism unit (exactly how
    WebDataset is consumed in training loaders — sequential tar reads,
    no random access); each task streams its archive front-to-back once
    and emits one Arrow block, so a 100k-shard corpus is a 100k-task
    streaming read with no driver involvement. ``batch_size=1`` pins one
    shard per task; payload bytes go straight from tar to block.
    """
    import glob as _glob

    import numpy as np
    import ray.data as rd

    paths = sorted(_glob.glob(os.path.join(shard_dir, "shard-*.tar")))
    if not paths:
        raise FileNotFoundError(f"no shard-*.tar under {shard_dir}")

    def load(batch: pa.Table) -> pa.Table:
        tables = []
        for p in batch["path"].to_pylist():
            samples = read_webdataset_shard(p)
            meta = [s.get("json", {}) for s in samples]
            tables.append(
                pa.table(
                    {
                        "image_id": pa.array(
                            [s["__key__"] for s in samples], pa.string()
                        ),
                        "bytes": pa.array(
                            [s.get("img", b"") for s in samples], pa.binary()
                        ),
                        "w": pa.array(
                            np.array([m.get("w", 0) for m in meta], np.int32)
                        ),
                        "h": pa.array(
                            np.array([m.get("h", 0) for m in meta], np.int32)
                        ),
                        "fmt": pa.array(
                            [str(m.get("fmt", "")) for m in meta], pa.string()
                        ),
                        "caption": pa.array(
                            [s.get("txt", "") for s in samples], pa.string()
                        ),
                        "phash": pa.array(
                            np.array([m.get("phash", 0) for m in meta],
                                     np.int64)
                        ),
                    }
                )
            )
        return pa.concat_tables(tables)

    files = rd.from_items([{"path": p} for p in paths])
    return files.map_batches(load, batch_size=1, batch_format="pyarrow")
