"""Zero-row batches through every round-3 stage — Ray is free to produce
them (r02 verdict #1 was exactly this class of bug in the hash join)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rustac_ray.sources.clustered import _zkey_stage
from rustac_ray.stages.align import CaptionAlignment
from rustac_ray.stages.audio import AudioStats
from rustac_ray.stages.bloomjoin import _BloomProbe, _ExactMember
from rustac_ray.stages.decontam import BloomFilter
from rustac_ray.stages.sketch import MPQuantileSketch


def test_bloom_probe_empty():
    bf = BloomFilter(1 << 10, 3)
    empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64)})
    assert len(_BloomProbe(bf, "k", True)(empty)) == 0
    assert len(_BloomProbe(bf, "k", False)(empty)) == 0
    assert len(_ExactMember(np.zeros(0, np.int64), "k", True)(empty)) == 0


def test_zkey_stage_empty():
    t = pa.table(
        {
            "image_id": pa.array([], pa.string()),
            "fp_xmin": pa.array([], pa.float64()),
            "fp_ymin": pa.array([], pa.float64()),
            "fp_xmax": pa.array([], pa.float64()),
            "fp_ymax": pa.array([], pa.float64()),
        }
    )
    out = _zkey_stage(t, derive=False, bits=16)
    assert out.num_rows == 0 and "_zkey" in out.column_names
    # items-shape empty
    t2 = pa.table(
        {
            "id": pa.array([], pa.string()),
            "bbox": pa.array(
                [], pa.struct(
                    [("xmin", pa.float64()), ("ymin", pa.float64()),
                     ("xmax", pa.float64()), ("ymax", pa.float64())]
                )
            ),
        }
    )
    assert _zkey_stage(t2, derive=False, bits=16, bbox_col="bbox").num_rows == 0


def test_alignment_and_audio_empty():
    a = pa.table(
        {
            "image_id": pa.array([], pa.string()),
            "bytes": pa.array([], pa.binary()),
            "fmt": pa.array([], pa.string()),
            "caption": pa.array([], pa.string()),
        }
    )
    assert CaptionAlignment(0.1)(a).num_rows == 0
    b = pa.table(
        {
            "audio_id": pa.array([], pa.string()),
            "bytes": pa.array([], pa.binary()),
        }
    )
    assert AudioStats()(b).num_rows == 0


def test_sketch_empty_merge():
    a = MPQuantileSketch(cap=64)
    b = MPQuantileSketch(cap=64).add(np.arange(100.0))
    a.merge(b)
    assert a.n == 100
