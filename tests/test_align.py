"""Caption-image alignment scoring (stages/align)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rustac_ray.stages.align import (
    DIM,
    GRID,
    CaptionAlignment,
    _image_tower,
    _text_tower,
    alignment_cosine,
    caption_alignment,
)


def test_text_tower_matches_scalar_spec():
    cap = "A Cloudy scene over water water"
    t = _text_tower(cap)
    ref = [0] * DIM
    for w in cap.lower().split():
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
        ref[h % DIM] += 1 if h >> 63 else -1
    assert t.tolist() == ref
    assert abs(t.sum()) <= 6  # signs applied, repeated word counted twice


def test_image_tower_trims_to_grid_multiple():
    px = np.arange(18 * 11 * 3, dtype=np.uint8).reshape(18, 11, 3)
    v = _image_tower(px)
    assert v.shape == (DIM,)
    # trimmed region is 16 x 8: total mass conserved
    assert v.sum() == px[:16, :8].astype(np.int64).sum()


def test_actor_matches_naive_and_skips_undecodable(fixtures_dir, ray_session):
    import glob

    import pyarrow.parquet as pq

    from rustac_ray.imaging.codec import decode_image

    paths = sorted(glob.glob(f"{fixtures_dir}/images.parquet/*.parquet"))
    imgs = pa.concat_tables([pq.read_table(p) for p in paths]).slice(0, 40)
    out = (
        caption_alignment(rd.from_arrow(imgs), tau=0.05, concurrency=2)
        .to_pandas()
        .set_index("image_id")
    )
    assert len(out) == 40
    for i in range(0, 40, 7):
        iid = imgs["image_id"][i].as_py()
        px = decode_image(imgs["bytes"][i].as_py(), imgs["fmt"][i].as_py())
        t = _text_tower(imgs["caption"][i].as_py() or "")
        v = _image_tower(px)
        assert out.loc[iid, "dot"] == int(np.dot(t, v))
        assert out.loc[iid, "t_norm2"] == int(np.dot(t, t))
    # undecodable fmt rows emit decoded=False, kept=False
    bad = pa.table(
        {
            "image_id": pa.array(["b1"]),
            "bytes": pa.array([b"xxxx"], pa.binary()),
            "fmt": pa.array(["h264"]),
            "caption": pa.array(["anything"]),
        }
    )
    got = CaptionAlignment(tau=0.0)(bad).to_pandas()
    assert not got["decoded"][0] and not got["kept"][0]


def test_cosine_helper_handles_zero_norm():
    c = alignment_cosine([5, 0], [25, 0], [4, 9])
    assert c[0] == pytest.approx(0.5)
    assert c[1] == 0.0
