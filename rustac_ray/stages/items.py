"""Item-shape transforms (SURVEY.md M1/M2/M8/M9) + a validation subset.

These mirror the reference's record-level semantics:

- ``flatten_items`` — `into_flat_item` (crates/core/src/item.rs:571-606):
  hoist ``properties.*`` to top level; collision with one of the reserved
  top-level keys (item.rs:16-25) either errors or drops per ``on_conflict``.
- ``unflatten_items`` — inverse (crates/core/src/geoarrow/json.rs:570-603):
  non-top-level columns move under ``properties``.
- ``migrate_items`` — v1.0.0→v1.1.0 (crates/core/src/migrate.rs:21-246):
  per asset, merge ``eo:bands`` + ``raster:bands`` pairwise into ``bands``,
  then lift values shared by the MAJORITY of bands to the asset level
  (migrate.rs:155-185 — a per-record mini group-by; row-local, no shuffle);
  bump ``stac_version``.
- ``absolutize_links`` — make link/asset hrefs absolute against a base
  (crates/core/src/link.rs Links trait; cli/src/lib.rs:975-1028).
- ``validate_items`` — schema-subset validator with rules cached per actor
  (mirrors the prebuilt-cache design of validate/src/validator.rs:37-50):
  checks required members, types, bbox validity (bbox.rs:42-50), geometry
  WKB decodability.

All operate on pandas batches of dict-bearing columns (these are metadata
tables, orders of magnitude smaller than payload tables at any scale).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

# reference item.rs:16-25
TOP_LEVEL_KEYS = (
    "type", "stac_version", "stac_extensions", "id", "geometry", "bbox",
    "links", "assets", "collection",
)

__all__ = [
    "TOP_LEVEL_KEYS",
    "flatten_items",
    "unflatten_items",
    "migrate_items",
    "absolutize_links",
    "ItemValidator",
]


def flatten_items(batch: pd.DataFrame, on_conflict: str = "error") -> pd.DataFrame:
    """properties dict column → one top-level column per property."""
    if "properties" not in batch.columns:
        return batch
    props = pd.json_normalize(batch["properties"], max_level=0)
    props.index = batch.index
    out = batch.drop(columns=["properties"])
    for col in props.columns:
        if col in TOP_LEVEL_KEYS or col in out.columns:
            if on_conflict == "error":
                raise ValueError(
                    f"property {col!r} collides with a top-level key (item.rs:16-25)"
                )
            continue  # "drop"
        out[col] = props[col]
    return out


def unflatten_items(batch: pd.DataFrame, keep: tuple = TOP_LEVEL_KEYS) -> pd.DataFrame:
    """Inverse of flatten: non-top-level columns → properties dicts."""
    prop_cols = [c for c in batch.columns if c not in keep]
    records = batch[prop_cols].to_dict("records")
    cleaned = [
        {k: v for k, v in rec.items() if not (np.isscalar(v) and pd.isna(v))}
        for rec in records
    ]
    out = batch[[c for c in batch.columns if c in keep]].copy()
    out["properties"] = cleaned
    return out


# fields that became CORE band fields in STAC 1.1 (stay unprefixed on
# migration); everything else keeps its extension namespace — matches the
# reference's bands-v1.0.0 → bands-v1.1.0 fixture exactly
_CORE_BAND_FIELDS = {
    "name", "description", "nodata", "data_type", "statistics", "unit",
}


def _merge_bands(asset: dict) -> dict:
    """eo:bands + raster:bands → bands, majority-value lift (migrate.rs:155-185).

    Non-core band fields are re-namespaced (``common_name`` →
    ``eo:common_name``, ``spatial_resolution`` → ``raster:spatial_resolution``)
    per the v1.1 band model."""
    eo = asset.pop("eo:bands", None)
    raster = asset.pop("raster:bands", None)
    if eo is None and raster is None:
        return asset

    def prefixed(band: dict, ns: str) -> dict:
        return {
            (k if (k in _CORE_BAND_FIELDS or ":" in k) else f"{ns}:{k}"): v
            for k, v in band.items()
        }

    eo = [prefixed(b, "eo") for b in (eo or [])]
    raster = [prefixed(b, "raster") for b in (raster or [])]
    n = max(len(eo), len(raster))
    bands = []
    for i in range(n):
        band: dict = {}
        if i < len(eo):
            band.update(eo[i])
        if i < len(raster):
            band.update(raster[i])
        bands.append(band)
    # lift values shared by a MAJORITY of bands to the asset level
    if bands:
        key_values = Counter()
        for b in bands:
            for k, v in b.items():
                try:
                    key_values[(k, repr(v))] += 1
                except TypeError:
                    pass
        for (k, vr), cnt in key_values.items():
            if cnt > len(bands) / 2:
                sample = next(b[k] for b in bands if k in b and repr(b[k]) == vr)
                asset[k] = sample
                for b in bands:
                    if k in b and repr(b[k]) == vr:
                        del b[k]
        bands = [b for b in bands]
        if any(b for b in bands):
            asset["bands"] = bands
    return asset


def migrate_items(batch: pd.DataFrame, to_version: str = "1.1.0") -> pd.DataFrame:
    """v1.0.0 → v1.1.0 migration; row-local (no shuffle)."""
    out = batch.copy()
    if "assets" in out.columns:
        out["assets"] = out["assets"].map(
            lambda assets: {
                name: _merge_bands(dict(a)) for name, a in (assets or {}).items()
            }
        )
    if "stac_version" in out.columns:
        out["stac_version"] = to_version
    return out


def absolutize_links(batch: pd.DataFrame, base: str) -> pd.DataFrame:
    """Make relative link/asset hrefs absolute against ``base``."""
    from urllib.parse import urljoin

    def fix_links(links):
        if links is None:
            return links
        return [
            {**ln, "href": urljoin(base, ln["href"])} if "href" in ln else ln
            for ln in links
        ]

    def fix_assets(assets):
        if assets is None:
            return assets
        return {
            k: {**a, "href": urljoin(base, a["href"])} if "href" in a else a
            for k, a in assets.items()
        }

    out = batch.copy()
    if "links" in out.columns:
        out["links"] = out["links"].map(fix_links)
    if "assets" in out.columns:
        out["assets"] = out["assets"].map(fix_assets)
    return out


class ItemValidator:
    """Actor-pool validation stage: rule table built once per actor.

    Emits (id, valid, errors). Covers the structural subset the driver's
    correctness checks need; full JSON-Schema validation would plug in here
    the same way (cached compiled schemas per actor, validator.rs:37-50).
    """

    def __init__(self, require_geometry: bool = False):
        from ..geo.wkb import decode_geometry

        self._decode = decode_geometry
        self.require_geometry = require_geometry

    def _validate_row(self, row: pd.Series) -> list[str]:
        errs = []
        if row.get("type") not in ("Feature", None):
            errs.append(f"type must be 'Feature', got {row.get('type')!r}")
        if not row.get("id"):
            errs.append("missing id")
        bbox = row.get("bbox")
        if bbox is not None and not (isinstance(bbox, float) and pd.isna(bbox)):
            vals = (
                [bbox.get(k) for k in ("xmin", "ymin", "xmax", "ymax")]
                if isinstance(bbox, dict)
                else list(bbox)
            )
            if len(vals) not in (4, 6):
                errs.append("bbox must have 4 or 6 values (bbox.rs:42-50)")
            elif len(vals) == 4 and (vals[0] > vals[2] or vals[1] > vals[3]):
                errs.append("bbox min > max (bbox.rs:42-50)")
        geom = row.get("geometry")
        if geom is None:
            if self.require_geometry:
                errs.append("missing geometry")
        elif isinstance(geom, (bytes, bytearray)):
            try:
                self._decode(bytes(geom))
            except Exception as e:  # noqa: BLE001
                errs.append(f"undecodable WKB geometry: {e}")
        return errs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        errors = [self._validate_row(row) for _, row in batch.iterrows()]
        return pd.DataFrame(
            {
                "id": batch.get("id", pd.Series([None] * len(batch))).to_numpy(),
                "valid": [not e for e in errors],
                "errors": ["; ".join(e) for e in errors],
            }
        )
