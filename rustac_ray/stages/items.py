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


# band-field prefix rules on v1.0.0→v1.1.0 migration (migrate.rs:121-155):
# eo bands keep only 'name' unprefixed; raster bands keep
# nodata/data_type/statistics/unit unprefixed; everything else gets its
# extension namespace prefix.
_EO_UNPREFIXED = {"name"}
_RASTER_UNPREFIXED = {"nodata", "data_type", "statistics", "unit"}


def _merge_bands(asset: dict) -> dict:
    """eo:bands + raster:bands → bands, most-common-value lift
    (migrate.rs:119-192): per key, the most frequent value is hoisted to the
    asset level whenever its count > 1 (only bands carrying exactly that
    value drop the key)."""
    eo = asset.pop("eo:bands", None)
    raster = asset.pop("raster:bands", None)
    if eo is None and raster is None:
        return asset

    def prefixed(band: dict, ns: str, unprefixed: set) -> dict:
        return {
            (k if k in unprefixed else f"{ns}:{k}"): v for k, v in band.items()
        }

    eo = [prefixed(b, "eo", _EO_UNPREFIXED) for b in (eo or [])]
    raster = [prefixed(b, "raster", _RASTER_UNPREFIXED) for b in (raster or [])]
    n = max(len(eo), len(raster))
    bands = []
    for i in range(n):
        band: dict = {}
        if i < len(eo):
            band.update(eo[i])
        if i < len(raster):
            band.update(raster[i])
        bands.append(band)
    if bands:
        # per key: count identical values (repr as the canonical form), lift
        # the most common one when its count > 1 (migrate.rs:169-185);
        # first-seen order breaks ties deterministically
        per_key: dict[str, Counter] = {}
        for b in bands:
            for k, v in b.items():
                per_key.setdefault(k, Counter())[repr(v)] += 1
        for k, cnt in per_key.items():
            vr, c = cnt.most_common(1)[0]
            if c > 1:
                sample = next(b[k] for b in bands if k in b and repr(b[k]) == vr)
                asset[k] = sample
                for b in bands:
                    if k in b and repr(b[k]) == vr:
                        del b[k]
        if any(b for b in bands):
            asset["bands"] = bands
    return asset


def _migrate_links(links, base_is_windows=None):
    """Self-link href absolutization (migrate.rs:195-235): a 'self' link
    whose href is an absolute posix path becomes a file:// URL."""
    if links is None or (np.isscalar(links) and pd.isna(links)):
        return links
    out = []
    for ln in links:
        if (
            isinstance(ln, dict)
            and ln.get("rel") == "self"
            and isinstance(ln.get("href"), str)
        ):
            href = ln["href"]
            if href.startswith("/"):
                ln = {**ln, "href": f"file://{href}"}
            elif len(href) >= 3 and href[1] == ":" and href[2] in ("\\", "/") and href[0].isalpha():
                # windows absolute path → file URL (href.rs is_windows_absolute_path)
                ln = {**ln, "href": "file:///" + href.replace("\\", "/")}
        out.append(ln)
    return out


_LEGACY_LICENSES = {"proprietary", "various"}


def migrate_items(batch: pd.DataFrame, to_version: str = "1.1.0") -> pd.DataFrame:
    """v1.0.0 → v1.1.0 migration; row-local (no shuffle).

    Full step parity with migrate.rs:85-118: band merge + most-common lift,
    self-link rewrite, license normalization ('proprietary'/'various' →
    'other' — for Feature rows the license lives among the flattened
    property columns), then the stac_version bump. Rows already at the
    target version pass through untouched.
    """
    out = batch.copy()
    if "stac_version" in out.columns:
        todo = out["stac_version"] == "1.0.0"
    else:
        todo = pd.Series(True, index=out.index)
    if not todo.any():
        return out
    if "assets" in out.columns:
        out.loc[todo, "assets"] = out.loc[todo, "assets"].map(
            lambda assets: assets
            if assets is None or (np.isscalar(assets) and pd.isna(assets))
            else {name: _merge_bands(dict(a)) for name, a in assets.items()}
        )
    if "links" in out.columns:
        out.loc[todo, "links"] = out.loc[todo, "links"].map(_migrate_links)
    if "license" in out.columns:
        fix = todo & out["license"].isin(_LEGACY_LICENSES)
        out.loc[fix, "license"] = "other"
    if "stac_version" in out.columns:
        out.loc[todo, "stac_version"] = to_version
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

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        errors: list[list[str]] = [[] for _ in range(n)]

        # cheap checks vectorized over columns (no row iteration)
        if "type" in batch.columns:
            t = batch["type"]
            bad = ~(t.isna() | (t == "Feature"))
            for i in np.nonzero(bad.to_numpy())[0]:
                errors[i].append(f"type must be 'Feature', got {t.iloc[i]!r}")
        ids = batch["id"] if "id" in batch.columns else pd.Series([None] * n)
        no_id = ids.isna() | (ids.astype(str).str.len() == 0)
        for i in np.nonzero(no_id.to_numpy())[0]:
            errors[i].append("missing id")
        if "bbox" in batch.columns:
            bb = batch["bbox"]
            present = bb.map(
                lambda b: b is not None and not (np.isscalar(b) and pd.isna(b))
            ).to_numpy()
            if present.any():
                vals = np.full((n, 4), np.nan)
                arity_bad = np.zeros(n, dtype=bool)
                for i in np.nonzero(present)[0]:  # struct/list unpack per row
                    b = bb.iloc[i]
                    v = (
                        [b.get(k) for k in ("xmin", "ymin", "xmax", "ymax")]
                        if isinstance(b, dict)
                        else list(b)
                    )
                    if len(v) == 6:
                        v = [v[0], v[1], v[3], v[4]]
                    if len(v) != 4:
                        arity_bad[i] = True
                    else:
                        vals[i] = v
                inverted = present & ~arity_bad & (
                    (vals[:, 0] > vals[:, 2]) | (vals[:, 1] > vals[:, 3])
                )
                for i in np.nonzero(arity_bad)[0]:
                    errors[i].append("bbox must have 4 or 6 values (bbox.rs:42-50)")
                for i in np.nonzero(inverted)[0]:
                    errors[i].append("bbox min > max (bbox.rs:42-50)")
        if "geometry" in batch.columns:
            geoms = batch["geometry"]
            for i in range(n):  # WKB decode failures only — rare path
                g = geoms.iloc[i]
                if g is None or (np.isscalar(g) and pd.isna(g)):
                    if self.require_geometry:
                        errors[i].append("missing geometry")
                elif isinstance(g, (bytes, bytearray)):
                    try:
                        self._decode(bytes(g))
                    except Exception as e:  # noqa: BLE001
                        errors[i].append(f"undecodable WKB geometry: {e}")
        elif self.require_geometry:
            for e in errors:
                e.append("missing geometry")
        return pd.DataFrame(
            {
                "id": ids.to_numpy(),
                "valid": [not e for e in errors],
                "errors": ["; ".join(e) for e in errors],
            }
        )
