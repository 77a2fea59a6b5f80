"""STAC API client source (S6): pagination, next-link styles, max-items
cap, bounded prefetch — against a fake backend (no network in scope)."""

import threading
import time

import pytest

from rustac_ray.sources.api import StacApiSource


def _fake_backend(n_pages=5, per_page=10, style="body"):
    calls = []

    def fetch(request):
        calls.append(dict(request))
        page_no = request.get("page", 0) if style == "body" else (
            int(request["href"].rsplit("=", 1)[1]) if "href" in request else 0
        )
        feats = [
            {"type": "Feature", "id": f"it-{page_no}-{i}",
             "properties": {"datetime": "2024-01-01T00:00:00Z"}}
            for i in range(per_page)
        ]
        links = []
        if page_no + 1 < n_pages:
            if style == "body":
                links = [{"rel": "next", "body": {"page": page_no + 1}}]
            else:
                links = [{"rel": "next", "href": f"https://x/search?page={page_no + 1}"}]
        return {"type": "FeatureCollection", "features": feats, "links": links}

    return fetch, calls


def test_follows_next_body_links():
    fetch, calls = _fake_backend(style="body")
    items = list(StacApiSource(fetch).items({"collections": ["c"]}))
    assert len(items) == 50
    assert items[0]["id"] == "it-0-0" and items[-1]["id"] == "it-4-9"
    # original request params carried into every body-style next request
    assert all(c.get("collections") == ["c"] for c in calls)


def test_follows_next_href_links():
    fetch, _ = _fake_backend(style="href")
    items = list(StacApiSource(fetch).items({}))
    assert len(items) == 50


def test_max_items_cap_stops_fetching():
    fetch, calls = _fake_backend(n_pages=100)
    items = list(StacApiSource(fetch, prefetch=2).items({}, max_items=25))
    assert len(items) == 25
    # bounded prefetch: the worker cannot have raced far past the cap
    assert len(calls) <= 3 + 2 + 1


def test_prefetch_bounded_backpressure():
    started = []
    release = threading.Event()

    def fetch(request):
        started.append(request.get("page", 0))
        return {
            "features": [{"type": "Feature", "id": str(request.get("page", 0)),
                          "properties": {}}],
            "links": [{"rel": "next", "body": {"page": request.get("page", 0) + 1}}],
        }

    src = StacApiSource(fetch, prefetch=3)
    gen = src.pages({})
    next(gen)  # consume one page, then stall
    time.sleep(0.2)
    assert len(started) <= 1 + 3 + 1  # consumed + queue capacity + in-flight
    release.set()


def test_fetch_error_surfaces():
    def fetch(request):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(StacApiSource(fetch).items({}))


def test_to_dataset_ingest(ray_session):
    fetch, _ = _fake_backend(n_pages=2, per_page=3)
    ds = StacApiSource(fetch).to_dataset({})
    df = ds.to_pandas()
    assert len(df) == 6 and "id" in df.columns


def test_early_exit_stops_worker_thread():
    """Regression (r2 review): abandoning a capped pull must terminate the
    prefetch worker instead of leaving it parked on the full queue."""
    import threading as _t

    fetch, calls = _fake_backend(n_pages=1000)
    before = _t.active_count()
    list(StacApiSource(fetch, prefetch=2).items({}, max_items=5))
    deadline = time.time() + 3.0
    while _t.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert _t.active_count() <= before
    n_calls_settled = len(calls)
    time.sleep(0.3)
    assert len(calls) == n_calls_settled  # no further fetching after exit
