"""STAC API search client source (SURVEY.md S6; reference
crates/io/src/api.rs:26-69,305-335,419-472).

The reference's second entry point is a paged HTTP ``/search`` client:
POST the search, follow ``rel=next`` links, prefetch pages through a
bounded ``mpsc::channel(4)`` on a spawned task, cap at ``max_items``.
This module implements exactly that protocol shape with the transport
INJECTED (``fetch_page`` callable) — this container has no network, so
HTTP itself stays out of scope, but the pagination / capping / bounded
prefetch logic is real and tested against a fake backend. A user with
network plugs in ``requests.post`` in a 3-line fetcher.

Items land in a ``ray.data`` Dataset via ``from_items`` — a driver-side
generator feed, appropriate because API page streams are metadata-scale
(the reference buffers pages in one process too); bulk data enters the
engine through parquet sources, not this path.
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Callable, Iterator

__all__ = ["StacApiSource", "PAGE_PREFETCH"]

PAGE_PREFETCH = 4  # reference: mpsc::channel(4), io/api.rs:23


class StacApiSource:
    """Paged ``/search`` item stream with bounded page prefetch.

    ``fetch_page(request: dict) -> dict`` performs one search request and
    returns the ItemCollection-shaped page (``features`` +
    ``links: [{rel, href, body?}, ...]``). The next request is derived from
    the page's ``rel=next`` link (its ``body`` merged over the original
    request, else its ``href`` passed as ``{"href": ...}`` — the
    reference's two next-link styles, api.rs:305-335).
    """

    def __init__(
        self,
        fetch_page: Callable[[dict], dict],
        *,
        prefetch: int = PAGE_PREFETCH,
    ):
        self.fetch_page = fetch_page
        self.prefetch = prefetch

    @staticmethod
    def _next_request(request: dict, page: dict) -> dict | None:
        for link in page.get("links") or []:
            if link.get("rel") != "next":
                continue
            if link.get("body"):
                return {**request, **link["body"]}
            if link.get("href"):
                return {"href": link["href"]}
            return None
        return None

    def pages(self, request: dict) -> Iterator[dict]:
        """Pages, prefetched by a background thread through a bounded queue
        (backpressure: the fetcher blocks once ``prefetch`` pages wait).

        Early consumer exit (max_items cap, generator close) sets a stop
        event the worker polls between fetches and while blocked on the
        full queue, so no thread is left fetching or parked forever."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _END = object()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.05)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            req = request
            try:
                while req is not None and not stop.is_set():
                    page = self.fetch_page(req)
                    if not _put(page):
                        return
                    req = self._next_request(req, page)
            except Exception as e:  # surface fetch errors on the consumer
                _put(e)
            finally:
                _put(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            while not q.empty():  # unblock a worker parked on q.put
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def items(self, request: dict, max_items: int | None = None) -> Iterator[dict]:
        """Flattened item stream, capped at ``max_items`` across pages
        (api.rs:49-66)."""
        n = 0
        for page in self.pages(request):
            for feat in page.get("features") or []:
                if max_items is not None and n >= max_items:
                    return
                n += 1
                yield feat

    def to_dataset(self, request: dict, max_items: int | None = None):
        """→ flat ray.data Dataset (GeoJSON ingest edge applied)."""
        import ray.data as rd

        from ..stages.geojson import from_geojson_records

        records = list(self.items(request, max_items))
        if not records:
            import pyarrow as pa

            return rd.from_arrow(pa.table({"id": pa.array([], pa.string())}))
        return rd.from_arrow(from_geojson_records(records))
