"""HTTP batch sink (A6) — the reference's `submit(FeatureCollection)` step.

The reference wraps all surviving features in one FeatureCollection and
POSTs it in a single driver-side call (``/root/reference/task.ts:108-115``,
O(dataset) driver memory). At scale that is the wrong shape, so the engine
POSTs *per partition in bounded batches* via ``foreachPartition`` — each
executor ships its own FeatureCollections; the driver never materializes
the dataset. A ``collect``-based compat mode reproduces the reference's
single-collection behavior for small results.

The poster is injectable for tests (and because this container has no
network egress).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame

Poster = Callable[[str, dict[str, Any]], None]


def default_poster(url: str, payload: dict[str, Any]) -> None:  # pragma: no cover
    import urllib.request

    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    urllib.request.urlopen(req, timeout=30)


def rows_to_feature_collection(rows: list[Any]) -> dict[str, Any]:
    """Wrap canonical feature rows in a GeoJSON FeatureCollection
    (task.ts:108-113)."""
    feats = []
    for r in rows:
        feats.append(
            {
                "id": r["id"],
                "type": "Feature",
                "properties": dict(r["properties"]) if r["properties"] else {},
                "geometry": {
                    "type": r["geom_type"],
                    "coordinates": json.loads(r["coordinates"]),
                },
            }
        )
    return {"type": "FeatureCollection", "features": feats}


def http_batch_sink(
    df: DataFrame,
    url: str,
    batch_size: int = 1000,
    poster: Poster | None = None,
) -> None:
    """Distributed sink: per-partition bounded-batch POSTs (the scale path)."""
    post = poster or default_poster

    def handle_partition(rows: Iterator[Any]) -> None:
        batch: list[Any] = []
        for row in rows:
            batch.append(row)
            if len(batch) >= batch_size:
                post(url, rows_to_feature_collection(batch))
                batch = []
        if batch:
            post(url, rows_to_feature_collection(batch))

    df.foreachPartition(handle_partition)


def submit_single_collection(
    df: DataFrame, url: str, poster: Poster | None = None
) -> int:
    """Reference-compat sink: one FeatureCollection POST from the driver
    (task.ts:108-115). Only for small results — documents the reference's
    O(dataset) driver-memory behavior rather than hiding it."""
    rows = df.collect()
    (poster or default_poster)(url, rows_to_feature_collection(rows))
    return len(rows)
