"""REST snapshot source (reference R1/R4, task.ts:88-107): a driver-side
HTTP GET of a JSON payload turned into a DataFrame with a declared schema.

This mirrors the reference's mode exactly — one snapshot per scheduled run,
fail-fast on HTTP or schema errors (task.ts:93-95,106-107). The fetch runs
on the driver because the payload is O(10²) features (SURVEY.md §6); a
source whose snapshot is large lands the payload on object storage first
and reads it with spark.read.json(paths) so executors parse in parallel.

No live calls in tests: the transport is injectable (SURVEY.md §7.5)."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

Transport = Callable[[str], str]


def _default_transport(url: str) -> str:
    with urllib.request.urlopen(url, timeout=30) as resp:  # pragma: no cover
        if resp.status // 100 != 2:
            raise RuntimeError(f"non-2xx from {url}: {resp.status}")
        return resp.read().decode("utf-8")


def snapshot_url(base: str, params: dict[str, str]) -> str:
    """URL with encoded query params — the reference interpolates
    encodeURIComponent'd datetime params (task.ts:88-89,102)."""
    return base + "?" + urllib.parse.urlencode(params)


def utcnow_iso() -> str:
    """ISO-8601 UTC timestamp, as the reference's new Date().toISOString()
    (task.ts:88)."""
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.000Z")


def fetch_json_snapshot(
    spark: SparkSession,
    url: str,
    schema: T.StructType,
    record_path: str | None = None,
    transport: Transport | None = None,
) -> DataFrame:
    """GET a JSON payload and decode it into a DataFrame.

    record_path: optional key holding the record array (e.g. "features" for
    a FeatureCollection envelope); None means the payload IS the array.
    Schema enforcement is fail-fast: createDataFrame with an explicit
    schema raises on mismatched payloads (the res.typed() analogue)."""
    raw = (transport or _default_transport)(url)
    payload = json.loads(raw)
    records = payload[record_path] if record_path else payload
    if not isinstance(records, list):
        raise ValueError(f"expected a JSON array at {record_path!r}")
    return spark.createDataFrame(records, schema)


def fetch_json_paginated(
    spark: SparkSession,
    url: str,
    schema: T.StructType,
    record_path: str = "items",
    cursor_path: str = "next",
    transport: Transport | None = None,
    max_pages: int = 1000,
) -> DataFrame:
    """GET a cursor-paginated JSON collection and decode ALL pages into
    one DataFrame — the shape most real REST APIs expose (the reference's
    endpoints return complete snapshots, task.ts:89-107; pagination is
    the first thing a user hits pointing this engine at any other API).

    Each page is an object {record_path: [...], cursor_path: <next-url
    or null>}; pages are followed until the cursor is null/absent, with
    a hard max_pages cap so a buggy server can't loop the driver forever
    (fail-fast, like every guard in this source). Pages accumulate as a
    UNION of per-page DataFrames rather than one big python list, so the
    payload crosses into the JVM page by page. Scale note: the fetch is
    driver-side sequential BY DESIGN (cursors are inherently serial);
    for large collections land pages on storage and read them with
    spark.read.json — same as fetch_json_snapshot's guidance."""
    t = transport or _default_transport
    frames: list[DataFrame] = []
    next_url: str | None = url
    pages = 0
    while next_url:
        if pages >= max_pages:
            raise RuntimeError(
                f"pagination exceeded max_pages={max_pages} at {next_url}"
            )
        payload = json.loads(t(next_url))
        records = payload.get(record_path)
        if not isinstance(records, list):
            raise ValueError(f"expected a JSON array at {record_path!r}")
        if records:
            frames.append(spark.createDataFrame(records, schema))
        next_url = payload.get(cursor_path)
        pages += 1
    if not frames:
        return spark.createDataFrame([], schema)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
