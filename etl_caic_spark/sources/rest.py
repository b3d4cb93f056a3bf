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
