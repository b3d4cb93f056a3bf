"""Deterministic CAIC-shaped fixtures (FIXTURES.md Part B): synthetic
areas / forecasts tables mirroring the reference's two input payloads
(reference task.ts:8-52), seeded (seed=42) so golden tests are stable.

Generation spec highlights:
- ~5% duplicate area ids at different positions → exercises last-write-wins
  build-side dedup (task.ts:97-100);
- ~30% MultiPolygon (2-4 parts) → exercises the conditional explode
  (task.ts:171-183);
- ~20% non-forecast product types (filter fodder, task.ts:114);
- ~10% dangling area FKs (inner-join drops, task.ts:140-141);
- ~10% null/empty days arrays (guard fodder, task.ts:137-138);
- ~2% unknown rating strings (defined-fallback semantics, SURVEY.md §2.B.2).
"""

from __future__ import annotations

import json
import random

from pyspark.sql import DataFrame, SparkSession

from etl_caic_spark.schemas import AREAS_SCHEMA, FORECASTS_SCHEMA

RATINGS = ["extreme", "high", "considerable", "moderate", "low", "noRating"]
FORECASTERS = ["akimbo", "bluebird", "cornice", "divot"]


def _ring(rng: random.Random, cx: float, cy: float) -> list[list[float]]:
    pts = []
    for k in range(5):
        ang = k / 5.0
        pts.append(
            [
                round(cx + 0.1 * (1 + rng.random()) * (1 if k % 2 else -1) * ang, 6),
                round(cy + 0.1 * (1 + rng.random()) * ang, 6),
            ]
        )
    pts.append(pts[0])
    return pts


def generate_areas(spark: SparkSession, n: int = 60, seed: int = 42) -> DataFrame:
    rng = random.Random(seed)
    rows = []
    pos = 0
    for i in range(n):
        area_id = f"A{i:03d}"
        cx, cy = -106.0 + rng.random() * 4, 38.0 + rng.random() * 3
        if rng.random() < 0.7:
            geom_type = "Polygon"
            coords = [_ring(rng, cx, cy)]
        else:
            geom_type = "MultiPolygon"
            coords = [
                [_ring(rng, cx + dp * 0.5, cy)] for dp in range(rng.randint(2, 4))
            ]
        rows.append(
            (
                area_id,
                pos,
                geom_type,
                json.dumps({"type": geom_type, "coordinates": coords}),
                json.dumps({"name": f"Zone {i}", "elev": rng.randint(2500, 4000)}),
            )
        )
        pos += 1
        if rng.random() < 0.05:  # duplicate id, later position → must win
            rows.append(
                (
                    area_id,
                    pos,
                    "Polygon",
                    json.dumps({"type": "Polygon", "coordinates": [_ring(rng, cx, cy)]}),
                    json.dumps({"name": f"Zone {i} v2", "elev": rng.randint(2500, 4000)}),
                )
            )
            pos += 1
    return spark.createDataFrame(rows, AREAS_SCHEMA)


def generate_forecasts(
    spark: SparkSession, n_areas: int = 60, per_area: float = 2.0, seed: int = 43
) -> DataFrame:
    rng = random.Random(seed)
    rows = []
    pid = 0
    for i in range(int(n_areas * per_area)):
        if rng.random() < 0.1:
            area_id = f"A{900 + rng.randint(0, 50):03d}"  # dangling FK
        else:
            area_id = f"A{rng.randint(0, n_areas - 1):03d}"
        ptype = "avalancheforecast" if rng.random() < 0.8 else rng.choice(
            ["weathersummary", "watchwarning", "specialproduct"]
        )
        n_days = rng.randint(0, 3)
        if rng.random() < 0.1:
            summary_days = rng.choice([None, []])
        else:
            summary_days = [
                {"date": f"2026-02-{d+1:02d}", "content": f"summary {pid} day {d}"}
                for d in range(max(n_days, 1))
            ]
        if rng.random() < 0.1:
            rating_days = rng.choice([None, []])
        else:

            def rating(rng=rng):
                if rng.random() < 0.02:
                    return "unknownRating"
                return rng.choice(RATINGS)

            rating_days = [
                {"alp": rating(), "tln": rating(), "btl": rating()}
                for _ in range(max(n_days, 1))
            ]
        rows.append(
            (
                f"P{pid:05d}",
                ptype,
                area_id,
                f"Public Area {area_id}",
                rng.choice(FORECASTERS),
                f"2026-02-01T{rng.randint(0,23):02d}:00:00Z",
                f"2026-02-02T{rng.randint(0,23):02d}:00:00Z",
                rng.random() < 0.5,
                summary_days,
                rating_days,
            )
        )
        pid += 1
    return spark.createDataFrame(rows, FORECASTS_SCHEMA)
