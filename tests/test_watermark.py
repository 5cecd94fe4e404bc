"""Watermark + windowed aggregation over Structured Streaming (SURVEY
§2.8 last row): late data beyond the watermark is dropped from the
append-mode result; on-time data aggregates per tumbling window."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("wm")
    src = str(base / "src")
    out = str(base / "out")
    ckpt = str(base / "ckpt")

    rows1 = pd.DataFrame({
        "ts": pd.to_datetime([
            "2024-01-01 00:05", "2024-01-01 00:15",   # window 00:00
            "2024-01-01 01:10",                        # window 01:00
            "2024-01-01 03:00",                        # advances watermark to 02:00
        ]),
        "v": [1.0, 2.0, 4.0, 8.0],
    })
    rows2 = pd.DataFrame({
        "ts": pd.to_datetime([
            "2024-01-01 00:20",   # LATE: event-time < watermark → dropped
            "2024-01-01 05:00",   # advances watermark further, closes all
            "2024-01-01 07:00",
        ]),
        "v": [100.0, 16.0, 32.0],
    })
    from pyspark.sql import functions as F

    def drain() -> None:
        """One availableNow pass; watermark persists in the checkpoint,
        so the second pass sees batch 1's watermark (02:00) and must
        drop the late 00:20 row."""
        stream = spark.readStream.schema("ts timestamp, v double").parquet(src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.sum("v").alias("total"), F.count("*").alias("cnt"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("w"),
                "total", "cnt",
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    import os

    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(rows1).coalesce(1).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(rows2).coalesce(1).write.mode("append").parquet(src)
    drain()
    return spark.read.parquet(out).toPandas().set_index("w").sort_index()


def test_on_time_windows_aggregate(result):
    assert result.loc["2024-01-01 00:00", "total"] == 3.0  # 1+2, late 100 dropped
    assert result.loc["2024-01-01 00:00", "cnt"] == 2
    assert result.loc["2024-01-01 01:00", "total"] == 4.0


def test_late_row_dropped(result):
    # if the late 100.0 had been admitted, window 00:00 would total 103
    assert 103.0 not in set(result.total)
