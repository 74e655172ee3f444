"""Watermarked windowed streaming aggregation (§2.8 surface)."""

import datetime as dt

from pyspark.sql import functions as F


def test_windowed_ingest_counts(spark, tmp_path):
    from veranda_spark.streaming.append import windowed_ingest_counts

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (f"img_{i}", "0_0" if i % 2 == 0 else "0_1", base + dt.timedelta(seconds=3 * i))
        for i in range(40)
    ]
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(rows, "image_id string, tile_id string, ingest_ts timestamp").write.parquet(src)

    stream = spark.readStream.schema(
        "image_id string, tile_id string, ingest_ts timestamp"
    ).parquet(src)
    agg = windowed_ingest_counts(stream, ts_col="ingest_ts", window="30 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("ingest_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from ingest_counts").collect()
    # 40 events x 3s span 120s -> 4 windows x 2 tiles
    assert len(out) == 8
    assert sum(r["n_rows"] for r in out) == 40
    for r in out:
        assert r["n_rows"] == 5  # 10 events per 30s window, split across 2 tiles


def test_stateful_sessionize_stream(spark, tmp_path):
    # custom stateful operator (applyInPandasWithState): gap splits inside
    # a batch close sessions inline; open sessions stay in state
    import datetime as dt

    from veranda_spark.streaming.append import sessionize_stream

    base = dt.datetime(2024, 1, 1)
    rows = []
    for user in (1, 2):
        # session A: 3 events 30s apart; then a 2000s gap; session B: 2 events
        for k in range(3):
            rows.append((user, base + dt.timedelta(seconds=30 * k)))
        for k in range(2):
            rows.append((user, base + dt.timedelta(seconds=2000 + 30 * k)))
    src = str(tmp_path / "events")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=600.0)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions").collect()
    # the 2000s gap closes session A for both users within the batch
    by_user = {r["user_id"]: r for r in got}
    assert set(by_user) == {1, 2}
    for r in got:
        assert r["n_events"] == 3
        assert r["session_end"] - r["session_start"] == 60.0


def test_dedup_stream_drops_in_window_duplicates(spark, tmp_path):
    import os

    from veranda_spark.streaming.append import dedup_stream

    src = str(tmp_path / "dups")
    rows = [
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 00:00:05", "a-dup"),
        (2, "2024-01-01 00:00:10", "b"),
        (1, "2024-01-01 00:01:00", "a-dup2"),
        (3, "2024-01-01 00:00:20", "c"),
    ]
    df = spark.createDataFrame(rows, "k long, ts string, val string").withColumn(
        "ingest_ts", F.col("ts").cast("timestamp")
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = dedup_stream(stream, ["k"], watermark_col="ingest_ts", delay="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {r["k"] for r in spark.sql("SELECT k FROM dedup_sink").collect()}
    n = spark.sql("SELECT count(*) AS n FROM dedup_sink").collect()[0]["n"]
    assert got == {1, 2, 3} and n == 3  # each key emitted exactly once
