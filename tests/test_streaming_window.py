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
