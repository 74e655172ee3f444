"""Deterministic sampling / splitting for training-data curation.

Large-scale pipelines need samples and splits that are (a) reproducible
across runs and engines, (b) computable without a global shuffle of the
fact table, and (c) assignable per ROW (a document's split must never
depend on which partition it landed in).  Both operators key on
md5(id) — bit-identical in Spark and DuckDB, so both are fully
oracle-checkable — and are pure JVM Column ops.

- stratified_sample: top-n per stratum by hash order (window over the
  stratum key; each stratum's candidates shuffle once on the stratum
  key, the classic per-group top-k plan).
- hash_split: stable train/val/test assignment from the first 8 hex
  chars of md5(id) — a map-only operation, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic n-per-stratum sample: rank rows inside each stratum
    by md5(id) (a stable pseudo-random order) and keep the first n.

    One shuffle on the stratum key; at web scale prefer strata that are
    not pathologically hot, or pre-aggregate with a per-partition top-n
    (AQE's partial window pushdown already bounds the spill here)."""
    hk = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata_cols).orderBy(hk.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Stable train/val/test split: bucket = first 8 hex chars of
    md5(id) as a uint32 fraction of 2^32; cumulative weight ranges map
    buckets to split names.  Map-only (no shuffle), reproducible on any
    engine, and independent of row order or partitioning."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1 (got {total})")
    frac = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << 32))
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, wgt in items[:-1]:
        acc += wgt
        cond = frac < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def chunk_documents(
    df: DataFrame,
    window: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks (the
    pretraining context-window prep step): chunk i covers tokens
    [i·step, i·step + window) with step = window - overlap.

    All JVM Column ops — split → sequence of starts → explode → slice;
    no UDF, so chunking runs inside whole-stage codegen and the explode
    is the only row amplification (factor ≈ n_tokens / step).

    Start generation stops at the first start that reaches EOF: the last
    chunk is the smallest start whose window covers the final token, so
    no chunk is fully contained in its predecessor (a 460-token doc at
    window=512 yields exactly one chunk).  Whitespace-only documents
    yield no chunks."""
    if not 0 <= overlap < window:
        raise ValueError(f"need 0 <= overlap < window (got {overlap}, {window})")
    step = window - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size("_toks")
    max_start = F.when(n <= window, F.lit(0)).otherwise(
        F.lit(step) * F.floor((n - window + step - 1) / step)
    )
    out = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .withColumn("_toks", toks)
        .withColumn(
            "_start",
            F.explode(F.sequence(F.lit(0), max_start.cast("int"), F.lit(step))),
        )
        .select(
            F.col(id_col),
            (F.col("_start") / step).cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice("_toks", F.col("_start") + 1, window)).alias("chunk"),
            F.size(F.slice("_toks", F.col("_start") + 1, window)).alias("n_tok"),
        )
    )
    return out
