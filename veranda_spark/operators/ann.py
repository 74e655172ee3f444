"""Approximate-nearest-neighbor search over an embedding column.

- brute_force_topk: exact cosine top-k (the correctness baseline and the
  oracle for the approximate paths).  Scales as |queries| × |corpus| but
  the corpus never shuffles: queries broadcast, partial top-k per
  partition via window rank.
- ivf_topk: IVF-style scale path — corpus is clustered into nlist
  centroid cells (k-means on a sample, driver-side numpy); at query time
  only nprobe nearest cells are scanned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from veranda_spark.functions.vectors import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id: str = "query_id",
    query_emb: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: rank by (rounded cosine desc, id) so ordering is
    deterministic and reproducible in the SQL oracle."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).cast("array<double>").alias("emb")
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_emb).cast("array<double>").alias("qemb"),
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cos", F.round(cosine(F.col("emb"), F.col("qemb")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def _kmeans(sample: np.ndarray, nlist: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(centroids)):
            m = assign == j
            if m.any():
                centroids[j] = sample[m].mean(0)
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    sample_rows: int = 10_000,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id: str = "query_id",
    query_emb: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-bucketed approximate top-k: corpus rows carry a centroid-cell
    key; each query scans only its nprobe nearest cells.  At 100 TB the
    cell key is the table's partition column, so the probe is partition
    pruning, not a scan."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).cast("array<double>").alias("emb")
    )
    # orderBy before limit: a bare limit picks whatever partitions answer
    # first, making centroids (and the whole index) run-dependent.  The
    # ordered take keeps training deterministic; sampling bias toward low
    # ids is documented and harmless for unit-norm synthetic embeddings —
    # swap in a salted sample for adversarial id-correlated corpora.
    sample = np.stack(
        [r["emb"] for r in c.orderBy("vec_id").limit(sample_rows).collect()]
    )
    centroids = _kmeans(sample, nlist, seed=seed)

    @F.pandas_udf(T.IntegerType())
    def cell_of(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        d = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        return pd.Series(d.argmin(1).astype("int32"))

    def cells_of_query(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        d = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        return pd.Series([list(np.argsort(row)[:nprobe].astype("int32")) for row in d])

    probe_udf = F.pandas_udf(cells_of_query, T.ArrayType(T.IntegerType()))

    ck = c.withColumn("cell", cell_of(F.col("emb")))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_emb).cast("array<double>").alias("qemb"),
    ).withColumn("cell", F.explode(probe_udf(F.col("qemb"))))
    scored = ck.join(F.broadcast(q), "cell").withColumn(
        "cos", F.round(cosine(F.col("emb"), F.col("qemb")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )
