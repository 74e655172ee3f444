"""Vector/embedding column math — built-in array functions, JVM-side.

Dot products, norms and cosine similarity over `array<float/double>`
columns via ``F.zip_with`` + ``F.aggregate`` (whole-stage codegen; no
Python in the hot path), plus a deterministic random-hyperplane LSH for
bucketed near-neighbor search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Pandas UDF: embedding → int64 sign-LSH bucket (batch matmul)."""
    planes = hyperplanes(dim, n_planes, seed)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def bucket(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        signs = (m @ planes.T) > 0
        return pd.Series((signs @ weights).astype(np.int64))

    return bucket
