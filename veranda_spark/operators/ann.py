"""Approximate-nearest-neighbor search over an embedding column.

- brute_force_topk: exact cosine top-k (the correctness baseline and the
  oracle for the approximate paths).  Scales as |queries| × |corpus| but
  the corpus never shuffles: queries broadcast, partial top-k per
  partition via window rank.
- ivf_topk: IVF-style scale path — corpus is clustered into nlist
  centroid cells (k-means on a sample, driver-side numpy); at query time
  only nprobe nearest cells are scanned.
- ivf_pq_topk: IVF + product quantization — corpus vectors compress to m
  sub-space code bytes; the candidate scan is an ADC (asymmetric distance
  computation) over codes via per-query lookup tables, entirely JVM-side
  (element_at + aggregate), then an exact cosine re-rank of the top
  refine×k candidates.  At 100 TB the code table is ~32× smaller than the
  raw embeddings, so the probe scan reads code bytes, not vectors, and
  only the surviving candidates' embeddings are fetched (equi-join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from veranda_spark.functions.vectors import cosine, dot, norm


def _cos_pre(emb, qemb, n_emb, n_qemb):
    """cosine with per-side norms precomputed BELOW the join: the old
    per-pair ``cosine(a, b)`` re-ran ``norm(a)`` and ``norm(b)`` (two
    array aggregates) for every (corpus × query) pair; hoisting them to
    the input projections cuts the pair work to one dot product
    (round-9, guide §1.2 per-task work).  Bit-identical: same dot, same
    norms, same ``dot / (na * nb)`` association."""
    return dot(emb, qemb) / (n_emb * n_qemb)


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
    ).withColumn("_ne", norm(F.col("emb")))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_emb).cast("array<double>").alias("qemb"),
    ).withColumn("_nq", norm(F.col("qemb")))
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cos",
        F.round(
            _cos_pre(F.col("emb"), F.col("qemb"), F.col("_ne"), F.col("_nq")),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def _sq_dists(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances via a per-centroid loop.  Each column
    is ``((mat - c_j) ** 2).sum(-1)`` — the same values reduced along the
    same axis as the broadcast form
    ``((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)``, so
    argmins (and hence assignments/probe lists) are bit-identical — but
    WITHOUT materializing the n×k×dim float64 intermediate, whose memory
    traffic dominated the old form (round-9, guide §4.2: whole-batch
    native code, smallest working set)."""
    out = np.empty((mat.shape[0], len(centroids)))
    for j, cj in enumerate(centroids):
        out[:, j] = ((mat - cj) ** 2).sum(-1)
    return out


def _kmeans(sample: np.ndarray, nlist: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)]
    for _ in range(iters):
        assign = _sq_dists(sample, centroids).argmin(1)
        for j in range(len(centroids)):
            m = assign == j
            if m.any():
                centroids[j] = sample[m].mean(0)
    return centroids


def _train_sample(c: DataFrame, sample_rows: int, seed: int) -> np.ndarray:
    """Deterministic unbiased training sample: order by a seeded hash of
    the id, not the id itself.  A bare limit picks whatever partitions
    answer first (run-dependent); an id-ordered take is deterministic but
    biased toward low ids on id-correlated corpora.  Hash order is both —
    every row has equal probability of landing in the take, and the same
    (corpus, seed) always yields the same sample.  Collected via
    ``toPandas`` (Arrow) — an order of magnitude cheaper than row-wise
    ``collect`` for 10k × dim array rows (round-9, guide §6 "Arrow for
    driver transfers"); same rows, same order."""
    pdf = (
        c.orderBy(F.xxhash64(F.col("vec_id"), F.lit(seed)), F.col("vec_id"))
        .limit(sample_rows)
        .toPandas()
    )
    return np.stack(pdf["emb"].to_numpy())


def _cosine_rank(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def _cell_udf(centroids: np.ndarray):
    """Arrow-batched nearest-centroid assignment (the corpus encoder)."""

    @F.pandas_udf(T.IntegerType())
    def cell_of(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        return pd.Series(_sq_dists(m, centroids).argmin(1).astype("int32"))

    return cell_of


def _select_probe_cells(
    mat: np.ndarray, centroids: np.ndarray, nprobe: int
) -> np.ndarray:
    """THE probe-cell selection rule, (batch, nprobe) int32 — the single
    source of truth shared by the prune-list path (_probe_cells_udf) and
    the PQ LUT path (_pq_probe_udf).  ADVICE r7: the two paths used to
    argsort independently; any divergence (tie-break, metric, rotation
    order) would silently prune cells the LUT frame probes.
    kind="stable" pins equal-distance ties to lowest-cell-id order —
    review r8 pass-1 #3: the default quicksort is NOT stable, so ties
    were only accidentally consistent."""
    return np.argsort(
        _sq_dists(mat, centroids), axis=1, kind="stable"
    )[:, :nprobe].astype("int32")


def _probe_cells_udf(centroids: np.ndarray, nprobe: int):
    def cells_of_query(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        return pd.Series(
            [list(row) for row in _select_probe_cells(m, centroids, nprobe)]
        )

    return F.pandas_udf(cells_of_query, T.ArrayType(T.IntegerType()))


def _explode_query_cells(
    queries: DataFrame,
    centroids: np.ndarray,
    nprobe: int,
    query_id: str,
    query_emb: str,
) -> DataFrame:
    """(query_id, qemb, cell) — one row per (query, probed cell).  Built
    ONCE per batch; the persisted-index path persists it so the prune
    list and the join both read the same single UDF evaluation."""
    probe_udf = _probe_cells_udf(centroids, nprobe)
    return queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_emb).cast("array<double>").alias("qemb"),
    ).withColumn("cell", F.explode(probe_udf(F.col("qemb"))))


def _ivf_cosine_score(ck: DataFrame, qx: DataFrame, k: int) -> DataFrame:
    """Exact-cosine rank of a cell-keyed corpus against the pre-exploded
    (query_id, qemb, cell) frame — shared by the train-per-call path
    (ivf_topk) and the persisted-index path.  Norms are hoisted below
    the join (see _cos_pre)."""
    scored = (
        ck.withColumn("_ne", norm(F.col("emb")))
        .join(
            F.broadcast(qx.withColumn("_nq", norm(F.col("qemb")))), "cell"
        )
        .withColumn(
            "cos",
            F.round(
                _cos_pre(
                    F.col("emb"), F.col("qemb"), F.col("_ne"), F.col("_nq")
                ),
                6,
            ),
        )
    )
    return _cosine_rank(scored, k)


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
    pruning, not a scan.  Trains per call — when one corpus serves many
    query batches, build_ivf_index + query_ivf_index amortize the
    training and assignment."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).cast("array<double>").alias("emb")
    )
    sample = _train_sample(c, sample_rows, seed)
    centroids = _kmeans(sample, nlist, seed=seed)
    ck = c.withColumn("cell", _cell_udf(centroids)(F.col("emb")))
    qx = _explode_query_cells(queries, centroids, nprobe, query_id, query_emb)
    return _ivf_cosine_score(ck, qx, k)


def _train_pq(sample: np.ndarray, m: int, ncodes: int, seed: int = 42) -> np.ndarray:
    """Per-subspace codebooks, shape (m, ncodes, dim//m) — k-means per
    subspace on the training sample (raw vectors or residuals, depending
    on what the caller passes)."""
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return np.stack(
        [
            _kmeans(np.ascontiguousarray(sample[:, j * sub : (j + 1) * sub]),
                    ncodes, seed=seed + j)
            for j in range(m)
        ]
    )


def _train_opq(
    train: np.ndarray, m: int, ncodes: int, seed: int, iters: int = 5
) -> np.ndarray:
    """OPQ rotation (Ge et al., CVPR 2013, non-parametric variant):
    alternate PQ codebook training in the rotated space with the
    orthogonal Procrustes update R = (U·Vᵀ)ᵀ from svd(Xᵀ·X̂).  The
    rotation redistributes variance across subspaces so independent
    per-subspace codebooks waste fewer bits on correlated dims.  Runs
    driver-side on the training sample only."""
    dim = train.shape[1]
    sub = dim // m
    rot = np.eye(dim)
    for it in range(iters):
        xr = train @ rot.T
        books = _train_pq(xr, m, ncodes, seed=seed + 101 + it)
        xhat = np.empty_like(xr)
        for j in range(m):
            s = xr[:, j * sub : (j + 1) * sub]
            dj = ((s[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
            xhat[:, j * sub : (j + 1) * sub] = books[j][dj.argmin(1)]
        u, _, vt = np.linalg.svd(train.T @ xhat)
        rot = (u @ vt).T
    return rot


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ncodes: int = 32,
    refine: int = 4,
    sample_rows: int = 10_000,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id: str = "query_id",
    query_emb: str = "embedding",
    seed: int = 42,
    residual: bool = True,
    opq: bool = False,
    opq_iters: int = 5,
) -> DataFrame:
    """IVF-PQ approximate top-k with exact re-rank.

    ``residual=True`` (default, the standard IVF-PQ form) quantizes
    (vector − cell centroid) so the codebooks only need to span the
    within-cell spread — better recall per code byte; the query LUT is
    then per (query, probed cell).  ``residual=False`` quantizes raw
    vectors with a single LUT per query.  ``opq=True`` additionally
    learns an OPQ rotation (Ge et al. 2013) on the training sample and
    applies it before the subspace split — worthwhile on real corpora
    with correlated dims; a no-op-in-expectation on isotropic synthetic
    embeddings.

    Plan (each stage is the one you'd run at 10^12 vectors):
      1. encode: corpus → (vec_id, cell, codes[m]) via one Arrow pass —
         the code table is the only thing the probe scan ever reads;
      2. probe: each query explodes to its nprobe cells and BROADCASTS a
         flattened (m × ncodes) distance lookup table;
      3. ADC scan: codes ⋈ queries on cell; approx distance =
         Σ_j lut[j·ncodes + code_j] — pure JVM Column ops
         (element_at + aggregate), no Python per candidate;
      4. top refine·k per query by ADC, then fetch ONLY those candidates'
         embeddings (equi-join on vec_id) for the exact cosine re-rank.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).cast("array<double>").alias("emb")
    )
    sample = _train_sample(c, sample_rows, seed)
    centroids = _kmeans(sample, nlist, seed=seed)
    ncodes = min(ncodes, max(2, len(sample) // 4))
    if residual:
        assign = _sq_dists(sample, centroids).argmin(1)
        train = sample - centroids[assign]
    else:
        train = sample
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    # OPQ: orthonormal rotation applied before the subspace split;
    # L2 distances are invariant under it, so ADC distances in the
    # rotated space equal the originals and the exact re-rank is
    # untouched — only code quality changes.
    rot = _train_opq(train, m, ncodes, seed, iters=opq_iters) if opq else None
    if rot is not None:
        train = train @ rot.T
    books = _train_pq(train, m, ncodes, seed=seed)  # (m, ncodes, sub)

    enc = c.select(
        "vec_id",
        _pq_encode_udf(centroids, books, rot, residual)(F.col("emb")).alias("e"),
    ).select("vec_id", "e.cell", "e.codes")
    qp = _explode_query_luts(
        queries, centroids, books, rot, residual, nprobe,
        query_id, query_emb,
    )
    return _pq_adc_score(enc, c, qp, books.shape[1], k, refine)


def _pq_encode_udf(
    centroids: np.ndarray, books: np.ndarray, rot, residual: bool
):
    """Arrow-batched IVF-PQ corpus encoder → (cell, codes[m])."""
    m, sub = books.shape[0], books.shape[2]

    def _rotate(mat: np.ndarray) -> np.ndarray:
        return mat if rot is None else mat @ rot.T

    def _subspace_codes(mat: np.ndarray) -> np.ndarray:
        codes = np.empty((len(mat), m), dtype="int32")
        for j in range(m):
            s = mat[:, j * sub : (j + 1) * sub]
            dj = ((s[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
            codes[:, j] = dj.argmin(1)
        return codes

    @F.pandas_udf("cell int, codes array<int>")
    def encode(emb: pd.Series) -> pd.DataFrame:
        mat = np.stack(emb.to_numpy())
        cell = _sq_dists(mat, centroids).argmin(1).astype("int32")
        codes = _subspace_codes(
            _rotate(mat - centroids[cell] if residual else mat)
        )
        return pd.DataFrame({"cell": cell, "codes": list(codes)})

    return encode


def _pq_probe_udf(
    centroids: np.ndarray, books: np.ndarray, rot, residual: bool, nprobe: int
):
    """Per-query probe cells + flattened (m × ncodes) ADC lookup tables."""
    m, ncodes, sub = books.shape

    def _rotate(mat: np.ndarray) -> np.ndarray:
        return mat if rot is None else mat @ rot.T

    def _lut_of(vecs: np.ndarray) -> np.ndarray:
        luts = np.empty((len(vecs), m * ncodes), dtype="float64")
        for j in range(m):
            s = vecs[:, j * sub : (j + 1) * sub]
            luts[:, j * ncodes : (j + 1) * ncodes] = (
                (s[:, None, :] - books[j][None, :, :]) ** 2
            ).sum(-1)
        return luts

    def probe_lut(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        cells = _select_probe_cells(mat, centroids, nprobe)
        out = []
        for i in range(len(mat)):
            probes = []
            if residual:
                res = mat[i][None, :] - centroids[cells[i]]  # (nprobe, dim)
                luts = _lut_of(_rotate(res))
                for k_, cell in enumerate(cells[i]):
                    probes.append({"cell": int(cell), "lut": list(luts[k_])})
            else:
                lut = _lut_of(_rotate(mat[i][None, :]))[0]
                for cell in cells[i]:
                    probes.append({"cell": int(cell), "lut": list(lut)})
            out.append(probes)
        return pd.Series(out)

    return F.pandas_udf(
        probe_lut, "array<struct<cell: int, lut: array<double>>>"
    )


def _explode_query_luts(
    queries: DataFrame,
    centroids: np.ndarray,
    books: np.ndarray,
    rot,
    residual: bool,
    nprobe: int,
    query_id: str,
    query_emb: str,
) -> DataFrame:
    """(query_id, qemb, cell, lut) — one row per (query, probed cell)
    with the flattened ADC lookup table.  Built ONCE per batch; the
    persisted-index path persists it so the prune list and the ADC join
    both read the same single UDF evaluation."""
    probe = _pq_probe_udf(centroids, books, rot, residual, nprobe)
    return queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_emb).cast("array<double>").alias("qemb"),
    ).select(
        "query_id", "qemb", F.explode(probe(F.col("qemb"))).alias("p")
    ).select(
        "query_id", "qemb",
        F.col("p.cell").alias("cell"), F.col("p.lut").alias("lut"),
    )


def _pq_adc_score(
    enc: DataFrame,
    c_emb: DataFrame,
    qp: DataFrame,
    ncodes: int,
    k: int,
    refine: int,
) -> DataFrame:
    """ADC scan over (cell, codes) + exact re-rank of the refine·k
    survivors — shared by ivf_pq_topk and the persisted-index path.
    ``qp`` is the pre-exploded (query_id, qemb, cell, lut) frame."""
    # ADC: JVM-side lookup-table sum over the m code entries
    adc_terms = F.transform(
        F.col("codes"),
        lambda code, j: F.element_at(F.col("lut"), (j * ncodes + code + 1).cast("int")),
    )
    scored = (
        enc.join(F.broadcast(qp), "cell")
        .withColumn("adc", F.aggregate(adc_terms, F.lit(0.0), lambda a, x: a + x))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("vec_id").asc())
    cand = (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= refine * k)
        .select("query_id", "vec_id", "qemb")
    )
    exact = cand.join(c_emb.select("vec_id", "emb"), "vec_id").withColumn(
        "cos", F.round(cosine(F.col("emb"), F.col("qemb")), 6)
    )
    return _cosine_rank(exact, k)


# ---- persisted IVF / IVF-PQ index (build once, query many) -----------------


def _index_paths(path: str) -> tuple[str, str]:
    import os

    return os.path.join(path, "codes"), os.path.join(path, "meta")


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    nlist: int = 16,
    pq: bool = False,
    m: int = 8,
    ncodes: int = 32,
    residual: bool = True,
    opq: bool = False,
    opq_iters: int = 5,
    sample_rows: int = 10_000,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 42,
) -> int:
    """Train ONCE and persist (VERDICT r5 #3): ivf_topk / ivf_pq_topk
    retrain k-means and re-assign the whole corpus per call — fine for a
    single batch, wasteful when many query batches hit the same corpus.
    This writes two managed versioned tables (io/table.py machinery,
    same time-travel/compaction semantics as every other table):

    * ``<path>/codes`` — (vec_id, emb, cell[, codes]) PARTITIONED BY the
      IVF cell, so a query batch's probe set becomes parquet partition
      pruning; with pq=True the ADC scan column-prunes to
      (vec_id, cell, codes) and embeddings are only read for the
      refine·k candidates.
    * ``<path>/meta`` — centroids, PQ codebooks, OPQ rotation rows and a
      JSON param row; dim-sized, collected driver-side at query time.

    Returns the codes-table version."""
    import json

    from veranda_spark.io.table import create_table

    spark = corpus.sparkSession
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).cast("array<double>").alias("emb"),
    )
    sample = _train_sample(c, sample_rows, seed)
    centroids = _kmeans(sample, nlist, seed=seed)
    dim = sample.shape[1]
    books = rot = None
    if pq:
        ncodes = min(ncodes, max(2, len(sample) // 4))
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        if residual:
            assign = _sq_dists(sample, centroids).argmin(1)
            train = sample - centroids[assign]
        else:
            train = sample
        rot = _train_opq(train, m, ncodes, seed, iters=opq_iters) if opq else None
        if rot is not None:
            train = train @ rot.T
        books = _train_pq(train, m, ncodes, seed=seed)

    if pq:
        ck = c.select(
            "vec_id", "emb",
            _pq_encode_udf(centroids, books, rot, residual)(F.col("emb")).alias("e"),
        ).select("vec_id", "emb", "e.cell", "e.codes")
    else:
        ck = c.select(
            "vec_id", "emb", _cell_udf(centroids)(F.col("emb")).alias("cell")
        )
    codes_path, meta_path = _index_paths(path)
    v = create_table(ck, codes_path, partition_by="cell")

    rows: list[tuple] = [(
        "param", None, None, None,
        json.dumps({"nlist": int(len(centroids)), "pq": bool(pq),
                    "m": int(m), "ncodes": int(ncodes),
                    "residual": bool(residual), "opq": bool(opq),
                    "dim": int(dim), "seed": int(seed)}),
    )]
    for i, cvec in enumerate(centroids):
        rows.append(("centroid", i, None, [float(x) for x in cvec], None))
    if books is not None:
        for j in range(books.shape[0]):
            for code in range(books.shape[1]):
                rows.append(
                    ("book", j, code, [float(x) for x in books[j, code]], None)
                )
    if rot is not None:
        for i, rvec in enumerate(rot):
            rows.append(("rot", i, None, [float(x) for x in rvec], None))
    # dim-sized meta in ONE partition/file (round-9, guide §6 small
    # files; see session.local_df for why not createDataFrame/coalesce)
    from veranda_spark.session import local_df

    meta = local_df(
        spark, rows, "kind string, i int, j int, vec array<double>, sval string"
    )
    create_table(meta, meta_path)
    return v


def load_ivf_index(spark, path: str) -> dict:
    """Driver-side index metadata: params + centroids (+ codebooks +
    rotation).  Dim-sized — the same collect class as the salt maps and
    k-means training sample, never the corpus."""
    import json

    from veranda_spark.io.table import read_table

    _, meta_path = _index_paths(path)
    rows = read_table(spark, meta_path).collect()
    params = None
    cents: dict[int, list] = {}
    books: dict[tuple[int, int], list] = {}
    rot: dict[int, list] = {}
    for r in rows:
        if r["kind"] == "param":
            params = json.loads(r["sval"])
        elif r["kind"] == "centroid":
            cents[r["i"]] = r["vec"]
        elif r["kind"] == "book":
            books[(r["i"], r["j"])] = r["vec"]
        elif r["kind"] == "rot":
            rot[r["i"]] = r["vec"]
    if params is None or not cents:
        raise ValueError(f"no index metadata at {path}")
    idx = {
        "params": params,
        "centroids": np.array([cents[i] for i in sorted(cents)]),
        "books": None,
        "rot": None,
    }
    if books:
        m, ncodes = params["m"], params["ncodes"]
        idx["books"] = np.array(
            [[books[(j, code)] for code in range(ncodes)] for j in range(m)]
        )
    if rot:
        idx["rot"] = np.array([rot[i] for i in sorted(rot)])
    return idx


def query_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    refine: int = 4,
    query_id: str = "query_id",
    query_emb: str = "embedding",
    version: int | None = None,
) -> DataFrame:
    """Serve a query batch from a persisted index: NO k-means job, NO
    corpus assignment pass — the only corpus work is a partition-pruned
    scan of the probed cells.  The probe-cell union across the batch
    (≤ nlist ints — the ONLY thing collected) comes from a cells-only
    projection and is pushed as a literal IN filter so the parquet
    reader prunes cell= directories up front (hand-rolled dynamic
    partition pruning).  The scoring frame itself stays LAZY and
    DISTRIBUTED: no persist pins executor storage across batches
    (ADVICE r6), and nothing heavier than the cell list rides through
    the driver (review r7 #4 — the brief r7 collect-and-rebuild
    variant shipped per-(query, cell) PQ lookup tables driver-side,
    ~GBs for big batches).  Cost accounting: the cheap centroid
    cell-assignment (batch × nlist dot products) runs twice — once for
    the collect, once inside the scoring plan — while the expensive
    per-cell LUT construction runs exactly once, inside the scoring
    plan; the job-count pytest still proves zero corpus passes."""
    from veranda_spark.io.table import read_table

    idx = load_ivf_index(spark, path)
    p = idx["params"]
    codes_path, _ = _index_paths(path)
    codes = read_table(spark, codes_path, version)

    cells_probe = _explode_query_cells(
        queries, idx["centroids"], nprobe, query_id, query_emb
    )
    probed = sorted(
        r["cell"] for r in cells_probe.select("cell").distinct().collect()
    )
    pruned = codes.filter(F.col("cell").isin(probed))

    if p["pq"]:
        qx = _explode_query_luts(
            queries, idx["centroids"], idx["books"], idx["rot"],
            p["residual"], nprobe, query_id, query_emb,
        )
        enc = pruned.select("vec_id", "cell", "codes")
        return _pq_adc_score(
            enc, pruned, qx, idx["books"].shape[1], k, refine
        )
    return _ivf_cosine_score(
        pruned.select("vec_id", "emb", "cell"), cells_probe, k
    )
