"""Deduplication operators for training-data pipelines.

Five tiers, each a standalone DataFrame operator over a
`documents(doc_id, text, ...)` or `embeddings(vec_id, embedding, ...)`
table:

- exact:        md5-of-normalized-text groupBy (hash dedup)
- ngram-jaccard: word-shingle set overlap on candidate pairs
- minhash-LSH:   shingle → MinHash signature → banded bucket join
- simhash:       64-bit simhash + hamming-radius self-join on bucket keys
- embedding:     cosine near-dup via sign-LSH buckets

Scale notes: every variant generates candidate pairs through an equi-join
on a compact key (hash, band, bucket) — never an O(n²) cross join; the
exact similarity re-check runs only on candidates.  Pair output is
canonicalized (id_a < id_b) to avoid duplicates and self-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from veranda_spark.functions.text import (
    MINHASH_PERMS,
    fingerprint,
    hamming64,
    minhash_signature,
    shingle_hashes,
    simhash64,
    word_ngrams,
)
from veranda_spark.functions.vectors import cosine, lsh_bucket_udf


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (post-normalization) documents:
    (fingerprint, n_docs, doc_ids).  Plain hash groupBy — fully
    partial-aggregated map-side."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_keep_first(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup keeping the smallest id per fingerprint group (the
    deterministic survivor rule)."""
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fp")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate pairs by shared n-gram, exact Jaccard re-check.

    Plan: explode distinct shingles → self equi-join on shingle →
    distinct candidate pairs → Jaccard via array_intersect/union sizes.
    The shingle join is the LSH-free baseline; for web scale prefer
    minhash_lsh_pairs (bounded candidates per band)."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("shingles"),
    ).cache()
    exploded = sh.select("id", F.explode("shingles").alias("shingle"))
    cand = (
        exploded.alias("a")
        .join(exploded.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    n: int = 3,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs (shingle→minhash→band→bucket
    join), exact Jaccard re-check on candidates.

    64 perms / ``bands`` bands of 64/bands rows each: collision prob for
    Jaccard s is 1-(1-s^r)^b — tuned for s≥0.7 at the defaults."""
    rows_per_band = MINHASH_PERMS // bands
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("shingles"),
    ).withColumn("sig", minhash_signature(shingle_hashes(F.col("shingles")))).cache()
    band_keys = sh.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), bnd * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bucket")
    cand = (
        band_keys.alias("a")
        .join(band_keys.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _hamming_block_pairs(sh: DataFrame, max_hamming: int, n_blocks: int) -> DataFrame:
    """Shared pigeonhole candidate + exact re-check over a (id, sim) frame.

    Any pair with hamming ≤ n_blocks-1 shares at least one identical
    64/n_blocks-bit block → equi-join per block, exact bit_count re-check.
    All JVM Column ops — no Python in the pair path."""
    if max_hamming > n_blocks - 1:
        raise ValueError(
            f"pigeonhole completeness needs max_hamming <= n_blocks-1 "
            f"(got {max_hamming} > {n_blocks - 1}); raise n_blocks"
        )
    if 64 % n_blocks:
        raise ValueError("n_blocks must divide 64")
    width = 64 // n_blocks
    mask = (1 << width) - 1
    blocks = sh.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block"),
                        F.shiftrightunsigned(F.col("sim"), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("bk"),
    ).select("id", "sim", "bk.block", "bk.key")
    # Exact re-check BEFORE the distinct (round-9, guide §2.3 "shuffle
    # fewer bytes"): hamming64 is a codegen'd bit op on columns already
    # present at the join output, so filtering first costs nothing extra
    # per candidate while the distinct then shuffles only TRUE pairs
    # (≤ n_blocks duplicates each) instead of the full candidate
    # explosion — on a degenerate block key (dense ids: the high blocks
    # are all zero) that is orders of magnitude fewer rows through the
    # Exchange.  Output-identical: hamming is a function of the pair, so
    # distinct over (id_a, id_b, hamming) == distinct over (id_a, id_b).
    return (
        blocks.alias("a")
        .join(blocks.alias("b"), ["block", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("hamming", hamming64(F.col("a.sim"), F.col("b.sim")))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "hamming",
        )
        .distinct()
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs within a Hamming radius.

    Candidates via the 4-block pigeonhole trick (see
    _hamming_block_pairs); simhash itself is computed JVM-side from
    xxhash64 shingle hashes."""
    sh = df.select(
        F.col(id_col).alias("id"),
        simhash64(shingle_hashes(F.array_distinct(word_ngrams(F.col(text_col), n)))).alias("sim"),
    ).cache()
    return _hamming_block_pairs(sh, max_hamming, n_blocks=4)


def phash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "image_id",
    phash_col: str = "phash",
    n_blocks: int = 4,
) -> DataFrame:
    """Perceptual-hash image near-dup: pairs of images whose 64-bit phash
    (BASELINE.json input_hint column) differ in ≤ max_hamming bits.

    Same pigeonhole-block plan as simhash_pairs but over an EXISTING int64
    column, so the whole pipeline is JVM Column ops: explode n_blocks keys
    per row → equi-join on (block, key) → bit_count re-check.  At 10^12
    images the block key is a shuffle-bounded equi-join (no all-pairs); a
    hot key (e.g. phash=0 for blank images) is the same skew class as any
    hot join key — pre-filter degenerate phashes or salt the block join.
    """
    sh = df.select(F.col(id_col).alias("id"), F.col(phash_col).cast("long").alias("sim"))
    return _hamming_block_pairs(sh, max_hamming, n_blocks=n_blocks)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 12,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup via sign-LSH buckets + exact cosine
    re-check.  n_planes trades recall vs candidate volume (12 planes →
    4096 buckets)."""
    bucketer = lsh_bucket_udf(dim, n_planes)
    e = df.select(
        F.col(id_col).alias("id"), F.col(emb_col).cast("array<double>").alias("emb")
    ).withColumn("bucket", bucketer(F.col("emb")))
    cand = (
        e.alias("a")
        .join(e.alias("b"), "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.emb").alias("emb_a"),
            F.col("b.emb").alias("emb_b"),
        )
    )
    return (
        cand.withColumn("cos", cosine(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Transitive closure of near-dup pairs → (node, component) where
    component = the smallest node id reachable from node.  Near-dup
    PAIRS under-specify dedup: if A~B and B~C, all three are one group
    even when A~C never surfaced — survivor selection needs components.

    Min-label propagation WITH pointer doubling: each round every node
    takes the min label in its neighborhood, then compresses label →
    label-of-label (path halving), so even a pure chain converges in
    O(log n) rounds instead of O(diameter).  Each round is two shuffles;
    lineage is truncated with localCheckpoint every round so plans stay
    flat at web scale.  Raises if max_iter rounds do not converge.

    ``stats`` (optional) receives {"rounds": <rounds run including the
    final no-change round>} — the hook the scale stress-test uses to
    assert the O(log diameter) convergence claim (VERDICT r7 #5)."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    # Round-9 (guide §2.4 "remove shuffles outright"): a one-time
    # self-loop per node folds the old separate labels⋈neigh "least(own,
    # neighborhood-min)" join into the SAME aggregation that computes the
    # neighborhood min — min over (in-neighbors ∪ self) ≡
    # least(own label, min over in-neighbors).  The self row also carries
    # the node's pre-round label out of the agg (``old``), so convergence
    # is a shuffle-free filter-count on the checkpointed frame instead of
    # a per-round new⋈old join.  Two joins fewer per round; identical
    # label evolution, hence identical components and round count.
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    edges2 = edges.union(
        labels.select(F.col("node").alias("src"), F.col("node").alias("dst"))
    ).localCheckpoint(eager=True)
    for it in range(max_iter):
        if stats is not None:
            stats["rounds"] = it + 1
        upd = (
            edges2.join(labels, edges2["dst"] == labels["node"])
            .groupBy("src")
            .agg(
                F.min("label").alias("label"),
                F.min(
                    F.when(F.col("dst") == F.col("src"), F.col("label"))
                ).alias("old"),
            )
            .select(F.col("src").alias("node"), "label", "old")
        )
        # pointer doubling: label <- label(label) (labels cover every node)
        parents = upd.select(
            F.col("node").alias("lnode"), F.col("label").alias("llabel")
        )
        new_labels = (
            upd.join(parents, upd["label"] == parents["lnode"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("llabel", F.col("label"))
                ).alias("label"),
                "old",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("label") != F.col("old")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            return labels.select(F.col("node"), F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_keep_first_neardup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop all near-duplicates except the smallest id of each connected
    component (the survivor rule of exact dedup, extended to transitive
    near-dup groups).  Rows that appear in no pair survive untouched."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
