"""Dedup + ANN operators vs brute-force goldens on small corpora."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from veranda_spark.operators.ann import brute_force_topk, ivf_topk
from veranda_spark.operators.dedup import (
    dedup_keep_first,
    embedding_neardup_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    phash_neardup_pairs,
    simhash_pairs,
)

WORDS = "the quick brown fox jumps over a lazy dog near the old river bank".split()


def _mk_docs(n=120, seed=7):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        base = " ".join(rng.choice(WORDS, size=30))
        docs.append((i, base))
        if i % 10 == 0:  # exact duplicate
            docs.append((i + 1000, base))
        if i % 15 == 0:  # near duplicate: mutate one word
            toks = base.split()
            toks[5] = "MUTANT"
            docs.append((i + 2000, " ".join(toks)))
    return docs


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_mk_docs(), schema="doc_id long, text string").cache()


def test_exact_duplicates(spark, docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 12  # i % 10 == 0 for i in 0..119
    for g in groups:
        assert g["n_docs"] == 2 and g["doc_ids"][1] - g["doc_ids"][0] == 1000
    kept = dedup_keep_first(docs)
    assert kept.count() == docs.count() - 12
    assert kept.filter(F.col("doc_id") >= 1000).filter(F.col("doc_id") < 2000).count() == 0


def _brute_jaccard_pairs(docs_list, n, threshold):
    def sh(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))}

    out = set()
    for i, (ida, ta) in enumerate(docs_list):
        sa = sh(ta)
        for idb, tb in docs_list[i + 1 :]:
            sb = sh(tb)
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                out.add((min(ida, idb), max(ida, idb)))
    return out


def test_ngram_jaccard_pairs_matches_bruteforce(spark, docs):
    got = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    want = _brute_jaccard_pairs(_mk_docs(), 3, 0.8)
    assert got == want
    assert len(want) >= 12  # at least the exact dups


def test_minhash_lsh_recall(spark, docs):
    got = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, threshold=0.8).collect()}
    want = _brute_jaccard_pairs(_mk_docs(), 3, 0.8)
    # exact Jaccard re-check bounds precision at 1.0; LSH bounds recall
    assert got <= want
    assert len(got) >= 0.9 * len(want)


def test_simhash_finds_exact_dups(spark, docs):
    got = simhash_pairs(docs, max_hamming=3).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    exact = {(i, i + 1000) for i in range(0, 120, 10)}
    assert exact <= pairs  # hamming 0 for identical docs
    for r in got:
        assert r["hamming"] <= 3


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((80, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(80)]
    # near-dups: tiny perturbation of first 10
    rows += [
        (1000 + i, [float(x) for x in base[i] + rng.standard_normal(16) * 0.01])
        for i in range(10)
    ]
    return spark.createDataFrame(rows, schema="vec_id long, embedding array<double>").cache()


def test_embedding_neardup(spark, embeddings):
    got = embedding_neardup_pairs(embeddings, threshold=0.95, dim=16, n_planes=8).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    want = {(i, 1000 + i) for i in range(10)}
    assert len(want & pairs) >= 8  # LSH recall
    for r in got:
        assert r["cos"] >= 0.95


def test_brute_force_topk_matches_numpy(spark, embeddings):
    qs = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_topk(embeddings, qs, k=5).collect()
    rows = embeddings.collect()
    mat = {r["vec_id"]: np.array(r["embedding"]) for r in rows}
    for qid in range(3):
        q = mat[qid]
        sims = [
            (round(float(np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q))), 6), vid)
            for vid, v in mat.items()
        ]
        want = [vid for s, vid in sorted(sims, key=lambda t: (-t[0], t[1]))[:5]]
        mine = [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["query_id"] == qid]
        assert mine == want


def test_ivf_topk_recall(spark, embeddings):
    qs = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(embeddings, qs, k=5).collect()
    approx = ivf_topk(embeddings, qs, k=5, nlist=8, nprobe=4, sample_rows=200).collect()
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    ap = {(r["query_id"], r["vec_id"]) for r in approx}
    assert len(ex & ap) / len(ex) >= 0.8


def test_phash_neardup_vs_brute(spark):
    # crafted 64-bit phashes: random bases plus 1/2/3/5-bit flips, so the
    # pigeonhole block join has real positives AND >max_hamming negatives
    rng = np.random.default_rng(11)
    rows = []
    bases = [int(x) for x in rng.integers(-(2**63), 2**63, size=20, dtype=np.int64)]
    i = 0
    for b in bases:
        rows.append((f"img_{i:04d}", b)); i += 1
        for nflips in (1, 2, 3, 5):
            bits = rng.choice(64, size=nflips, replace=False)
            v = b & (2**64 - 1)
            for bit in bits:
                v ^= 1 << int(bit)
            v = v - 2**64 if v >= 2**63 else v
            rows.append((f"img_{i:04d}", int(v))); i += 1
    df = spark.createDataFrame(rows, schema="image_id string, phash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_neardup_pairs(df, max_hamming=3).collect()
    }
    want = set()
    for (ia, pa), (ib, pb) in (
        ((a, b) for idx, a in enumerate(rows) for b in rows[idx + 1 :])
    ):
        h = bin((pa ^ pb) & (2**64 - 1)).count("1")
        if h <= 3:
            key = (ia, ib) if ia < ib else (ib, ia)
            want.add((*key, h))
    assert got == want and len(want) >= 20


def test_phash_neardup_radius_guard(spark):
    df = spark.createDataFrame([("a", 1)], schema="image_id string, phash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_neardup_pairs(df, max_hamming=4, n_blocks=4)


@pytest.mark.parametrize(
    "residual,opq", [(True, False), (False, False), (True, True)]
)
def test_ivf_pq_topk_recall(spark, embeddings, residual, opq):
    from veranda_spark.operators.ann import ivf_pq_topk

    qs = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(embeddings, qs, k=5).collect()
    approx = ivf_pq_topk(
        embeddings, qs, k=5, nlist=8, nprobe=4, m=8, ncodes=16, refine=4,
        sample_rows=200, residual=residual, opq=opq,
    ).collect()
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    ap = {(r["query_id"], r["vec_id"]) for r in approx}
    assert len(ex & ap) / len(ex) >= 0.8
    # re-ranked cosines are exact for true positives
    ex_cos = {(r["query_id"], r["vec_id"]): r["cos"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        if key in ex_cos:
            assert abs(r["cos"] - ex_cos[key]) < 1e-9


def test_connected_components_vs_union_find(spark):
    from veranda_spark.operators.dedup import (
        connected_components,
        dedup_keep_first_neardup,
    )

    rng = np.random.default_rng(19)
    # random graph over 200 nodes: chains + cliques + isolated pairs
    edges = set()
    for i in range(0, 50):  # chain 0-1-2-...-50
        edges.add((i, i + 1))
    for base in (100, 110, 120):  # 5-cliques
        for i in range(5):
            for j in range(i + 1, 5):
                edges.add((base + i, base + j))
    for _ in range(40):  # random pairs
        a, b = rng.integers(130, 200, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    pdf = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(pdf).collect()}

    # union-find reference
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    assert got == want

    # survivor rule: exactly one doc per component survives
    nodes = sorted(want)
    docs = spark.createDataFrame([(n, f"text {n}") for n in nodes] + [(9999, "solo")],
                                 "doc_id long, text string")
    kept = {r["doc_id"] for r in dedup_keep_first_neardup(docs, pdf).collect()}
    assert kept == set(want.values()) | {9999}


def test_opq_rotation_is_orthonormal():
    from veranda_spark.operators.ann import _train_opq

    rng = np.random.default_rng(5)
    # correlated dims: OPQ's home turf (independent subspaces waste bits)
    base = rng.standard_normal((500, 4))
    train = np.hstack([base, base @ rng.standard_normal((4, 12)) * 0.3])
    rot = _train_opq(train, m=4, ncodes=8, seed=1, iters=3)
    np.testing.assert_allclose(rot @ rot.T, np.eye(16), atol=1e-10)
    # rotation must not change pairwise L2 distances (ADC validity)
    d0 = np.linalg.norm(train[0] - train[1])
    d1 = np.linalg.norm(train[0] @ rot.T - train[1] @ rot.T)
    assert abs(d0 - d1) < 1e-9


def test_persisted_ivf_index_reuse(spark, embeddings, tmp_path):
    # VERDICT r5 #3: build once, query many — the persisted path must
    # return EXACTLY what the train-per-call path returns (same seed ⇒
    # same deterministic k-means) while never touching the source corpus
    # at query time.  Asserted directly: the corpus is wrapped in an
    # accumulator-instrumented Arrow pass — training/build bump it,
    # query_ivf_index must leave it untouched (its only corpus work is
    # the partition-pruned scan of the persisted codes table).
    from veranda_spark.operators.ann import build_ivf_index, query_ivf_index

    sc = spark.sparkContext
    acc = sc.accumulator(0)

    def touch(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    corpus = embeddings.mapInPandas(
        touch, schema="vec_id long, embedding array<double>"
    )
    qs = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf_idx")
    build_ivf_index(corpus, path, nlist=8, sample_rows=200)
    assert acc.value > 0  # build reads the corpus (train + assign)

    fresh = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ivf_topk(
            corpus, qs, k=5, nlist=8, nprobe=4, sample_rows=200
        ).collect()
    )
    before = acc.value
    served = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in query_ivf_index(spark, path, qs, k=5, nprobe=4).collect()
    )
    assert served == fresh
    assert acc.value == before  # NO corpus pass on the query path


def test_persisted_ivf_pq_index_matches_per_call(spark, embeddings, tmp_path):
    from veranda_spark.operators.ann import (
        build_ivf_index,
        ivf_pq_topk,
        load_ivf_index,
        query_ivf_index,
    )

    qs = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "pq_idx")
    build_ivf_index(
        embeddings, path, nlist=8, pq=True, m=8, ncodes=16,
        residual=True, opq=True, opq_iters=2, sample_rows=200,
    )
    idx = load_ivf_index(spark, path)
    assert idx["params"]["pq"] and idx["books"].shape == (8, 16, 2)
    assert idx["rot"].shape == (16, 16)

    fresh = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ivf_pq_topk(
            embeddings, qs, k=5, nlist=8, nprobe=4, m=8, ncodes=16,
            refine=4, residual=True, opq=True, opq_iters=2, sample_rows=200,
        ).collect()
    )
    served = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in query_ivf_index(
            spark, path, qs, k=5, nprobe=4, refine=4
        ).collect()
    )
    assert served == fresh


def test_connected_components_scale_stress(spark):
    """VERDICT r7 #5: the 100-TB dedup story rests on connected
    components being O(log diameter) with flat lineage.  ~1.39M-edge
    chain+clique graph: a 2^18-node chain (the WORST case for plain
    label propagation — diameter 262143) plus a 1500-node clique
    (1,124,250 edges — the high-fanout case).  Asserts:
    - convergence in ≤ ceil(log2(diameter)) + 2 rounds (pointer
      doubling; measured log2+1 including the final no-change round)
    - exact components for both shapes
    - the returned plan is checkpoint-flat: its size is a small
      constant, NOT a function of rounds run."""
    import math

    from veranda_spark.operators.dedup import connected_components

    n_chain = 1 << 18
    chain = spark.range(n_chain - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    k = 1500
    base = 10_000_000
    a = spark.range(k).select((F.col("id") + base).alias("id_a"))
    b = spark.range(k).select((F.col("id") + base).alias("id_b"))
    clique = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    pairs = chain.unionByName(clique)

    st: dict = {}
    comp = connected_components(pairs, stats=st)

    bound = math.ceil(math.log2(n_chain - 1)) + 2
    assert st["rounds"] <= bound, (st["rounds"], bound)

    # exact components: chain -> 0, clique -> base
    agg = comp.groupBy("component").count().collect()
    got = {r["component"]: r["count"] for r in agg}
    assert got == {0: n_chain, base: k}

    # lineage flat after localCheckpoint: plan size is a small constant
    plan = comp._jdf.queryExecution().optimizedPlan().treeString()
    assert plan.count("\n") < 20, plan


def test_pq_lut_cells_subset_of_prune_list(spark, embeddings):
    """ADVICE r7: the partition-prune cell list (_probe_cells_udf) and
    the PQ LUT frame's cells (_pq_probe_udf) must agree, or pruning
    silently drops cells the LUT probes.  Both now call the shared
    _select_probe_cells; this guards the contract end-to-end through
    the two UDFs (tie-breaks, dtype, rotation order)."""
    import numpy as np

    from veranda_spark.operators.ann import (
        _explode_query_cells,
        _explode_query_luts,
        _kmeans,
        _select_probe_cells,
        _train_pq,
        _train_sample,
    )

    qs = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    sample = _train_sample(c, 200, 42)
    centroids = _kmeans(sample, 8, seed=42)
    books = _train_pq(sample, 8, 16, seed=42)

    prune = {
        (r["query_id"], r["cell"])
        for r in _explode_query_cells(
            qs, centroids, 4, "query_id", "embedding"
        ).collect()
    }
    lut_cells = {
        (r["query_id"], r["cell"])
        for r in _explode_query_luts(
            qs, centroids, books, None, False, 4, "query_id", "embedding"
        ).collect()
    }
    assert lut_cells == prune  # equal, not just subset: same helper

    # tie-break contract: kind="stable" argsort resolves EQUAL distances
    # to the lowest cell id.  Review r8 pass-2 #1: numpy's DEFAULT sort
    # is accidentally stable below its ~16-element insertion-sort
    # cutoff, so the guard needs >16 centroids with real ties to be
    # able to fail if kind="stable" is ever removed.
    tie_cents = np.zeros((64, 2))
    tie_cents[0:10] = np.arange(10)[:, None] + 100.0  # far, distinct
    tie_cents[10:30] = 1.0                            # 20 identical cells
    tie_cents[30:] = np.arange(34)[:, None] + 200.0   # far, distinct
    pts2 = np.array([[1.0, 1.0]])
    sel = _select_probe_cells(pts2, tie_cents, 8)
    assert list(sel[0]) == list(range(10, 18))  # tied cells in id order
