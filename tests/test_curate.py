"""Curation operators vs pure-Python reference on handcrafted docs."""

import math
import re
from collections import Counter

import pytest

from veranda_spark.operators.curate import (
    contamination_ngrams,
    decontaminate,
    unigram_logprob_score,
)

DOCS = [
    (0, "The cat sat on the mat."),
    (1, "the CAT ate   the fish"),
    (2, "dogs chase cats; cats chase mice"),
    (3, "completely unrelated gibberish zyx qwv"),
    (4, ""),
    (5, "the cat sat on the mat again and again"),
]


def _norm_toks(text):
    t = re.sub(r"[^a-z0-9\s]", "", text.lower())
    t = re.sub(r"\s+", " ", t).strip()
    return [x for x in t.split(" ") if x]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_unigram_logprob_matches_reference(spark):
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob_avg"])
        for r in unigram_logprob_score(_docs(spark)).collect()
    }
    vocab = Counter()
    for _, text in DOCS:
        vocab.update(_norm_toks(text))
    total = sum(vocab.values())
    for did, text in DOCS:
        toks = _norm_toks(text)
        if not toks:
            assert did not in got  # empty docs produce no tokens, no row
            continue
        want = round(sum(math.log(vocab[t] / total) for t in toks) / len(toks), 4)
        assert got[did][0] == len(toks), did
        assert abs(got[did][1] - want) < 1e-9, did
    # the common-word doc outscores the gibberish doc
    assert got[5][1] > got[3][1]


def test_contamination_and_decontaminate(spark):
    docs = _docs(spark)
    bench = spark.createDataFrame(
        [(100, "THE CAT SAT somewhere else entirely")], "doc_id long, text string"
    )
    flagged = {
        r["doc_id"]: r["n_contaminated_grams"]
        for r in contamination_ngrams(docs, bench, n=3).collect()
    }
    # docs 0 and 5 share the 3-gram "the cat sat" with the benchmark
    assert set(flagged) == {0, 5}
    assert flagged[0] == 1 and flagged[5] == 1
    kept = {r["doc_id"] for r in decontaminate(docs, bench, n=3).collect()}
    assert kept == {1, 2, 3, 4}


def test_contamination_counts_distinct_grams_once(spark):
    # a doc repeating a contaminated gram counts it once (array_distinct)
    docs = spark.createDataFrame(
        [(1, "a b c x a b c y a b c")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    rows = contamination_ngrams(docs, bench, n=3).collect()
    assert len(rows) == 1 and rows[0]["n_contaminated_grams"] == 1


def test_contamination_plan_broadcasts_bench(spark):
    docs = _docs(spark)
    bench = docs.limit(2)
    plan = contamination_ngrams(docs, bench, n=3)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "broadcast" in plan.lower()


def test_repetition_scores_vs_reference(spark):
    from collections import Counter

    from veranda_spark.operators.curate import repetition_scores

    docs = [
        (0, "spam spam spam spam spam spam"),
        (1, "all unique words here today friend"),
        (2, "line one\nline one\nline two\n\n  \nline one"),
        (3, ""),
    ]
    got = {r["doc_id"]: r for r in
           repetition_scores(spark.createDataFrame(docs, "doc_id long, text string")).collect()}

    for did, text in docs:
        toks = _norm_toks(text)
        tgs = [" ".join(toks[i:i+3]) for i in range(len(toks) - 2)]
        bgs = [" ".join(toks[i:i+2]) for i in range(len(toks) - 1)]
        lines = [l for l in text.split("\n") if l.strip() != ""]
        want_tg = round(1 - len(set(tgs)) / len(tgs), 6) if tgs else 0.0
        want_bg = round(Counter(bgs).most_common(1)[0][1] / len(bgs), 6) if bgs else 0.0
        want_ln = round(1 - len(set(lines)) / len(lines), 6) if lines else 0.0
        r = got[did]
        assert abs(r["dup_trigram_frac"] - want_tg) < 1e-9, did
        assert abs(r["top_bigram_share"] - want_bg) < 1e-9, did
        assert abs(r["dup_line_frac"] - want_ln) < 1e-9, did
    # the spam doc is maximally repetitive; the unique doc is clean
    assert got[0]["dup_trigram_frac"] > 0.7 and got[1]["dup_trigram_frac"] == 0.0
