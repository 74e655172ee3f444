"""Corpus-statistics curation operators (training-data pipeline, graft
axes): n-gram-LM quality scoring and benchmark decontamination.

Both are standard public-LM-pipeline stages (unigram-LM filtering and
the exact-n-gram decontamination rule popularized by the GPT-3 /
The Pile reports).  No reference analog — veranda is raster-only; these
extend the engine's documents side the same way dedup/ANN do.

Everything is JVM Column work: tokenization/n-grams via
functions/text.py (zip_with shingles), probabilities from a groupBy
over the corpus itself, joins keyed on md5 hashes so shuffle keys are
fixed-width.  Fully SQL-expressible → both ops are oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from veranda_spark.functions.text import normalize_text, tokens, word_ngrams


def _norm_tokens(text_col: str):
    return tokens(normalize_text(F.col(text_col)))


def unigram_logprob_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram-LM quality score: each document's mean ln p(token), with
    token probabilities estimated from the corpus itself (MLE over the
    normalized-token vocabulary).  Low scores = rare-token-heavy docs
    (gibberish, OCR noise, boilerplate fragments) — the cheap first
    filter of a pretraining pipeline.

    Scale: the vocabulary is Zipf-bounded (≪ corpus size) so the
    (token, count) dim BROADCASTS; the doc side explodes once, joins on
    token, aggregates map-side.  The corpus total rides along as a
    broadcast 1-row frame — no driver-side scalar.
    """
    toks = docs.select(
        F.col(id_col), F.explode(_norm_tokens(text_col)).alias("tok")
    ).filter(F.col("tok") != "")
    # materialize the (Zipf-bounded, dim-sized) vocabulary once: it is
    # consumed three ways (the broadcast build, the corpus total, and
    # implicitly by both) and each consumer would otherwise re-run the
    # corpus-wide normalize+explode+agg (round-9, guide §1/§2.4 — the
    # corpus is now scanned twice total instead of four times; the
    # checkpoint itself is vocabulary-sized, never corpus-sized)
    vocab = (
        toks.groupBy("tok").agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("cnt") / F.col("total"))), 4).alias(
                "logprob_avg"
            ),
        )
    )
    return scored


def contamination_ngrams(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination by exact n-gram overlap (the 13-gram
    rule of public LM pipelines; ``n`` configurable): a document is
    contaminated if any of its word n-grams appears anywhere in the
    benchmark set.  Returns (id, n_contaminated_grams) for flagged docs;
    anti-join the result to drop them.

    Scale: benchmark gram sets are small (eval suites, not corpora) →
    the distinct-gram dim BROADCASTS, keyed on md5(gram) so the join key
    is fixed-width instead of an arbitrarily long string; the corpus
    side streams through map-side with no shuffle before the final
    per-doc count."""
    # word_ngrams emits the WHOLE doc as one gram for sub-n-token docs
    # (minhash shingling semantics); the decontamination rule emits NO
    # grams there — gate on token count on BOTH sides so a tiny doc is
    # never flagged just for equalling a tiny benchmark doc
    def _gated_grams(col):
        return F.when(
            F.size(tokens(normalize_text(col))) >= n, word_ngrams(col, n)
        ).otherwise(F.array())

    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(_gated_grams(F.col(text_col)))
        ).alias("gram"),
    )
    bench_grams = (
        bench.select(
            F.explode(
                F.array_distinct(
                    _gated_grams(F.col(bench_text_col or text_col))
                )
            ).alias("gram")
        )
        .select(F.md5("gram").alias("_gh"))
        .distinct()
    )
    hits = doc_grams.join(
        F.broadcast(bench_grams), F.md5(F.col("gram")) == F.col("_gh")
    )
    return hits.groupBy(id_col).agg(
        F.count("*").alias("n_contaminated_grams")
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """docs minus every row flagged by ``contamination_ngrams`` — the
    actual pipeline stage (left_anti on the flagged ids)."""
    flagged = contamination_ngrams(
        docs, bench, n=n, text_col=text_col, id_col=id_col
    ).select(id_col)
    return docs.join(flagged, id_col, "left_anti")


def repetition_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText
    repetition rules, Rae et al. 2021 — public): documents dominated by
    repeated fragments are boilerplate/spam and get filtered before
    pretraining.

      - ``dup_trigram_frac``: fraction of word 3-grams that are repeats
        of an earlier 3-gram in the same doc (1 - distinct/total);
      - ``top_bigram_share``: share of all 2-gram occurrences taken by
        the single most frequent 2-gram;
      - ``dup_line_frac``: fraction of non-blank lines that duplicate an
        earlier line.

    Scale: trigram/line fractions are per-row array expressions (ZERO
    shuffle); the bigram mode needs one explode + two partial-agg
    groupBys keyed on (doc, gram) then doc — standard map-side-combine
    shape, never all-pairs."""
    tg = word_ngrams(F.col(text_col), 3)
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda l: F.trim(l) != ""
    )

    def _dup_frac(arr):
        total = F.size(arr)
        return F.when(total <= 0, F.lit(0.0)).otherwise(
            F.round((total - F.size(F.array_distinct(arr))) / total, 6)
        )

    per_row = docs.select(
        F.col(id_col),
        _dup_frac(tg).alias("dup_trigram_frac"),
        _dup_frac(lines).alias("dup_line_frac"),
    )
    # word_ngrams returns the WHOLE doc as one gram for docs shorter than
    # n (minhash shingling semantics); a sub-bigram doc has no repetition
    # signal, so gate on token count instead of inheriting that gram
    bg = docs.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(_norm_tokens(text_col)) >= 2,
                word_ngrams(F.col(text_col), 2),
            ).otherwise(F.array())
        ).alias("gram"),
    )
    bg_stats = (
        bg.groupBy(id_col, "gram")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_bigram_share")
        )
    )
    return per_row.join(bg_stats, id_col, "left").select(
        id_col,
        "dup_trigram_frac",
        F.coalesce("top_bigram_share", F.lit(0.0)).alias("top_bigram_share"),
        "dup_line_frac",
    )
