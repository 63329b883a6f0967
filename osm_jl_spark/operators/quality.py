"""Corpus-quality scoring beyond per-row ratios — the Gopher-rule
family of signals that need an aggregation, not just a Column.

Per-row signals (stopword ratio, unique-token ratio, language id) live
in functions/text.py as pure Columns; this module holds the ones whose
natural Spark shape is explode + groupBy, because that is what
distributes: a per-row higher-order fold over the n-gram array would
be O(grams^2) inside one task, while the exploded groupBy gets
map-side combine and AQE-sized shuffles for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_jl_spark.functions.text import ngrams_col, tokens_col


def repetition_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """(id, top_ngram_count, ngram_total, repetition_ratio): the share
    of the document's word ``n``-grams taken by its single most
    frequent n-gram — the standard boilerplate/spam signal (a page
    that repeats one phrase scores near 1; clean prose scores low).
    Documents with fewer than ``n`` tokens produce no row (no n-grams
    to judge — callers treat absent as "no signal", not "clean").

    Plan: explode n-grams, count per (doc, gram) — a map-side
    combinable groupBy whose key cardinality is bounded by corpus
    token count — then a second tiny agg per doc. Both shuffles hash
    on doc id first, so the operator has no hot keys: the heaviest
    possible group is one document's own gram list.
    """
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(ngrams_col(text_col, n)).alias("gram"),
    )
    counts = grams.groupBy("id", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        counts.groupBy("id")
        .agg(
            F.max("c").alias("top_ngram_count"),
            F.sum("c").alias("ngram_total"),
        )
        .select(
            F.col("id").alias(id_col),
            "top_ngram_count",
            F.col("ngram_total").cast("long").alias("ngram_total"),
            (F.col("top_ngram_count") / F.col("ngram_total"))
            .alias("repetition_ratio"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top: int = 3,
) -> DataFrame:
    """(id, token, tf, df, score, rk): each document's ``top``
    characteristic terms by tf·N/df — the log-free tf-idf variant, on
    purpose: tf·N is exact BIGINT and the score is then ONE float
    division, so rankings are bit-reproducible across engines and
    partitionings (ln() idf would tie the result to a libm).

    Plan: explode tokens -> tf per (doc, token) (map-side combinable),
    document frequency per token off the same aggregate, corpus size
    as a broadcast 1-row cross join, rank window per doc. The df join
    shuffles on token — vocabulary-sized, Zipf-headed by stopwords,
    which AQE's skew split handles; at web scale the df table is also
    the natural candidate for a broadcast once pruned to the
    per-corpus vocabulary.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(text_col)).alias("token"),
    )
    tf = toks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn("score", (F.col("tf") * F.col("n")) / F.col("df"))
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top)
        .select(
            F.col("id").alias(id_col),
            "token",
            "tf",
            "df",
            "score",
            F.col("rk").cast("long").alias("rk"),
        )
    )
