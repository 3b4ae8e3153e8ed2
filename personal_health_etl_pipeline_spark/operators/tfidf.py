"""TF-IDF term ranking over a document corpus.

Classic inverted-index shape: explode tokens -> per-(doc, term) tf ->
per-term document frequency -> idf join -> per-doc top-k. Two shuffles
(doc+term, then term) plus one window; the term-frequency join is the
only skew-prone step (stopwords have huge df) — AQE's skew-join split
handles it, and a df-cap filter is the standard mitigation at corpus
scale.

Determinism contract: idf = ln(N/df) is quantized to integer
micro-units (round(ln * 1e6)) before ranking, so the top-k cut ranks
on exact integers — immune to cross-engine libm ULP drift — with a
total-order tie-break (score desc, term asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.functions.text import tokens
from personal_health_etl_pipeline_spark.operators.partitioning import (
    TOKENIZE_MIN_BYTES_PER_PARTITION,
    spread,
)


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """Top-``k`` terms per document by quantized tf-idf.

    Terms appearing in more than ``max_df_ratio`` of documents are
    dropped before ranking (they carry no signal and concentrate join
    skew). Returns (doc_id, rank, term, tf, df, score_micro).
    """
    toks = spread(
        docs.select(F.col(id_col).alias("_id"), F.col(text_col)),
        min_bytes=TOKENIZE_MIN_BYTES_PER_PARTITION,
    ).select(
        "_id", F.explode(tokens(text_col)).alias("term")
    )
    # materialize tf ONCE (non-eager checkpoint, the capped-ngram
    # pattern): its three consumers (df_t, n_docs, the scored join)
    # otherwise each re-derive the tokenize+explode+shuffle — the r11
    # scan audit measured 3 identical corpus scans collapsing to 1.
    # n_docs comes from tf rather than toks: tf keeps every doc with
    # >= 1 token, so the distinct-doc count is identical and it reads
    # the materialized frame instead of a third corpus pass.
    tf = (
        toks.groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.select("_id").distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("df") <= F.col("n_docs") * max_df_ratio)
        .select(
            "_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf")
                * F.round(
                    F.log(F.col("n_docs").cast("double") / F.col("df")) * 1_000_000, 0
                ).cast("bigint")
            ).alias("score_micro"),
        )
    )
    w = Window.partitionBy("_id").orderBy(F.col("score_micro").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("_id").alias(id_col), "rank", "term", "tf", "df", "score_micro")
    )
