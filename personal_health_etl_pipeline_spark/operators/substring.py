"""Exact repeated-substring span detection (cross-document).

MinHash/SimHash find documents that are near-duplicates *as wholes*;
the complementary operator — the one "Deduplicating Training Data
Makes Language Models Better" (Lee et al., 2021) builds a suffix array
for — finds exact token spans repeated *across* documents (license
boilerplate, quoted passages, templated headers) even when the hosting
documents are otherwise unrelated. The reference repo has nothing like
it (its analytics stop at two BigQuery probes, `composer_dags/dags/
utils/data_sources/oura/etl/load.py:220-247`); this is part of the
engine's extended training-data surface.

Algorithm (the distributed equivalent of the suffix-array scan): slide
a ``window`` -token rolling window over every document, hash each
window with the portable md5 family, keep hashes seen in >= 2 distinct
documents, then merge each document's surviving window starts into
maximal spans with an islands (pos - row_number) grouping.

Scale design:

* The window explode is O(total tokens) — same cost class as the
  bigram-LM explode — and runs as one scan + generate, no shuffle.
* Finding duplicated hashes is ONE groupBy(h) with a partial-agg
  count-distinct; joining the (bounded, distinct-hash) survivor set
  back is an equi-join on the same key, so AQE can reuse the exchange.
  No pair explosion anywhere: a window that occurs in a million
  documents contributes one survivor row and a 1:1 probe per
  occurrence — boilerplate skew degrades linearly, never
  quadratically (contrast LSH buckets, which pair members).
* The islands merge is a per-document window function: partitions by
  doc_id, the natural parallel unit.
* At 100 TB the windows table dominates; it is never collected and
  never re-sorted globally — the only orderings are per-document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.functions import text as T
from personal_health_etl_pipeline_spark.functions.hashing import md5_long
from personal_health_etl_pipeline_spark.operators.partitioning import (
    SKETCH_MIN_BYTES_PER_PARTITION,
    spread,
)

SUBSTRING_WINDOW = 8  # tokens per rolling window
SUBSTRING_MIN_DOCS = 2  # window must appear in >= this many distinct docs


def token_windows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = SUBSTRING_WINDOW,
) -> DataFrame:
    """Every ``window``-token rolling window of every document:
    ``(doc_id, pos, h)`` with ``pos`` the 0-based start-token index and
    ``h`` the portable 60-bit hash of the space-joined window.

    Reuses :func:`functions.text.word_shingles` (slices + zip_with, so
    the tokenizer runs a constant ``window`` times per document, not
    once per emitted window).
    """
    # short docs are dropped with the tokenizer-only predicate BELOW the
    # token projection (a size filter on the alias pushes down with the
    # tokenizer substituted — 2x tokenize), and the generate is the
    # OUTER form so InferFiltersFromGenerate does not re-create that
    # filter from the derived window expression (r16, see
    # functions.text.has_min_tokens). Every surviving doc has >= window
    # tokens, so posexplode_outer emits exactly posexplode's rows.
    return (
        spread(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
            min_bytes=SKETCH_MIN_BYTES_PER_PARTITION,
        )
        .where(T.has_min_tokens(text_col, window))
        .select("doc_id", T.tokens(text_col).alias("t"))
        .select(
            "doc_id",
            F.posexplode_outer(
                T._once(F.col("t"), lambda t: T.word_shingles(t, window))
            ).alias("pos", "sh"),
        )
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), md5_long("sh").alias("h"))
    )


def repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = SUBSTRING_WINDOW,
    min_docs: int = SUBSTRING_MIN_DOCS,
    windows: DataFrame | None = None,
) -> DataFrame:
    """Maximal cross-document repeated token spans per document:
    ``(doc_id, span_start, span_end, n_windows)`` with 1-based
    inclusive token indices, ordered by (doc_id, span_start).

    A span is maximal: consecutive duplicated window starts merge, so
    a verbatim L-token passage shared by two documents reports once as
    ``[s, s + L - 1]`` (L - window + 1 windows), not L - window + 1
    times. ``n_windows`` is the merged window count — callers cut or
    down-weight the span ``[span_start, span_end]`` of each document.
    """
    # materialize the windows table ONCE: both consumers below (the
    # survivor groupBy and the probe join) would otherwise recompute
    # the tokenize+shingle+md5 pass — partial aggregation sits below
    # the groupBy's exchange, so ReuseExchange cannot dedupe the two
    # subtrees (the _tf_table precedent, plans/llm_surface3.py). One
    # write + two block reads beats two full hash passes (~25% at
    # sf0.1); at cluster scale the write is shuffle-class IO the
    # recompute would pay anyway. Callers holding a session-memoized
    # windows artifact pass it via ``windows`` (the catalog does:
    # the table is corpus-static, shared with the cut path).
    wins = (
        windows
        if windows is not None
        else token_windows(docs, id_col, text_col, window).localCheckpoint(
            eager=True
        )
    )
    dup = (
        wins.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("h")
    )
    hits = wins.join(dup, "h").select("doc_id", "pos")
    isl = hits.withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            (F.min("pos") + 1).alias("span_start"),
            (F.max("pos") + window).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
        .orderBy("doc_id", "span_start")
    )


def cut_repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = SUBSTRING_WINDOW,
    min_docs: int = SUBSTRING_MIN_DOCS,
    windows: DataFrame | None = None,
    token_stream: DataFrame | None = None,
) -> DataFrame:
    """APPLY the dedup decision: rebuild every document with its
    cross-document repeated spans cut, keeping the copy in the
    LOWEST-doc_id document per repeated window (Lee et al.'s
    remove-all-but-one, positionally: token position p is cut iff some
    duplicated window covering p belongs to a doc that is not that
    window-hash's minimum doc). Returns
    ``(doc_id, n_tokens, n_cut, cleaned_text)`` for every document —
    unchanged docs pass through with ``n_cut = 0`` (whitespace
    normalized to single spaces by reconstruction, identically in the
    oracle).

    Scale: one extra bounded explode (window x cut-hit) over
    :func:`repeated_spans`'s machinery, an anti-join on (doc, token
    position), and a per-doc ordered re-assembly via sort_array over
    collected (pos, token) structs — per-doc state only.
    """
    # toks feeds the anti-join AND the totals groupBy; wins feeds the
    # keeper groupBy AND the cut-position join — materialize each once
    # (see repeated_spans for why ReuseExchange cannot). Both are
    # corpus-static: callers with session-memoized artifacts pass them
    # via ``windows`` / ``token_stream``.
    toks = (
        token_stream
        if token_stream is not None
        else (
            spread(
                docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
                min_bytes=SKETCH_MIN_BYTES_PER_PARTITION,
            )
            .select("doc_id", T.tokens(text_col).alias("t"))
            .select(
                "doc_id",
                F.posexplode("t").alias("tp", "tok"),
            )
            .select("doc_id", F.col("tp").cast("bigint").alias("tp"), "tok")
            .localCheckpoint(eager=True)
        )
    )
    wins = (
        windows
        if windows is not None
        else token_windows(docs, id_col, text_col, window).localCheckpoint(
            eager=True
        )
    )
    keeper = (
        wins.groupBy("h")
        .agg(
            F.countDistinct("doc_id").alias("nd"),
            F.min("doc_id").alias("mdoc"),
        )
        .where(F.col("nd") >= min_docs)
        .select("h", "mdoc")
    )
    cut_pos = (
        wins.join(keeper, "h")
        .where(F.col("doc_id") > F.col("mdoc"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(window - 1))
            ).alias("tp"),
        )
        .distinct()
    )
    # ONE aggregation pass over the marked token stream (r6; was two
    # groupBys — totals over toks, survivors over an anti-join — glued
    # by a join): the cut positions ride in as a LEFT-join mark, and
    # totals, cut count and the kept-token re-assembly are computed
    # together. collect_list skips NULLs, so the CASE emits only
    # surviving tokens; a document whose tokens are ALL cut still
    # appears (every token row survives the left join) with an empty
    # cleaned_text.
    marked = toks.join(
        cut_pos.withColumn("cut", F.lit(1)), ["doc_id", "tp"], "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("cut").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_cut"),
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list("
                    "CASE WHEN cut IS NULL THEN struct(tp, tok) END)),"
                    " s -> s.tok)"
                ),
                " ",
            ).alias("cleaned_text"),
        )
        .select("doc_id", "n_tokens", "n_cut", "cleaned_text")
        .orderBy("doc_id")
    )
