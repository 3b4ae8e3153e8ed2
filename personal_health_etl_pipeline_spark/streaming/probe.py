"""Streaming incremental dedup: probe a persisted MinHash index with
each micro-batch of new documents.

The batch operator (``operators.dedup.minhash_lookup``) already has
the production incremental shape — only the new batch is sketched, the
index side is the storable ``(band_id, band_hash, _id)`` table. This
module is its streaming driver: ``foreachBatch`` hands every
micro-batch to the SAME operator against the SAME persisted index, so
a continuously-arriving corpus is deduped against yesterday's index
with zero re-sketching of the corpus — the reference's incremental-
by-date-range architecture (`composer_dags/dags/utils/data_sources/
oura/etl/extract.py:151-203`) mapped onto a stream.

Why foreachBatch, not a pure streaming join: the verify stage joins
raw index documents against the (tiny) candidate set with a broadcast
hint — broadcasting a stream-derived frame is not expressible in
continuous mode, but inside ``foreachBatch`` the micro-batch is a
regular DataFrame and the whole operator (banding, capped probe join,
exact-Jaccard verification) runs unchanged with batch semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from personal_health_etl_pipeline_spark.operators.dedup import minhash_lookup


def minhash_probe_sink(
    index_docs: DataFrame,
    index: DataFrame,
    target_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **lookup_kw,
):
    """Build a ``foreachBatch`` function appending each micro-batch's
    verified near-dup pairs ``(index_id, new_id, jaccard_sim)`` to a
    parquet sink.

    ``index`` is the persisted band table (read back from storage,
    ideally bucketed by ``(band_id, band_hash)`` — see
    ``operators.dedup.minhash_index``); ``index_docs`` supplies raw
    text for the exact-Jaccard verify of surviving candidates only.
    Sketch parameters in ``lookup_kw`` must match the index build.
    """

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        pairs = minhash_lookup(
            batch_df, index_docs, id_col, text_col, index=index, **lookup_kw
        )
        pairs.write.mode("append").parquet(target_path)

    return _probe


def run_probe_stream(
    new_docs: DataFrame,
    index_docs: DataFrame,
    index: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    **kw,
):
    """Wire a stream of new documents into the index-probe sink.

    Returns the started ``StreamingQuery``; callers own its lifecycle.
    """
    return (
        new_docs.writeStream.foreachBatch(
            minhash_probe_sink(index_docs, index, target_path, **kw)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
