"""JSONL landing-zone source with corrupt-record quarantine.

The reference lands API responses as JSON and trusts them
(`composer_dags/dags/utils/data_sources/oura/etl/load.py:46-63` writes
whatever extract returned); a production landing zone cannot — one
malformed line must neither kill the job (FAILFAST everywhere) nor
silently vanish (DROPMALFORMED). The engine's contract:

* read with an EXPLICIT schema (never inferSchema — at 100 TB schema
  inference is a full extra pass, and drift should be a decision, not
  an accident) in PERMISSIVE mode with ``columnNameOfCorruptRecord``;
* split the frame into (good, quarantine): quarantine keeps the raw
  line for replay/debugging, good drops the carrier column;
* callers opt into ``mode="FAILFAST"`` for sources where any
  corruption must abort (e.g. financial feeds).

Spark caveat encoded here: the corrupt-record carrier column must be
part of the read schema, and filtering on it requires the frame to be
materialized from the parser (Spark refuses a filter on the corrupt
column alone over a pure parsed projection — SPARK-38285); caching the
parsed frame once satisfies the constraint and reads the file once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` with ``schema``; returns
    ``(good, quarantine)``. ``good`` has exactly the schema's columns;
    ``quarantine`` is ``(raw_line)`` — every line the parser rejected.

    In FAILFAST mode the quarantine frame is empty by construction
    (the read raises on the first bad line when materialized).
    """
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema already contains {CORRUPT_COL!r}")
    # build a NEW StructType: StructType.add mutates the receiver, and
    # callers' schema objects must not grow a carrier column per call
    from pyspark.sql.types import StructField

    read_schema = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    df = (
        spark.read.schema(read_schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # one materialization: required for corrupt-column filters
    # (SPARK-38285) and reads the landing files once for both splits.
    # localCheckpoint, NOT cache(): cache registers in the session's
    # CacheManager and lives until an explicit unpersist the caller
    # can't issue (they never see this frame) — repeated landing reads
    # would accumulate blocks for the session lifetime. Checkpoint
    # blocks are released by the ContextCleaner as soon as the derived
    # splits are garbage-collected. Lazy (eager=False): the plan is
    # rebased off the JSON relation at once (which is what satisfies
    # the corrupt-column analysis check), but materialization — and a
    # FAILFAST parse abort — happens at the caller's first action.
    # Recoverability trade-off vs cache(): localCheckpoint TRUNCATES
    # lineage, so on a multi-executor cluster losing an executor that
    # holds checkpoint blocks fails any later job over the splits
    # (a lost cached block would have been recomputed from the JSON
    # scan). Landing reads are short-lived one-batch jobs, so we take
    # the bounded-memory side of that trade; a deployment that must
    # survive executor loss mid-read should configure
    # spark.sparkContext.setCheckpointDir and use reliable
    # .checkpoint() here instead (same guidance as
    # operators/pagerank.py's localCheckpoint-vs-checkpoint note).
    df = df.localCheckpoint(eager=False)
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, quarantine
