"""Storage-layout maintenance tests: compaction and range clustering.

Asserts the *layout* contract (file counts, disjoint per-file key
ranges), and that both rewrites are content-preserving.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.layout import (
    cluster_by,
    compact,
    parquet_file_count,
)


@pytest.fixture()
def drizzle(spark, tmp_path):
    """A small-file mess: 20 appends of ~250 rows each."""
    path = str(tmp_path / "drizzle")
    for i in range(20):
        spark.range(i * 250, (i + 1) * 250).select(
            F.col("id"), (F.col("id") % 97).alias("k")
        ).coalesce(1).write.mode("append").parquet(path)
    return path


class TestCompact:
    def test_merges_to_target_count_and_preserves_rows(self, spark, tmp_path, drizzle):
        out = str(tmp_path / "compacted")
        assert parquet_file_count(drizzle) >= 20
        # tiny target -> still collapses the drizzle into very few files
        n = compact(spark, drizzle, out, target_bytes=10 * 1024 * 1024)
        assert parquet_file_count(out) == n == 1
        before = spark.read.parquet(drizzle)
        after = spark.read.parquet(out)
        assert after.count() == before.count() == 5000
        assert after.agg(F.sum("id")).first()[0] == before.agg(F.sum("id")).first()[0]

    def test_no_shuffle_in_compaction_plan(self, spark, tmp_path, drizzle):
        # coalesce-based merge: the write job must not contain an exchange
        df = spark.read.parquet(drizzle).coalesce(1)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestClusterBy:
    def test_files_cover_disjoint_key_ranges(self, spark, tmp_path, drizzle):
        out = str(tmp_path / "clustered")
        cluster_by(spark, drizzle, out, cols=["id"], n_files=4)
        files = sorted(glob.glob(os.path.join(out, "*.parquet")))
        assert len(files) == 4
        ranges = []
        for f in files:
            t = pq.read_table(f, columns=["id"])
            ids = t.column("id").to_pylist()
            assert ids == sorted(ids)  # sorted within file
            ranges.append((min(ids), max(ids)))
        ranges.sort()
        for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
            assert hi_a < lo_b  # disjoint -> min/max stats prune files

    def test_content_preserved(self, spark, tmp_path, drizzle):
        out = str(tmp_path / "clustered2")
        cluster_by(spark, drizzle, out, cols=["k", "id"], n_files=3)
        before = spark.read.parquet(drizzle).orderBy("id").collect()
        after = spark.read.parquet(out).orderBy("id").collect()
        assert after == before

    def test_cluster_key_predicate_prunes_scanned_rows(self, spark, tmp_path, drizzle):
        """The point of clustering: a cluster-key range predicate must
        skip whole files via parquet min/max footer stats. Spark's file
        listing still counts every file (``numFiles``), but row groups
        whose stats exclude the predicate are never decoded — observed
        as the scan node's ``numOutputRows``. Each output file here is
        one row group, so row-group skipping IS file skipping.

        The key must be ``k``: each drizzle append holds a contiguous
        ``id`` range (already id-clustered by construction) but the
        full spread of ``k = id % 97``, so only clustering can give a
        ``k`` predicate pruning power."""
        out = str(tmp_path / "clustered3")
        cluster_by(spark, drizzle, out, cols=["k"], n_files=4)

        def scan_output_rows(df):
            df.collect()
            plan = df._jdf.queryExecution().executedPlan()
            if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
                plan = plan.executedPlan()
            leaves = plan.collectLeaves()
            rows = 0
            for i in range(leaves.size()):
                mets = leaves.apply(i).metrics()
                it = mets.iterator()
                while it.hasNext():
                    kv = it.next()
                    if kv._1() == "numOutputRows":
                        rows += kv._2().value()
            return rows

        # equality predicate: equal keys never straddle a range-partition
        # boundary (a BETWEEN band can, when the sampled boundaries land
        # inside it), so exactly one clustered file decodes
        pred = F.col("k") == 50
        clustered_rows = scan_output_rows(spark.read.parquet(out).where(pred))
        unclustered_rows = scan_output_rows(spark.read.parquet(drizzle).where(pred))
        # every unclustered drizzle file spans all k, so nothing prunes
        # there and all 5000 rows decode; clustered decodes one file —
        # ~1250 rows at even boundaries, < half the corpus even with
        # sampling imbalance
        assert unclustered_rows == 5000
        assert clustered_rows < 2500


class TestZorderBy:
    def _scan_rows(self, df):
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()
        if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            plan = plan.executedPlan()
        leaves = plan.collectLeaves()
        rows = 0
        for i in range(leaves.size()):
            mets = leaves.apply(i).metrics()
            it = mets.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    rows += kv._2().value()
        return rows

    def test_both_dimensions_prune(self, spark, tmp_path, drizzle):
        """The z-order contract: after clustering on (id, k), a range
        predicate on EITHER key alone decodes a fraction of the corpus
        — the capability lexicographic clustering lacks (its second
        key gets no pruning power). 4 files ~ the curve's quadrants
        (top bit of each scaled key), so each single-key half-space
        predicate should decode ~2 of 4 files."""
        from personal_health_etl_pipeline_spark.operators.layout import zorder_by

        out = str(tmp_path / "zordered")
        zorder_by(spark, drizzle, out, cols=["id", "k"], n_files=4)

        id_rows = self._scan_rows(
            spark.read.parquet(out).where(F.col("id") < 1250)
        )
        k_rows = self._scan_rows(spark.read.parquet(out).where(F.col("k") >= 80))
        assert id_rows < 4000  # pruned: quadrant sampling is inexact
        assert k_rows < 4000
        # the contrast case: lexicographic clustering on (id, k) gives
        # k-alone predicates nothing — every file spans (nearly) all k
        lex = str(tmp_path / "lexed")
        cluster_by(spark, drizzle, lex, cols=["id", "k"], n_files=4)
        k_rows_lex = self._scan_rows(
            spark.read.parquet(lex).where(F.col("k") >= 80)
        )
        assert k_rows_lex == 5000  # nothing pruned
        assert k_rows < k_rows_lex

    def test_content_preserved(self, spark, tmp_path, drizzle):
        from personal_health_etl_pipeline_spark.operators.layout import zorder_by

        out = str(tmp_path / "zordered2")
        zorder_by(spark, drizzle, out, cols=["id", "k"], n_files=3)
        before = spark.read.parquet(drizzle).orderBy("id").collect()
        after = spark.read.parquet(out).orderBy("id").collect()
        assert after == before

    def test_zvalue_interleave_is_morton(self, spark):
        # hand-check the bit interleave on a 2-bit grid: (x=0b10, y=0b01)
        # -> z = x1 y1 x0 y0 = 0b1001 = 9
        from personal_health_etl_pipeline_spark.operators.layout import (
            _zvalue_expr,
        )

        row = spark.range(1).selectExpr(
            f"({_zvalue_expr(['CAST(2 AS BIGINT)', 'CAST(1 AS BIGINT)'], 2)}) AS z"
        ).first()
        assert row.z == 9


class TestZorderEnvelopes:
    """The r5 validation guards: silent-corruption envelopes raise."""

    def test_sign_bit_collision_rejected(self, spark, tmp_path, drizzle):
        from personal_health_etl_pipeline_spark.operators.layout import (
            zorder_by,
        )

        out = str(tmp_path / "zs")
        with pytest.raises(ValueError, match="exceeds 63"):
            zorder_by(spark, drizzle, out, ["id", "k", "id", "k"], bits=16)

    def test_span_overflow_rejected(self, spark, tmp_path):
        from personal_health_etl_pipeline_spark.operators.layout import (
            zorder_by,
        )

        path = str(tmp_path / "wide")
        spark.createDataFrame(
            [(0, 0), (2**61, 1)], "a long, b long"
        ).write.parquet(path)
        with pytest.raises(ValueError, match="overflows"):
            zorder_by(spark, path, str(tmp_path / "zo"), ["a", "b"], bits=16)

    def test_bucket_count_must_be_power_of_two(self, spark, tmp_path, drizzle):
        from personal_health_etl_pipeline_spark.operators.layout import (
            zorder_bucket_by,
        )

        df = spark.read.parquet(drizzle)
        with pytest.raises(ValueError, match="power of two"):
            zorder_bucket_by(df, str(tmp_path / "zb"), ["id", "k"], n_buckets=3)

    def test_bucket_layout_one_file_per_bucket_content_preserved(
        self, spark, tmp_path, drizzle
    ):
        from personal_health_etl_pipeline_spark.operators.layout import (
            zorder_bucket_by,
        )

        df = spark.read.parquet(drizzle)
        out = str(tmp_path / "zb4")
        zorder_bucket_by(df, out, ["id", "k"], n_buckets=4, bits=16)
        back = spark.read.parquet(out)
        assert back.count() == df.count()
        assert sorted(
            r.id for r in back.select("id").collect()
        ) == sorted(r.id for r in df.select("id").collect())
        for bdir in glob.glob(os.path.join(out, "_zbucket=*")):
            files = [
                f for f in os.listdir(bdir) if f.endswith(".parquet")
            ]
            assert len(files) == 1, (bdir, files)
