"""Smoke test of the driver contract in __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "day"
    assert "ingest_note" in df.columns  # the null-filled aligned column


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must reference a declared query
    assert set(oracles) <= set(qs)


class TestCli:
    def test_list_and_unknown(self, capsys):
        from personal_health_etl_pipeline_spark.__main__ import main

        assert main(["list", "--filter", "q1_"]) == 0
        out = capsys.readouterr().out
        assert "q1_pricing_summary" in out
        assert main(["run", "definitely_not_a_query"]) == 2
