"""Differential tests: every catalog query vs its DuckDB oracle.

This mirrors the driver's t2 correctness gate (CORRECTNESS_r{N}.json)
so oracle drift is caught locally before a round ends.
"""

from __future__ import annotations

import pytest

from personal_health_etl_pipeline_spark.plans.catalog import CATALOG
from tests.parity import check_query


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(spark, sf_dir, name):
    check_query(spark, name, sf_dir)
