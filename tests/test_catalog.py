"""Catalog invariants: head coverage and oracle completeness.

External harnesses that sample the catalog take the FIRST entries in
dict order (observed window: 50), so the head must keep one
representative of every operator family. These tests freeze that
contract against accidental reordering.
"""

from __future__ import annotations

import re

from personal_health_etl_pipeline_spark.plans.catalog import CATALOG

HEAD = 50

# family -> regex over query names
FAMILIES = {
    "tpch-agg/join": r"^q\d",
    "projection/filter": r"^p\d",
    "reference joins": r"^j\d",
    "aggregations": r"^a\d",
    "windows": r"^w\d",
    "scalar functions": r"^f\d",
    "schema alignment": r"^c\d",
    "streaming twins": r"^st_",
    "text analysis": r"^text_",
    "dedup": r"^dedup_",
    "ann": r"^ann_",
    "embeddings": r"^emb_",
    "multimodal": r"^mm_",
    "curation": r"^(corpus_|decontaminate|pii_)",
    "sketches": r"^sketch_",
    "cdc/merge": r"^m\d",
    "time-series": r"^ts\d",
    "data-quality": r"^dq\d",
    "graph analytics": r"^graph_",
    # r5: side-effectful operators under the hash gate via derived audits
    "layout audit": r"^layout_",
    "source audit": r"^src_",
    # r5: the SQL front-end driven through spark.sql over temp views
    "sql front-end": r"^sql\d",
    # r5: raw-zone land/scan certification (S-family)
    "raw zone": r"^s\d",
    # r9: the UDTF surface (fixed returnType + polymorphic analyze()),
    # promoted from the unclassified rider now a udtf_ rep is in head
    "udtf": r"^udtf_",
}


def test_every_family_in_catalog_head():
    head = list(CATALOG)[:HEAD]
    missing = [
        fam
        for fam, pat in FAMILIES.items()
        if not any(re.match(pat, n) for n in head)
    ]
    assert not missing, f"families absent from catalog head: {missing}"


def test_every_query_has_an_oracle():
    rows_only = [n for n, (_, sql) in CATALOG.items() if sql is None]
    assert rows_only == [], f"rows-only entries (no oracle): {rows_only}"


def test_every_name_is_classified():
    pats = [re.compile(p) for p in FAMILIES.values()]
    unclassified = [
        n for n in CATALOG if not any(p.match(n) for p in pats)
        and not n.startswith("so1")  # set-ops singleton rides with analytics
    ]
    assert unclassified == [], unclassified
