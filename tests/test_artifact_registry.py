"""The session-artifact registry must stay complete (VERDICT-r11 #2).

Every module-level ``_*_MEMO`` dict under ``plans/`` is a session-
memoized build whose cost lands on whichever query touches it first —
unless ``plans/artifacts.py`` registers a forcing function for it so
``bench.py`` can pre-build and time it as its own line item. A new
memo added without a registry entry silently re-opens the r11
order-dependent-attribution hole; this test makes that loud.
"""

from __future__ import annotations

import importlib
import pkgutil

from personal_health_etl_pipeline_spark.plans import artifacts
import personal_health_etl_pipeline_spark.plans as plans_pkg


def _memo_dicts() -> set[tuple[str, str]]:
    found = set()
    for mod_info in pkgutil.iter_modules(plans_pkg.__path__):
        mod_name = f"{plans_pkg.__name__}.{mod_info.name}"
        mod = importlib.import_module(mod_name)
        for attr, value in vars(mod).items():
            if attr.endswith("_MEMO") and isinstance(value, dict):
                found.add((mod_name, attr))
    return found


def test_every_plans_memo_is_registered_or_exempt():
    covered = set()
    for fn in artifacts.SESSION_ARTIFACTS.values():
        for ref in fn.covers:
            mod, name = ref.split(":")
            covered.add((mod, name))
    exempt = set(artifacts.EXEMPT)
    memos = _memo_dicts()
    missing = memos - covered - exempt
    assert not missing, (
        f"plans memo dicts with no artifact-registry entry: "
        f"{sorted(missing)} — register a forcing fn in plans/artifacts.py "
        f"or add an EXEMPT row with a reason"
    )
    stale = (covered | exempt) - memos
    assert not stale, (
        f"artifact-registry rows pointing at memo dicts that no longer "
        f"exist: {sorted(stale)}"
    )


def test_registry_forcing_functions_are_callable():
    for name, fn in artifacts.SESSION_ARTIFACTS.items():
        assert callable(fn), name
        assert fn.covers, f"{name} declares no covered memo dicts"


def test_force_all_covers_every_headline_memo_insertion(spark):
    """After force_all, running the ENTIRE bench headline must insert
    no new key into any plans memo dict (EXEMPT ones aside) — i.e. the
    registry builds everything the headline actually consumes, with
    the parameter combinations the entries really use. A future entry
    that memoizes under a new key (say a third centroid (k, updates)
    combination) fails here instead of silently re-opening the
    order-dependent attribution hole in bench timings."""
    import importlib

    import bench
    from personal_health_etl_pipeline_spark.plans.catalog import CATALOG

    sf_dir = "/root/testdata/sf0.001"
    exempt_names = {name for _, name in artifacts.EXEMPT}
    memos = {
        (mod_name, attr): vars(importlib.import_module(mod_name))[attr]
        for mod_name, attr in _memo_dicts()
        if attr not in exempt_names
    }
    artifacts.force_all(spark, sf_dir)
    before = {k: set(d.keys()) for k, d in memos.items()}
    try:
        for name in bench.HEADLINE:
            CATALOG[name][0](spark, sf_dir).collect()
    finally:
        # emb_covariance registers its documented d²-bounded partials
        # cache in the session CacheManager (intended design,
        # operators/linalg.py:covariance_matrix — one deduped entry,
        # a few KB); running 89 entries in the SHARED test session
        # must not leave that state for later tests that assert an
        # empty CacheManager (test_jsonl_source's leak regression)
        spark.catalog.clearCache()
    grew = {
        k: sorted(set(d.keys()) - before[k])
        for k, d in memos.items()
        if set(d.keys()) - before[k]
    }
    assert not grew, (
        f"headline entries inserted memo keys force_all did not build: "
        f"{grew} — add the missing parameter combination to the "
        f"registry forcing fn in plans/artifacts.py"
    )
