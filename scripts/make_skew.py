#!/usr/bin/env python
"""Generate a planted-skew variant of sf0.1 under .scratch/skew01.

The sf1 replica corpus deliberately PRESERVES per-key distributions
(that is what makes its 10x ratios interpretable), so it cannot probe
the judge's standing concern: skewed keys. This variant plants heavy
key skew while keeping row counts, schemas and referential integrity
IDENTICAL to sf0.1 — the skew drill then measures wall-clock on
uniform vs skewed at equal volume, isolating the skew effect:

* ``events.user_id``: 40% of events are remapped to one existing user
  (the minimum user_id) — a ~27x hot key (uniform max is ~99 events
  per user; the hot user gets ~40k of 100k). Hits per-user windows
  (sessionize, funnels, as-of), user-keyed joins, and cohorts.
* ``orders.o_custkey``: 40% of orders remapped to one existing
  customer — hits groupBy-custkey aggregation (q13) and turns the
  derived customer-supplier graph's hot customer into a hub node
  (degree skew for pagerank/triangles/k-core).

Every other table is copied byte-identical. Deterministic (parity of
the stable primary key decides membership), pure DuckDB + file copy.
Idempotent: skips tables already present.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)
# (uniform source, skewed twin) pairs; the sf1 pair is generated only
# when the scale-drill corpus exists (run scripts/make_sf1.py first) —
# at sf0.1 the hot partition is below job overhead and skew-induced
# output shrinkage dominates (measured r11: every ratio < 1), so the
# sf1 axis is where a straggler can actually surface
PAIRS = [
    ("/root/testdata/sf0.1", os.path.join(_SCRATCH, "skew01")),
    (os.path.join(_SCRATCH, "sf1"), os.path.join(_SCRATCH, "skew1")),
]
HOT_FRACTION_MOD = 10  # key % 10 < 4  ->  40% of rows on the hot key
HOT_FRACTION_LT = 4

REMAP = {
    "events": ("event_id", "user_id"),
    "orders": ("o_orderkey", "o_custkey"),
}


def main() -> None:
    con = duckdb.connect()
    for src_dir, dst_dir in PAIRS:
        if not os.path.isdir(src_dir):
            print(f"{src_dir}: missing, pair skipped")
            continue
        _generate(con, src_dir, dst_dir)


def _generate(con, SRC: str, DST: str) -> None:
    os.makedirs(DST, exist_ok=True)
    for name in sorted(os.listdir(SRC)):
        if not name.endswith(".parquet"):
            continue
        table = name[: -len(".parquet")]
        out = os.path.join(DST, name)
        if os.path.exists(out):
            print(f"{table}: present, skipped")
            continue
        src = os.path.join(SRC, name)
        if table not in REMAP:
            shutil.copyfile(src, out)
            print(f"{table}: copied")
            continue
        pk, key = REMAP[table]
        con.execute(
            f"""
            COPY (
              SELECT * REPLACE (
                CASE WHEN {pk} % {HOT_FRACTION_MOD} < {HOT_FRACTION_LT}
                     THEN (SELECT MIN({key}) FROM read_parquet('{src}'))
                     ELSE {key} END AS {key}
              )
              FROM read_parquet('{src}')
            ) TO '{out}' (FORMAT PARQUET)
            """
        )
        mx, total = con.execute(
            f"SELECT MAX(c), SUM(c) FROM (SELECT COUNT(*) c FROM "
            f"read_parquet('{out}') GROUP BY {key})"
        ).fetchone()
        # ADVICE-r11: `pk % 10 < 4` only yields 40% if the primary key
        # is dense/uniform mod 10. If a corpus generator ever emits a
        # strided or offset pk (all-even, 1000-step ids), the planted
        # fraction silently becomes 0%/80% and every drill ratio
        # downstream mismeasures. Assert the ACHIEVED fraction.
        target = HOT_FRACTION_LT / HOT_FRACTION_MOD
        achieved = mx / total
        if abs(achieved - target) > 0.05:
            raise RuntimeError(
                f"{table}: planted hot fraction {achieved:.3f} is not "
                f"{target:.1f}±0.05 — {key} ids are not dense/uniform "
                f"mod {HOT_FRACTION_MOD}; fix the membership predicate"
            )
        print(
            f"{table}: skewed ({key} hot-group size {mx}, "
            f"fraction {achieved:.3f})"
        )
    print(f"skewed twin ready at {DST}")


if __name__ == "__main__":
    main()
