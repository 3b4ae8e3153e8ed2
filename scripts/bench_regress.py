#!/usr/bin/env python
"""Per-query bench regression gate, codified (it was re-implemented
ad-hoc every round since r9).

Compares two local bench twins (``BENCH_LOCAL_r{N}.json`` /
``BENCH_LAST.json``) query-by-query over the standing gate the README
describes: a query REGRESSES if it is both >25% slower AND >0.3 s
slower (median-of-3 vs median-of-3 — the absolute floor keeps
sub-second jitter out, the ratio floor keeps slow-query noise out).
Also reports improvements over the mirrored gate, membership drift
(queries present in only one file), and the machine-window tell
(oracle totals moving together with Spark totals means the box, not
the code).

Usage:  python scripts/bench_regress.py OLD.json NEW.json
Exit status 1 if any regression flags (for use as a round-close gate).
"""

from __future__ import annotations

import json
import sys

ABS_FLOOR = 0.3  # seconds
REL_FLOOR = 1.25


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    oq, nq = old["queries"], new["queries"]
    flags, improved = [], []
    for name, t_old in sorted(oq.items()):
        t_new = nq.get(name)
        if t_new is None:
            continue
        if t_new - t_old > ABS_FLOOR and t_new > t_old * REL_FLOOR:
            flags.append((name, t_old, t_new, round(t_new / t_old, 2)))
        elif t_old - t_new > ABS_FLOOR and t_old > t_new * REL_FLOOR:
            improved.append((name, t_old, t_new, round(t_new / t_old, 2)))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))

    print(
        f"gate: >{ABS_FLOOR}s AND >{int((REL_FLOOR - 1) * 100)}% slower, "
        f"{len(oq)} -> {len(nq)} queries"
    )
    print(
        f"totals: spark {old.get('median_total')} -> "
        f"{new.get('median_total')}; oracle "
        f"{old.get('oracle_median_total')} -> "
        f"{new.get('oracle_median_total')} (moving together = machine "
        f"window, not code)"
    )
    for name, a, b, r in flags:
        print(f"REGRESSION {name}: {a}s -> {b}s  x{r}")
    for name, a, b, r in improved:
        print(f"improved   {name}: {a}s -> {b}s  x{r}")
    if only_old:
        print("dropped from headline:", only_old)
    if only_new:
        print("added to headline:", only_new)
    if not flags:
        print("zero regression flags")
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
