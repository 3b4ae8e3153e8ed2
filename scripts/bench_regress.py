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

Rename handling (VERDICT-r13 item 4): a renamed query would otherwise
show as one drop + one add with NO timing comparison — a silent blind
spot. The gate now fails loudly whenever drops and adds coexist,
unless each rename is declared with ``--rename old=new``; declared
pairs are timing-compared under the normal gate (the new name inherits
the old timing history). Pure drops or pure adds (membership shrink /
growth) stay informational, as before.

Usage:  python scripts/bench_regress.py OLD.json NEW.json
                                        [--rename old=new ...]
Exit status 1 if any regression flags, or on undeclared
drop+add coexistence (for use as a round-close gate).
"""

from __future__ import annotations

import json
import sys

ABS_FLOOR = 0.3  # seconds
REL_FLOOR = 1.25


def compare(old: dict, new: dict, renames: dict[str, str]) -> dict:
    """Pure comparison; returns flags/improved/drops/adds/rename_pairs.

    ``renames`` maps old-name -> new-name; each declared pair is
    timing-compared like any stable-name query.
    """
    oq, nq = dict(old["queries"]), dict(new["queries"])
    # fold declared renames into the old map under the NEW name so the
    # ordinary loop compares them
    rename_pairs = []
    for o, n in renames.items():
        if o in oq and n in nq and n not in oq:
            oq[n] = oq.pop(o)
            rename_pairs.append((o, n))
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
    return {
        "flags": flags,
        "improved": improved,
        "only_old": only_old,
        "only_new": only_new,
        "rename_pairs": rename_pairs,
        # drops and adds coexisting = a possible undeclared rename
        "suspected_renames": bool(only_old) and bool(only_new),
    }


def main(argv: list[str]) -> int:
    paths = [a for a in argv if not a.startswith("--")]
    renames: dict[str, str] = {}
    for a in argv:
        if a.startswith("--rename"):
            spec = a.split("=", 1)[1] if a.startswith("--rename=") else None
            if spec is None:
                raise SystemExit("use --rename=old=new")
            o, n = spec.split("=", 1) if "=" in spec else (spec, spec)
            renames[o] = n
    if len(paths) != 2:
        raise SystemExit(__doc__)
    old = json.load(open(paths[0]))
    new = json.load(open(paths[1]))
    r = compare(old, new, renames)

    print(
        f"gate: >{ABS_FLOOR}s AND >{int((REL_FLOOR - 1) * 100)}% slower, "
        f"{len(old['queries'])} -> {len(new['queries'])} queries"
    )
    print(
        f"totals: spark {old.get('median_total')} -> "
        f"{new.get('median_total')}; oracle "
        f"{old.get('oracle_median_total')} -> "
        f"{new.get('oracle_median_total')} (moving together = machine "
        f"window, not code)"
    )
    for o, n in r["rename_pairs"]:
        print(f"rename     {o} -> {n} (timing-compared under new name)")
    for name, a, b, ratio in r["flags"]:
        print(f"REGRESSION {name}: {a}s -> {b}s  x{ratio}")
    for name, a, b, ratio in r["improved"]:
        print(f"improved   {name}: {a}s -> {b}s  x{ratio}")
    if r["only_old"]:
        print("dropped from headline:", r["only_old"])
    if r["only_new"]:
        print("added to headline:", r["only_new"])
    if r["suspected_renames"]:
        print(
            "FAIL: drops and adds coexist — if a query was renamed, "
            "declare it with --rename=old=new so it gets a timing "
            "comparison; otherwise adjudicate the membership change."
        )
        return 1
    if not r["flags"]:
        print("zero regression flags")
    return 1 if r["flags"] else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
