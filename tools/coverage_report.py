"""Driver-verification ledger: fold every CORRECTNESS_r*.json into a
per-query history — which round each query was last driver-checked in, with
what result, and which declared queries the driver has NEVER checked (the
~50-query/round window can't cover a 219-query suite; this is the source of
truth for rotating ``workload._CHECK_FIRST`` each round).

Usage: python tools/coverage_report.py            # summary + never-checked
       python tools/coverage_report.py -v         # full per-query table

Prints one JSON line at the end (driver-parseable):
``{"declared": N, "ever_checked": N, "never_checked": [...], "latest_red": [...]}``
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from graphrag_toolkit_spark.workload import all_queries

    declared = sorted(all_queries())

    history: dict[str, list[tuple[int, bool]]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            ok = bool(
                res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match")
                and not res.get("err")
            )
            history.setdefault(name, []).append((rnd, ok))

    last: dict[str, tuple[int, bool]] = {
        n: max(h) for n, h in history.items()
    }
    never = [n for n in declared if n not in last]
    latest_red = sorted(n for n, (_, ok) in last.items() if not ok and n in declared)
    stale = {n: r for n, (r, ok) in last.items() if ok and n in declared}

    if "-v" in sys.argv:
        for n in declared:
            if n in last:
                rnd, ok = last[n]
                print(f"{n:44s} r{rnd} {'green' if ok else 'RED'}")
            else:
                print(f"{n:44s} never driver-checked")
        print()

    print(f"declared queries:        {len(declared)}")
    print(f"ever driver-checked:     {len(declared) - len(never)}")
    print(f"never driver-checked:    {len(never)}")
    print(f"red at latest check:     {len(latest_red)}  {latest_red}")
    if stale:
        oldest = min(stale.values())
        oldest_qs = sorted(n for n, r in stale.items() if r == oldest)
        print(f"oldest green round:      r{oldest} ({len(oldest_qs)} queries)")
    if never:
        print("never-checked list (rotate these to the top of _CHECK_FIRST):")
        for n in never:
            print(f"  {n}")

    print(
        json.dumps(
            {
                "declared": len(declared),
                "ever_checked": len(declared) - len(never),
                "never_checked": never,
                "latest_red": latest_red,
            }
        )
    )


if __name__ == "__main__":
    main()
