"""Isolate and measure individual registry queries (guide §1: measure first).

Runs each named query at $SPARK_GRAFT_SF_DIR (default sf0.1) with the noop
sink (times the computation, not result pickling), labels the jobs, and can
dump .explain("formatted") per query. The bench.py contract is untouched —
this is the optimization-loop instrument, not the driver surface.

Usage:
  python tools/bench_one.py q1_pricing_summary katz_centrality_graph
  python tools/bench_one.py --repeat 3 --explain plans/r08 --suffix _before katz_centrality_graph
  python tools/bench_one.py --action collect ...   # bench.py's timed action
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", default=None, help="dir for <q><suffix>.txt plans")
    ap.add_argument("--suffix", default="", help="plan filename suffix (_before/_after)")
    ap.add_argument("--action", choices=["noop", "collect"], default="noop")
    ap.add_argument(
        "--release", action="store_true",
        help="between runs, unpersist every persistent RDD (leaked "
        "operator-internal localCheckpoints/persists) and GC both VMs — "
        "isolates each run from the previous one's block-manager residue",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from graphrag_toolkit_spark.session import TESTDATA_TABLES, build_session, load
    from graphrag_toolkit_spark.workload import all_queries

    spark = build_session("bench_one")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for t in TESTDATA_TABLES:  # same warm-up as bench.py
        try:
            load(spark, sf_dir, t).count()
        except Exception:
            pass

    out: dict[str, list[float]] = {}
    for name in args.queries:
        fn = queries[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(
                os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        runs = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            # fn() is INSIDE the timed region: iterative queries run eager
            # localCheckpoint jobs during construction (bench.py times the
            # same span)
            t0 = time.time()
            df = fn(spark, sf_dir)
            if args.action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            if args.release:
                from graphrag_toolkit_spark.session import release_blocks

                del df
                release_blocks(spark)
        out[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "timings": out,
                      "loadavg_1min": round(os.getloadavg()[0], 2)}))


if __name__ == "__main__":
    main()
