"""Build an UPSAMPLED scaling fixture (~sf1) from the read-only sf0.1
testdata: N key-shifted disjoint copies of every fact/dim table, so the
scaling ladder gains a decade (sf0.001 → sf1 = 1000× spread) for the
steepest probe families (typo_pairs 0.63, bpe_train 0.41, hits 0.40,
katz/pagerank 0.35-0.36 — slopes measured over 100× can hide a bend in
the last decade).

Construction (DuckDB, no Spark):
- every key column shifts by copy_index × stride (strides are powers of 10
  above each key's sf0.1 range), so joins stay within-copy and the typed-
  edge graph becomes N disjoint isomorphic components;
- key-derived names regenerate from the SHIFTED key (Customer#%09d /
  Supplier#%09d), so name-vocabulary families (typo_pairs) see real growth
  instead of N duplicates of the same vocab;
- free-text / embedding payloads repeat verbatim — token and vector
  DISTRIBUTIONS are what the probes scale against, and a 10× corpus with
  the same distribution is exactly the scaling question;
- nation/region copy as-is (spec constants at every SF).

SCALING USE ONLY — not an oracle fixture (the driver's correctness gate
stays on the read-only testdata).

Usage: python tools/make_scale_fixture.py [out_dir] [factor]
       (defaults: /tmp/spark_graft_scaled/sf1, 10)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> (key columns -> stride, name regen SQL templates keyed by column)
KEYED = {
    # name regen embeds the copy index TWICE (prefix digit + the shifted
    # key's millions digit): cross-copy name pairs then differ in >=2
    # positions, i.e. edit distance >= 2 — without the prefix, copies of
    # one name differ in exactly one digit and EVERY cross-copy pair is a
    # spurious ED-1 hit (measured: 3.3M pairs instead of ~10x the sf0.1
    # count — an upsample artifact, not a scaling signal)
    "customer": ({"c_custkey": 10**6},
                 {"c_name":
                  "printf('Customer%d#%09d', c_custkey // 1000000, c_custkey)"}),
    "orders": ({"o_orderkey": 10**7, "o_custkey": 10**6}, {}),
    "lineitem": ({"l_orderkey": 10**7, "l_partkey": 10**6,
                  "l_suppkey": 10**5}, {}),
    "part": ({"p_partkey": 10**6}, {}),
    "supplier": ({"s_suppkey": 10**5},
                 {"s_name":
                  "printf('Supplier%d#%09d', s_suppkey // 100000, s_suppkey)"}),
    "documents": ({"doc_id": 10**6}, {}),
    "events": ({"event_id": 10**7, "user_id": 10**6}, {}),
    "embeddings": ({"vec_id": 10**6}, {}),
}
COPY_AS_IS = ["nation", "region"]


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scaled/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t, (strides, regen) in KEYED.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()]
        legs = []
        for i in range(factor):
            sel = []
            for c in cols:
                if c in strides and i > 0:
                    sel.append(f"{c} + {i * strides[c]} AS {c}")
                else:
                    sel.append(c)
            legs.append(f"SELECT {', '.join(sel)} FROM {src}")
        union = " UNION ALL ".join(legs)
        if regen:
            outer = ", ".join(regen.get(c, c) + f" AS {c}" for c in cols)
            union = f"SELECT {outer} FROM ({union})"
        con.execute(
            f"COPY ({union}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{t}.parquet')").fetchone()[0]
        print(f"  {t:12s} {n:>9,} rows")
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"fixture at {out_dir} (factor {factor})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
