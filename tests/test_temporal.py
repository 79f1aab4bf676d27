"""Temporal join operators: as-of (union+carry-forward) and interval
(cell-bucketed) joins — semantics pinned against hand-computed expectations
and a pandas merge_asof cross-check."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from pyspark.sql import functions as F

from graphrag_toolkit_spark.operators.temporal import asof_join, interval_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00"), 5.0),
            (2, "u1", _ts("2024-01-01 12:00:00"), 6.0),
            (3, "u2", _ts("2024-01-01 09:00:00"), 7.0),  # before any right row
            (4, "u3", _ts("2024-01-01 10:00:00"), 8.0),  # key absent on right
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 100.0),
            ("u1", _ts("2024-01-01 12:00:00"), 200.0),  # equal-ts match for event 2
            ("u2", _ts("2024-01-01 11:00:00"), 300.0),  # after event 3
        ],
        "user_id string, ts timestamp, ref double",
    )
    return left, right


def test_asof_backward_inclusive(sides):
    left, right = sides
    out = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        right_cols=["ref"], tiebreak="event_id",
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[1]["ref_right"] == 100.0          # latest at-or-before
    assert rows[2]["ref_right"] == 200.0          # equal timestamp included
    assert rows[3]["ref_right"] is None           # no prior right row
    assert rows[3]["ts_right"] is None
    assert rows[4]["ref_right"] is None           # key never on right


def test_asof_tolerance(sides):
    left, right = sides
    out = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        right_cols=["ref"], tiebreak="event_id",
        tolerance_seconds=600,
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["ref_right"] is None           # 30 min > 10 min tolerance
    assert rows[2]["ref_right"] == 200.0          # 0 s lag passes


def test_asof_forward_inclusive_and_tolerance(sides):
    left, right = sides
    out = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        right_cols=["ref"], tiebreak="event_id", direction="forward",
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["ref_right"] == 200.0          # earliest at-or-after 10:00
    assert rows[2]["ref_right"] == 200.0          # equal timestamp included
    assert rows[3]["ref_right"] == 300.0          # 11:00 follows 09:00
    assert rows[4]["ref_right"] is None           # key never on right

    tol = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        right_cols=["ref"], tiebreak="event_id", direction="forward",
        tolerance_seconds=3600,
    )
    trows = {r["event_id"]: r for r in tol.collect()}
    assert trows[1]["ref_right"] is None          # next match 2 h away
    assert trows[3]["ref_right"] is None          # 2 h > 1 h
    assert trows[2]["ref_right"] == 200.0         # 0 s lag passes


def test_asof_forward_matches_pandas(spark):
    import pandas as pd

    rng_l = [(f"u{i % 3}", 1_700_000_000 + i * 37, i) for i in range(60)]
    rng_r = [(f"u{i % 3}", 1_700_000_000 + i * 53, 100 + i) for i in range(40)]
    left = spark.createDataFrame(rng_l, "k string, t long, lid long").withColumn(
        "ts", F.timestamp_seconds(F.col("t"))
    )
    right = spark.createDataFrame(rng_r, "k string, t long, ref long").withColumn(
        "ts", F.timestamp_seconds(F.col("t"))
    )
    # right must be unique per (k, ts) — it is by construction here
    got = {
        r["lid"]: r["ref_right"]
        for r in asof_join(
            left.select("k", "ts", "lid"),
            right.select("k", "ts", "ref"),
            on=["k"], ts_col="ts", right_cols=["ref"],
            tiebreak="lid", direction="forward",
        ).collect()
    }
    pl = pd.DataFrame(rng_l, columns=["k", "t", "lid"]).sort_values("t")
    pr = pd.DataFrame(rng_r, columns=["k", "t", "ref"]).sort_values("t")
    expect = pd.merge_asof(pl, pr, on="t", by="k", direction="forward")
    for _, row in expect.iterrows():
        want = None if pd.isna(row["ref"]) else int(row["ref"])
        assert got[row["lid"]] == want, row["lid"]


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas merge_asof(direction='backward')."""
    import numpy as np

    rng = np.random.RandomState(7)
    n_l, n_r = 200, 120
    lp = pd.DataFrame({
        "k": rng.randint(0, 5, n_l).astype(str),
        "ts": pd.to_datetime(rng.randint(0, 100_000, n_l), unit="s"),
    }).sort_values("ts").reset_index(drop=True)
    lp["event_id"] = range(n_l)
    rp = pd.DataFrame({
        "k": rng.randint(0, 5, n_r).astype(str),
        "ts": pd.to_datetime(rng.randint(0, 100_000, n_r), unit="s"),
        "payload": rng.randint(0, 1000, n_r).astype("int64"),
    })
    # unique (k, ts) on the right, as the operator contract requires
    rp = rp.sort_values(["k", "ts", "payload"]).drop_duplicates(["k", "ts"], keep="last")

    expected = pd.merge_asof(
        lp.sort_values("ts"), rp.sort_values("ts"),
        on="ts", by="k", direction="backward", suffixes=("", "_r"),
    ).sort_values("event_id")

    out = asof_join(
        spark.createDataFrame(lp, "k string, ts timestamp, event_id long"),
        spark.createDataFrame(rp, "k string, ts timestamp, payload long"),
        on=["k"], ts_col="ts", right_cols=["payload"], tiebreak="event_id",
    ).toPandas().sort_values("event_id")

    got = out["payload_right"].reset_index(drop=True)
    want = expected["payload"].reset_index(drop=True)
    assert got.where(got.notna(), -1).astype("int64").tolist() == \
        want.where(want.notna(), -1).astype("int64").tolist()


def test_interval_join_boundaries(spark):
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),   # == start (inclusive)
            (2, _ts("2024-01-01 11:30:00")),   # inside, different cell
            (3, _ts("2024-01-01 12:00:00")),   # == end (inclusive by default)
            (4, _ts("2024-01-01 12:00:01")),   # just after end
            (5, _ts("2024-01-01 09:59:59")),   # just before start
        ],
        "event_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("iv1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00"))],
        "iv string, start timestamp, end timestamp",
    )
    got = sorted(
        r["event_id"]
        for r in interval_join(events, intervals, cell_seconds=3600).collect()
    )
    assert got == [1, 2, 3]

    exclusive = sorted(
        r["event_id"]
        for r in interval_join(
            events, intervals, cell_seconds=3600, inclusive_end=False
        ).collect()
    )
    assert exclusive == [1, 2]


def test_interval_join_no_duplicate_matches(spark):
    """An event in a cell covered by a long interval matches exactly once
    regardless of how many cells the interval explodes into."""
    events = spark.createDataFrame(
        [(1, _ts("2024-01-01 05:00:00"))], "event_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [("iv", _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "iv string, start timestamp, end timestamp",
    )
    out = interval_join(events, intervals, cell_seconds=600)
    assert out.count() == 1


def test_interval_join_plan_is_equi_join(spark):
    """The physical plan must join on the cell (hash/sort-merge or broadcast
    HASH join) — never a BroadcastNestedLoopJoin from the range predicate."""
    events = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    intervals = spark.range(5).select(
        F.col("id").alias("iv"),
        F.timestamp_seconds(F.col("id") * 1200).alias("start"),
        F.timestamp_seconds(F.col("id") * 1200 + 900).alias("end"),
    )
    plan = interval_join(events, intervals)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_asof_plan_single_carry_shuffle(spark):
    """The as-of join itself must cost ONE exchange (on the key) — the
    union+carry-forward contract; and never a nested-loop range join."""
    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 10).cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    right = spark.range(50).select(
        (F.col("id") % 10).cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") * 97).alias("ts"),
        F.col("id").alias("payload"),
    )
    plan = asof_join(
        left, right, on=["k"], ts_col="ts", right_cols=["payload"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert plan.count("Exchange") == 1


def test_time_grid_and_ffill(spark):
    """Grid densifies gaps; ffill carries the last observation across them."""
    from graphrag_toolkit_spark.operators.temporal import ffill, time_grid

    ev = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:30:00"), 1.0),
            ("a", _ts("2024-01-01 03:10:00"), 5.0),   # 2-hour gap before
            ("b", _ts("2024-01-01 01:00:00"), 2.0),
        ],
        "k string, ts timestamp, v double",
    )
    grid = time_grid(ev, ["k"], "ts", 3600)
    cells = {r["k"]: [] for r in grid.collect()}
    for r in grid.collect():
        cells[r["k"]].append(r["cell_start"])
    assert len(cells["a"]) == 4        # hours 00..03 inclusive
    assert len(cells["b"]) == 1

    agg = ev.groupBy(
        "k",
        F.timestamp_seconds(
            F.floor(F.col("ts").cast("long") / 3600) * 3600
        ).alias("cell_start"),
    ).agg(F.max("v").alias("v"))
    j = grid.join(agg, ["k", "cell_start"], "left")
    out = ffill(j, ["k"], "cell_start", "v")
    a = {
        r["cell_start"].hour: (r["v"], r["v_ffill"])
        for r in out.filter(F.col("k") == "a").collect()
    }
    assert a[0] == (1.0, 1.0)
    assert a[1] == (None, 1.0)   # gap: carried
    assert a[2] == (None, 1.0)
    assert a[3] == (5.0, 5.0)


def test_interval_join_matches_bruteforce_random(spark):
    """Randomized cross-check: cell-bucketed interval join == brute-force
    theta join over the same rows."""
    import random

    rng = random.Random(11)
    events = [(i, rng.randint(0, 50_000)) for i in range(300)]
    intervals = []
    for j in range(40):
        s = rng.randint(0, 45_000)
        intervals.append((j, s, s + rng.randint(0, 8_000)))

    ev = spark.createDataFrame(
        [(i, __import__("datetime").datetime.utcfromtimestamp(t)) for i, t in events],
        "event_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (
                j,
                __import__("datetime").datetime.utcfromtimestamp(s),
                __import__("datetime").datetime.utcfromtimestamp(e),
            )
            for j, s, e in intervals
        ],
        "iv long, start timestamp, end timestamp",
    )
    got = sorted(
        (r["event_id"], r["iv"])
        for r in interval_join(ev, iv, cell_seconds=600).collect()
    )
    want = sorted(
        (i, j)
        for i, t in events
        for j, s, e in intervals
        if s <= t <= e
    )
    assert got == want


class TestTouchAttribution:
    def test_first_last_and_orphan(self, spark):
        """u1: two touches inside the window and one outside → first/last
        pick the in-window pair; u2's conversion has no touch in window →
        NULL attribution ('direct'); a touch AT the conversion timestamp
        is excluded (frame ends at −1 µs)."""
        from graphrag_toolkit_spark.operators.temporal import touch_attribution

        base = 1_700_000_000_000_000  # µs
        hour = 3600 * 1_000_000

        def ev(i, user, t_us, typ):
            return {
                "event_id": i, "user_id": user,
                "ts_us": t_us, "event_type": typ,
            }

        rows = [
            ev(1, "u1", base - 30 * hour, "click"),   # outside 24h window
            ev(2, "u1", base - 10 * hour, "view"),    # first in window
            ev(3, "u1", base - 2 * hour, "click"),    # last in window
            ev(4, "u1", base, "purchase"),            # conversion
            ev(5, "u1", base, "click"),               # same-µs: excluded
            ev(6, "u2", base, "purchase"),            # orphan conversion
            ev(7, "u2", base + hour, "click"),        # after: excluded
        ]
        df = spark.createDataFrame(rows).select(
            "event_id", "user_id", "event_type",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
        )
        out = {
            r["event_id"]: r
            for r in touch_attribution(
                df, "user_id", "ts", "event_type",
                touch_types=["click", "view"], conversion_type="purchase",
            ).collect()
        }
        assert set(out) == {4, 6}
        assert out[4]["n_touches"] == 2
        assert out[4]["first_touch_us"] == base - 10 * hour
        assert out[4]["last_touch_us"] == base - 2 * hour
        assert out[6]["n_touches"] == 0
        assert out[6]["first_touch_us"] is None and out[6]["last_touch_us"] is None


class TestMaintainJoin:
    def _fixture(self, spark):
        view = spark.createDataFrame(
            [(1, 10, 5.0, "A"), (2, 20, 6.0, "B")],
            "key long, ck long, price double, dim_val string",
        )
        dim = spark.createDataFrame(
            [(10, "A"), (20, "B"), (30, "C")], "ck long, dim_val string"
        )
        return view, dim

    def test_update_delete_insert(self, spark):
        from graphrag_toolkit_spark.sources.sink import maintain_join

        view, dim = self._fixture(spark)
        changes = spark.createDataFrame(
            [
                (1, 30, 9.0, 1, "U"),    # key 1 moves to dim 30
                (2, None, None, 1, "D"),  # key 2 deleted
                (3, 20, 7.0, 1, "I"),    # new key joins dim 20
            ],
            "key long, ck long, price double, seq long, op string",
        )
        out = sorted(
            (r["key"], r["ck"], r["price"], r["dim_val"])
            for r in maintain_join(view, changes, "key", dim, "ck").collect()
        )
        assert out == [(1, 30, 9.0, "C"), (3, 20, 7.0, "B")]

    def test_latest_seq_wins_and_orphan_drops(self, spark):
        from graphrag_toolkit_spark.sources.sink import maintain_join

        view, dim = self._fixture(spark)
        changes = spark.createDataFrame(
            [
                (1, 30, 9.0, 1, "U"),
                (1, 99, 1.0, 2, "U"),    # later update to a MISSING dim key
            ],
            "key long, ck long, price double, seq long, op string",
        )
        out = sorted(
            (r["key"], r["ck"])
            for r in maintain_join(view, changes, "key", dim, "ck").collect()
        )
        # key 1's final dim key (99) has no match -> drops, exactly as a
        # recompute would; key 2 untouched
        assert out == [(2, 20)]

    def test_matches_recompute(self, spark):
        from graphrag_toolkit_spark.sources.sink import apply_changelog, maintain_join

        view, dim = self._fixture(spark)
        base = view.select("key", "ck", "price")
        changes = spark.createDataFrame(
            [(1, 10, 8.5, 1, "U"), (3, 30, 3.0, 1, "I")],
            "key long, ck long, price double, seq long, op string",
        )
        incremental = maintain_join(view, changes, "key", dim, "ck")
        recomputed = apply_changelog(base, changes, "key").join(dim, "ck")
        assert sorted(map(tuple, incremental.select("key", "ck", "price", "dim_val").collect())) == sorted(
            map(tuple, recomputed.select("key", "ck", "price", "dim_val").collect())
        )


class TestDeriveChangelog:
    def _snapshots(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
            "key long, st string, price double",
        )
        new = spark.createDataFrame(
            [(1, "a", 1.0), (2, "B", 2.0), (3, "c", 3.0), (5, "e", 5.0)],
            "key long, st string, price double",
        )
        return old, new

    def test_minimal_iud(self, spark):
        from graphrag_toolkit_spark.sources.sink import derive_changelog

        old, new = self._snapshots(spark)
        out = {
            r["key"]: (r["op"], r["st"], r["price"])
            for r in derive_changelog(old, new, "key").collect()
        }
        # key 1 unchanged -> ABSENT (minimality); key 3 NULL->3.0 is a real U
        assert out == {
            2: ("U", "B", 2.0),
            3: ("U", "c", 3.0),
            4: ("D", None, None),
            5: ("I", "e", 5.0),
        }

    def test_round_trip_apply_derive(self, spark):
        from graphrag_toolkit_spark.sources.sink import (
            apply_changelog,
            derive_changelog,
        )

        old, new = self._snapshots(spark)
        rebuilt = apply_changelog(
            old, derive_changelog(old, new, "key"), "key"
        )
        assert sorted(map(tuple, rebuilt.collect())) == sorted(
            map(tuple, new.collect())
        )

    def test_identical_snapshots_empty_log(self, spark):
        from graphrag_toolkit_spark.sources.sink import derive_changelog

        old, _ = self._snapshots(spark)
        assert derive_changelog(old, old, "key").count() == 0

    def test_payload_mismatch_raises(self, spark):
        import pytest as _pytest

        from graphrag_toolkit_spark.sources.sink import derive_changelog

        old, new = self._snapshots(spark)
        with _pytest.raises(ValueError):
            derive_changelog(old, new.drop("price"), "key")


class TestLifecycleRoundTrip:
    def test_snapshot_series_via_changelogs_rebuilds_every_state(self, spark):
        """The lifecycle trio composes: a series of snapshots S0→S1→S2,
        converted to changelogs with `derive_changelog`, replays through
        `apply_changelog` to EVERY intermediate state — the
        snapshots-to-CDC-to-snapshots loop a lakehouse time-travel layer
        relies on."""
        from graphrag_toolkit_spark.sources.sink import (
            apply_changelog,
            derive_changelog,
        )

        s0 = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "key long, st string, price double"
        )
        s1 = spark.createDataFrame(
            [(1, "a", 1.5), (3, "c", 3.0)], "key long, st string, price double"
        )
        s2 = spark.createDataFrame(
            [(3, "c2", 3.0), (4, "d", 4.0)], "key long, st string, price double"
        )
        state = s0
        for target in (s1, s2):
            log = derive_changelog(state, target, "key")
            state = apply_changelog(state, log, "key").localCheckpoint(eager=True)
            assert sorted(map(tuple, state.collect())) == sorted(
                map(tuple, target.collect())
            )


class TestNeymanAllocation:
    def _dir(self, spark, tmp_path, rows):
        import os
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
        return str(tmp_path)

    def test_quotas_sum_to_budget_and_favor_spread(self, spark, tmp_path):
        from datetime import datetime
        from graphrag_toolkit_spark.workload.events import (
            NEYMAN_BUDGET,
            neyman_allocation_events,
        )

        ts = datetime(2024, 1, 1)
        rows = []
        eid = 0
        # type "wide": values 0/100 alternating (high variance);
        # type "tight": constant-ish values (tiny variance); equal sizes.
        for i in range(40):
            rows.append((eid, ts, i, "wide", float(100 * (i % 2)), "{}")); eid += 1
        for i in range(40):
            rows.append((eid, ts, i, "tight", 50.0 + (i % 2) * 0.01, "{}")); eid += 1
        d = self._dir(spark, tmp_path, rows)
        got = {r["event_type"]: r for r in neyman_allocation_events(spark, d).collect()}
        total = sum(r["alloc"] for r in got.values())
        assert total == NEYMAN_BUDGET          # largest-remainder exactness
        # equal N, far larger S -> "wide" gets (nearly) all of the budget
        assert got["wide"]["alloc"] > got["tight"]["alloc"] * 100

    def test_sample_draws_exactly_alloc_rows(self, spark, tmp_path):
        from datetime import datetime
        from graphrag_toolkit_spark.workload.events import (
            neyman_allocation_events,
            neyman_sample_events,
        )

        ts = datetime(2024, 1, 1)
        rows = []
        eid = 0
        for i in range(3000):
            rows.append((eid, ts, i, "a", float(i % 97), "{}")); eid += 1
        for i in range(3000):
            rows.append((eid, ts, i, "b", float((i * 7) % 53), "{}")); eid += 1
        d = self._dir(spark, tmp_path, rows)
        alloc = {
            r["event_type"]: r["alloc"]
            for r in neyman_allocation_events(spark, d).collect()
        }
        drawn = (
            neyman_sample_events(spark, d)
            .groupBy("event_type")
            .count()
            .collect()
        )
        for r in drawn:
            # population >= quota here, so the draw hits the quota exactly
            assert r["count"] == alloc[r["event_type"]]


class TestSurvivalCurve:
    def test_censoring_and_km_steps(self, spark, tmp_path):
        import os
        from datetime import datetime
        from graphrag_toolkit_spark.workload.events import survival_curve_events

        def ev(eid, day, user):
            return (eid, datetime(2024, 1, 1 + day), user, "x", 1.0, "{}")

        # users 1,2: lifetime 0 (single day, churned); user 3: lifetime 1
        # (churned); user 4: last event on the final day -> CENSORED at
        # lifetime 2. Horizon day = 3.
        rows = [
            ev(0, 0, 1), ev(1, 0, 2),
            ev(2, 0, 3), ev(3, 1, 3),
            ev(4, 1, 4), ev(5, 3, 4),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
        out = {r["t"]: r for r in survival_curve_events(spark, str(tmp_path)).collect()}
        # t=0: 4 at risk, 2 churn; t=1: 2 at risk, 1 churn; t=2: 1 at risk,
        # 0 churn (censored exit only) -> ln_factor NULL-free everywhere
        assert (out[0]["n_risk"], out[0]["d_t"], out[0]["c_t"]) == (4, 2, 0)
        assert (out[1]["n_risk"], out[1]["d_t"], out[1]["c_t"]) == (2, 1, 0)
        assert (out[2]["n_risk"], out[2]["d_t"], out[2]["c_t"]) == (1, 0, 1)
        import math
        # running log-survival at t=1 = qln(1/2) + qln(1/2)
        q = round(math.log(0.5), 6)
        assert out[1]["log_survival"] == 2 * q
        # censored-only step multiplies by 1 (ln 1 = 0): unchanged
        assert out[2]["log_survival"] == 2 * q
