"""Temporal joins: as-of (point-in-time) and interval (range) joins.

North-star engine extensions — the reference has no event-time engine
(SURVEY §2.9: its "streaming" is incremental JSONL reading), but a
training-data / feature pipeline over event logs needs both:

- **as-of join** — for every left row, the most recent right row for the
  same key at or before the left timestamp (feature lookups, slowly-
  changing attributes, "last click before purchase").
- **interval join** — events matched into (start, end] ranges
  (maintenance windows, sessions, experiment cohorts).

Both are implemented Spark-first with NO theta-join:

- ``asof_join`` uses the union+carry-forward trick: tag both sides, union,
  and take ``last(right_payload, ignoreNulls=True)`` over a
  (key, ts, side, tiebreak)-ordered running window. One shuffle on the key
  — the same cost as a plain equi-join — instead of the
  O(|left|x|right per key|) range theta-join a naive ``l.ts >= r.ts``
  predicate produces. At 100 TB this is the only shape that survives:
  per-key data streams through a single sort, and skewed keys are handled
  by AQE like any other shuffle.
- ``interval_join`` buckets time into fixed-width cells: intervals explode
  into the cells they overlap (``sequence`` — bounded by interval length /
  cell width), events map to exactly ONE cell each, and the join is an
  equi-join on the cell followed by the exact containment filter. Because
  each event occupies a single cell, no post-join dedup is needed. Cell
  width is the tuning knob: ~the median interval length keeps the
  explode factor small while pruning almost all non-overlapping pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] = (),
    tiebreak: str | None = None,
    suffix: str = "_right",
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (inclusive): every ``left`` row gains the payload of the
    latest ``right`` row with the same ``on`` keys and
    ``right.ts <= left.ts`` (``direction='backward'``, the default) or the
    EARLIEST right row with ``right.ts >= left.ts``
    (``direction='forward'`` — pandas ``merge_asof(direction='forward')``)
    — within ``tolerance_seconds`` if given; NULLs when no such row
    exists. Either direction is the same single union + one running window
    per key, just mirrored (carry-forward vs carry-backward).

    ``right`` must be unique per (on, ts) — pre-dedup with a window if not
    (latest-wins by your own tiebreak) so the match is well-defined; the
    optional ``tiebreak`` column only orders LEFT rows against each other
    deterministically in the output.

    Matches at equal timestamps are included (right sorts before left at
    the same instant), mirroring ``ASOF JOIN ... ON l.ts >= r.ts``
    semantics in DuckDB/pandas ``merge_asof(direction='backward')``.
    """
    on = list(on)
    right_cols = list(right_cols) or [
        c for c in right.columns if c not in on and c != ts_col
    ]
    payload = F.struct(
        F.col(ts_col).alias("__asof_ts"),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l_cols = left.columns
    l = left.select(
        *[F.col(c) for c in l_cols],
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    # align schemas: right side carries NULLs for the left-only columns
    for c in l_cols:
        if c not in on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.select(*l_cols, "__ts", "__side", "__payload")

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if direction == "backward":
        # right (side 0) sorts before left at equal ts → inclusive match
        order = [F.col("__ts"), F.col("__side")]
    else:
        # forward: left sorts before right at equal ts so the following
        # frame anchored at the left row still sees the equal-ts right
        order = [F.col("__ts"), F.col("__side").desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = Window.partitionBy(*on).orderBy(*order)
    if direction == "backward":
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        match = F.last(F.col("__payload"), True).over(w)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        match = F.first(F.col("__payload"), True).over(w)
    carried = (
        l.unionByName(r)
        .withColumn("__match", match)
        .filter(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        gap = F.col("__ts").cast("long") - F.col("__match.__asof_ts").cast("long")
        if direction == "forward":
            gap = -gap
        carried = carried.withColumn(
            "__match", F.when(gap <= F.lit(tolerance_seconds), F.col("__match"))
        )
    out = carried.select(
        *l_cols,
        F.col("__match.__asof_ts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    ts_col: str = "ts",
    cell_seconds: int = 3600,
    inclusive_end: bool = True,
) -> DataFrame:
    """Range join via time-cell bucketing: rows of ``events`` matched to
    every row of ``intervals`` whose [start, end] contains ``ts``.

    ``intervals`` explodes into ``(end - start) / cell_seconds + 1`` cells;
    ``events`` maps each row to one cell; the pair space is the equi-join
    on the cell, and the exact predicate prunes edge cells. No column name
    overlap between the two inputs is assumed for the interval's
    start/end; all other columns from both sides pass through.
    """
    cell = lambda c: F.floor(F.col(c).cast("long") / F.lit(cell_seconds))  # noqa: E731
    iv = intervals.withColumn(
        "__cell",
        F.explode(F.sequence(cell(start_col), cell(end_col))),
    )
    ev = events.withColumn("__cell", cell(ts_col))
    upper = (
        F.col(ts_col) <= F.col(end_col)
        if inclusive_end
        else F.col(ts_col) < F.col(end_col)
    )
    return (
        ev.join(iv, "__cell")
        .filter((F.col(ts_col) >= F.col(start_col)) & upper)
        .drop("__cell")
    )


def time_grid(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    cell_seconds: int = 3600,
) -> DataFrame:
    """Dense per-key time grid: one row per (keys..., cell_start) for every
    cell between each key's min and max timestamp — the gap-filling
    skeleton for resampling (left-join per-cell aggregates onto it, fill
    zeros / carry forward). Grid size per key = span / cell_seconds; the
    explode is bounded and the build is one aggregate over the keys."""
    key_cols = list(key_cols)
    cell = F.floor(F.col(ts_col).cast("long") / F.lit(cell_seconds))
    bounds = df.groupBy(*key_cols).agg(
        F.min(cell).alias("__c0"), F.max(cell).alias("__c1")
    )
    return bounds.select(
        *key_cols,
        F.explode(F.sequence(F.col("__c0"), F.col("__c1"))).alias("__cell"),
    ).select(
        *key_cols,
        F.timestamp_seconds(F.col("__cell") * cell_seconds).alias("cell_start"),
    )


def ffill(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Carry-forward fill: latest non-null ``value_col`` per key up to each
    row (pandas ffill) — one running window, the standard Spark shape."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col or f"{value_col}_ffill",
        F.last(F.col(value_col), True).over(w),
    )


def touch_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    touch_types: Sequence[str],
    conversion_type: str,
    lookback_us: int = 24 * 3600 * 1_000_000,
) -> DataFrame:
    """Marketing touch attribution: for every conversion event, the FIRST
    and LAST touch by the same user inside the lookback window — the
    first-touch / last-touch attribution models every funnel analysis
    starts from. Returns (user, event_id, conv_ts_us, n_touches,
    first_touch_us, last_touch_us); touch columns are NULL for orphan
    conversions (no touch in window — attribution 'direct').

    Shape: NOT the conversions×touches interval join (which re-scans a
    user's touch list once per conversion) — one window over the UNION of
    touches and conversions per user, ordered by exact epoch-microseconds,
    with a RANGE frame [ts−lookback, ts) and conditional aggregates
    (``min/max(CASE WHEN touch THEN ts END)``): each user's timeline sorts
    ONCE, every conversion reads its frame from that sort. The interval
    join remains the oracle twin (fixture-sized); exactness is integer
    microsecond arithmetic end to end."""
    flagged = events.select(
        F.col(user_col).alias("user"),
        F.col("event_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(type_col).isin(*touch_types).alias("is_touch"),
        (F.col(type_col) == conversion_type).alias("is_conv"),
    ).filter(F.col("is_touch") | F.col("is_conv"))
    w = (
        Window.partitionBy("user")
        .orderBy("ts_us")
        .rangeBetween(-lookback_us, -1)
    )
    touch_ts = F.when(F.col("is_touch"), F.col("ts_us"))
    return (
        flagged.select(
            "user", "event_id", "ts_us", "is_conv",
            F.min(touch_ts).over(w).alias("first_touch_us"),
            F.max(touch_ts).over(w).alias("last_touch_us"),
            F.sum(F.when(F.col("is_touch"), 1).otherwise(0))
            .over(w).cast("bigint").alias("n_touches"),
        )
        .filter(F.col("is_conv"))
        .select(
            "user", "event_id", F.col("ts_us").alias("conv_ts_us"),
            F.coalesce("n_touches", F.lit(0)).alias("n_touches"),
            "first_touch_us", "last_touch_us",
        )
    )
