"""Temporal joins over event streams.

The as-of join — "for each left row, the latest right row at or before
its timestamp per key" — is the event-enrichment primitive (sessionize
clicks against the last view, price a trade at the last quote, attach
the most recent profile snapshot) that Spark's built-in joins lack: a
naive range join explodes to |left|x|right| per key and pandas
``merge_asof`` is a single-machine sort.

This implementation is the UNION + ORDERED-WINDOW shape, the one that
scales: tag both sides, union them, and take a running ``last`` of the
right-side payload ignoring nulls over a per-key window ordered by
``(ts, side, payload)`` — the right row "flows forward" to every later
left row with exactly ONE shuffle (the window's key exchange), no range
explosion, no driver-side sort.  Pure ``pyspark.sql.functions``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: Optional[str] = None,
    direction: str = "backward",
    tolerance_us: Optional[int] = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """As-of join -> every ``left`` row plus the matched ``right``
    row's columns as ``{right_prefix}<col>`` (NULL when no match).

    ``direction='backward'`` matches the LATEST right row with
    ``right.ts <= left.ts`` (exact-timestamp matches included);
    ``'forward'`` the EARLIEST with ``right.ts >= left.ts``.
    ``tolerance_us`` (microseconds) nulls out matches further away
    than the bound — the pandas ``merge_asof(tolerance=...)``
    semantics.  Right rows that tie on (key, ts) resolve to the
    payload-struct maximum, so the result is deterministic whatever
    the partitioning.

    Scale shape: one union + one per-key window (a single key
    exchange).  The running ``last(ignorenulls)`` is O(rows); no
    per-key range join, no |left|x|right| blowup on hot keys, no
    Python.  Timestamp order within a key is the window sort — at
    10^12 rows the exchange is the same one ANY per-key temporal
    operator pays."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction!r}")
    right_ts = right_ts or left_ts
    on = list(on)
    # the right timestamp is emitted once, as {prefix}{right_ts} from the
    # struct's _rts slot — keep it out of the payload list
    rpay = [c for c in right.columns if c not in on and c != right_ts]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("_rts"),
                    *[F.col(c) for c in rpay],
                ).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("_rrow"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None)
        .cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("s")
            ).schema["s"].dataType.simpleString()
        )
        .alias("_lrow"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in rpay]
        ).alias("_rrow"),
    )
    ts_order = F.col("_ts").asc() if direction == "backward" else (
        F.col("_ts").desc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("_side").asc(), F.col("_rrow").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_rrow", ignorenulls=True).over(w)
    out = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_m", matched)
        .filter(F.col("_side") == 1)
    )
    if tolerance_us is not None:
        # cast NTZ-friendly: a difference of two same-session casts is
        # timezone-invariant
        gap = F.abs(
            F.unix_micros(F.col("_ts").cast("timestamp"))
            - F.unix_micros(F.col("_m._rts").cast("timestamp"))
        )
        out = out.withColumn(
            "_m", F.when(gap <= F.lit(int(tolerance_us)), F.col("_m"))
        )
    cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    cols += [
        F.col("_m._rts").alias(f"{right_prefix}{right_ts}")
    ]
    cols += [F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in rpay]
    return out.select(*cols)


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """Gap-based sessionization -> the input plus ``session_index``
    (0-based per key, in time order) and ``session_id``
    (``<key>:<index>``) — the standard event-stream grouping (a new
    session starts when the gap since the previous event of the same
    key exceeds ``gap_us`` microseconds).

    The classic two-window formulation, exactly replayable in SQL:
    ``lag`` the previous timestamp per key, flag gap-exceeded (or
    first-event) rows, running-sum the flags.  Scale shape: ONE key
    exchange shared by both windows (same partitioning and ordering —
    Catalyst plans a single sort+exchange); no Python, no joins.  Ties
    at identical (key, ts) order by the remaining sort stability of the
    window — gap flags only compare against the lagged timestamp, so
    equal-ts runs always share a session regardless of their order."""
    key_cols = list(key_cols)
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*key_cols).orderBy(t.asc())
    prev = F.lag(t).over(w)
    new_sess = F.when(
        prev.isNull() | ((t - prev) > F.lit(int(gap_us))), 1
    ).otherwise(0)
    run = (
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - 1
    )
    out = df.withColumn("session_index", run.cast("long"))
    sid = F.concat_ws(
        ":",
        *[F.col(c).cast("string") for c in key_cols],
        F.col("session_index").cast("string"),
    )
    return out.withColumn("session_id", sid)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
    bucket_width: int = 3600,
    right_prefix: str = "right_",
) -> DataFrame:
    """Interval overlap join -> one row per (left, right) pair of
    CLOSED intervals that overlap (``l_start <= r_end AND r_start <=
    l_end``) within the same key — the range-join primitive (ad
    impressions x outages, sessions x incidents, genomic ranges) that
    Spark otherwise plans as a per-key cross product with a theta
    filter.

    The bucketed formulation: each interval explodes to the
    ``bucket_width``-sized buckets it covers, pairs meet by (key,
    bucket) EQUI-join, and each overlapping pair is emitted EXACTLY
    once — not by a distinct, but by keeping only the bucket containing
    ``greatest(l_start, r_start)`` (the pair's first shared bucket), so
    no dedup shuffle exists at all.  Start/end are integers (epoch
    seconds, positions); rows with start > end are dropped (empty
    intervals).

    Scale shape: fan-out per row = interval length / bucket_width
    (size ``bucket_width`` to the TYPICAL interval so fan-out is ~1-2),
    one equi-join both sides of which Catalyst/AQE can re-plan, and the
    overlap + first-bucket predicates are whole-stage codegen — no
    cross product, no Python, no distinct."""
    on = list(on)
    w = int(bucket_width)

    def explode_side(df, s, e, tag):
        return df.filter(F.col(s) <= F.col(e)).select(
            *on,
            F.struct(*[F.col(c) for c in df.columns]).alias(f"_{tag}row"),
            F.col(s).cast("long").alias(f"_{tag}s"),
            F.col(e).cast("long").alias(f"_{tag}e"),
            F.explode(
                F.sequence(
                    F.floor(F.col(s).cast("long") / w),
                    F.floor(F.col(e).cast("long") / w),
                )
            ).alias("_bk"),
        )

    le = explode_side(left, l_start, l_end, "l")
    re_ = explode_side(right, r_start, r_end, "r")
    joined = le.join(re_, [*on, "_bk"]).filter(
        (F.col("_ls") <= F.col("_re"))
        & (F.col("_rs") <= F.col("_le"))
        & (
            F.col("_bk")
            == F.floor(F.greatest(F.col("_ls"), F.col("_rs")) / w)
        )
    )
    lcols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    rcols = [
        F.col(f"_rrow.{c}").alias(f"{right_prefix}{c}")
        for c in right.columns
        if c not in on
    ]
    return joined.select(*lcols, *rcols)
