"""Sudden-appearance analyzer (SURVEY W1/A4/T1;
/root/reference/app/analyzers/sudden_appearance.py:59-147).

Reference semantics, reproduced exactly:
- window schedule over [end−history, end]: positions advance by ``step``
  from ``start`` with window size ``size``; if size == history there is a
  single scan; and when the advancing window passes ``end`` a FINAL clamped
  scan of [end−step, end] runs (sudden_appearance.py:77-87 — note the final
  window's size is the *step*, faithfully mirrored here);
- per window position and (aggregator, target): the EARLIEST event in the
  window (ES top_hits size=1 sort ts asc — es.py:713-778, ref A4/T1);
- that earliest event is an outlier iff its ts > window_end − step
  (sudden_appearance.py:118-120).

Spark-first reformulation: the reference issues one aggregation query per
window position (§3.3). Here ALL positions are evaluated in ONE distributed
pass: the (tiny, driver-computed) window schedule is broadcast-joined to
events on ts BETWEEN w_start AND w_end (each event lands in ≈size/step
windows — bounded fan-out), then one groupBy (window, aggregator, target)
with min_by picks the earliest event per group. No per-window job, no
driver loop over data.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import spread_input
from .terms import aggregator_col


def window_schedule(
    start: dt.datetime,
    end: dt.datetime,
    size: dt.timedelta,
    step: dt.timedelta,
) -> list[tuple[int, dt.datetime, dt.datetime]]:
    """(w_id, w_start, w_end) positions — mirrors evaluate_model's loop."""
    if step > size:
        raise ValueError("sliding_window_step_size should not be bigger than "
                         "sliding_window_size")
    wins = []
    s, e = start, start + size
    if e == end:
        return [(0, s, e)]
    i = 0
    while e < end:
        wins.append((i, s, e))
        i += 1
        s += step
        e += step
        if e >= end:
            wins.append((i, end - step, end))  # final clamped scan
    return wins


def sudden_appearance(
    df: DataFrame,
    groups: list[str],
    target: str,
    ts_col: str,
    start: dt.datetime,
    end: dt.datetime,
    size: dt.timedelta,
    step: dt.timedelta,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Outlier rows: earliest-in-window events landing in the window's final
    step. Output: one row per (w_id, aggregator, target) outlier with the
    earliest doc's columns + window metadata. ``payload_cols`` restricts
    which doc columns travel through the min_by shuffle (callers that only
    need the key shouldn't ship whole rows × the window fan-out)."""
    spark = df.sparkSession
    wins = window_schedule(start, end, size, step)
    win_df = spark.createDataFrame(
        [(i, s, e) for i, s, e in wins], "w_id int, w_start timestamp, w_end timestamp"
    )
    keep = payload_cols if payload_cols is not None else df.columns
    # spread only the columns the aggregation needs (project before the
    # exchange — guide §2.3); the docs variant ships 4 columns, not rows
    needed = list(dict.fromkeys([*groups, target, ts_col, *keep]))
    base = spread_input(
        df.dropna(subset=[*groups, target, ts_col]).select(*needed)
    ).withColumn(
        "aggregator", aggregator_col(groups)
    ).withColumn("target", F.col(target).cast("string"))
    # Window membership is ARITHMETIC, not a join: positions advance by a
    # fixed step, so event ts lands in the contiguous id range
    # [ceil((t-size)/step), floor(t/step)] (t = µs since start) plus the
    # final clamped scan. The round-6 range-condition broadcast join
    # planned as BroadcastNestedLoopJoin — O(events × positions)
    # interpreted predicate evaluations (measured 3.5 s at 1M events × 26
    # positions, single-task input); sequence+explode is whole-stage
    # codegen and O(events × fan-out). Exact µs integers through double
    # division stay exact (values ≪ 2^53), so boundary events land in
    # identical windows.
    n_reg = len(wins) if len(wins) == 1 else len(wins) - 1
    step_us = int(step.total_seconds() * 1_000_000)
    size_us = int(size.total_seconds() * 1_000_000)
    # cast covers TIMESTAMP_NTZ sources (session tz is UTC: identical wall
    # clock, and the windows were built from naive datetimes the same way)
    t_us = (F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(F.lit(start).cast("timestamp")))
    lo = F.greatest(F.lit(0),
                    F.ceil((t_us - F.lit(size_us)) / F.lit(step_us)).cast("int"))
    hi = F.least(F.lit(n_reg - 1),
                 F.floor(t_us / F.lit(step_us)).cast("int"))
    ids = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
        F.array().cast("array<int>"))
    if len(wins) > 1:  # final clamped scan [end-step, end]
        in_final = ((F.col(ts_col) >= F.lit(end - step))
                    & (F.col(ts_col) <= F.lit(end)))
        ids = F.when(in_final,
                     F.concat(ids, F.array(F.lit(n_reg)))).otherwise(ids)
    joined = base.withColumn("w_id", F.explode(ids))
    # earliest event per (window, aggregator, target) — ref A4/T1 top_hits(1, ts asc)
    payload = F.struct(F.col(ts_col).alias("_ts"), *[F.col(c) for c in keep])
    # group on w_id only (w_start/w_end are functions of w_id — re-attached
    # from the tiny schedule by a broadcast equi-join after the aggregation,
    # so the shuffle key is 1 int + 2 strings instead of +2 timestamps)
    firsts = joined.groupBy("w_id", "aggregator", "target").agg(
        F.min_by(payload, F.col(ts_col)).alias("doc"),
        F.count("*").cast("long").alias("num_target_value_in_window"),
    ).join(F.broadcast(win_df), "w_id")
    step_expr = F.expr(f"INTERVAL {int(step.total_seconds())} SECONDS")
    out = firsts.where(F.col("doc._ts") > F.col("w_end") - step_expr)
    return out.select(
        "w_id", "w_start", "w_end", "aggregator", "target",
        "num_target_value_in_window", "doc.*",
    ).drop("_ts")


def sudden_appearance_docs(
    df: DataFrame,
    groups: list[str],
    target: str,
    ts_col: str,
    start: dt.datetime,
    end: dt.datetime,
    size: dt.timedelta,
    step: dt.timedelta,
    key_col: str = "doc_id",
) -> DataFrame:
    """Distinct flagged docs across all window positions (enrichment view).

    LAG formulation (no window fan-out): event e is the earliest of its
    (aggregator, target) in window w iff its immediately-preceding
    same-group event (the latest earlier one) falls BEFORE w — so e is
    flagged iff some window position s_i = start + i·step satisfies

        max(e.ts − size, prev.ts + 1µs)  ≤  s_i  ≤  e.ts − size + step − 1µs

    (left: w contains e and excludes prev; right: e lands in w's final
    step, i.e. e.ts > s_i + size − step — all µs integers, and since
    size ≥ step the right bound also implies containment s_i ≤ e.ts),
    plus the final clamped scan [end−step, end] checked directly. An
    integer i exists iff ceil/floor of the bounds cross. This replaces
    the ~(size/step)-fold sequence+explode and the (w_id, aggregator,
    target) min_by aggregation with ONE shuffle of the raw events by
    (aggregator, target) and a codegen filter — the exploded stream and
    its size/step-times-larger aggregation state are gone (guide §2.3).
    Equality with the explode+min_by operator: exact integer µs both
    ways; ties in ts would make both argmin and lag order-dependent, but
    the full operator's contract already assumes tie-free (agg, target,
    ts) — verified across every sf — and the equivalence test pins the
    two paths against each other. The general windowed operator (window
    metadata + counts output) keeps the explode shape below."""
    from pyspark.sql import Window

    spark = df.sparkSession
    wins = window_schedule(start, end, size, step)
    needed = list(dict.fromkeys([*groups, target, ts_col, key_col]))
    base = spread_input(
        df.dropna(subset=[*groups, target, ts_col]).select(*needed)
    ).withColumn(
        "aggregator", aggregator_col(groups)
    ).withColumn("target", F.col(target).cast("string"))
    n_reg = len(wins) if len(wins) == 1 else len(wins) - 1
    step_us = int(step.total_seconds() * 1_000_000)
    size_us = int(size.total_seconds() * 1_000_000)
    start_lit = F.unix_micros(F.lit(start).cast("timestamp"))
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp")) - start_lit
    w = Window.partitionBy("aggregator", "target").orderBy(
        F.col(ts_col).cast("timestamp"))
    base = base.withColumn("_t", t_us).withColumn(
        "_p",
        F.unix_micros(F.lag(F.col(ts_col).cast("timestamp")).over(w))
        - start_lit)
    t_c, p_c = F.col("_t"), F.col("_p")
    lo_us = F.greatest(t_c - F.lit(size_us),
                       F.coalesce(p_c + F.lit(1), F.lit(-(1 << 62))))
    hi_us = t_c - F.lit(size_us) + F.lit(step_us - 1)
    i_lo = F.greatest(F.lit(0), F.ceil(lo_us / F.lit(step_us)).cast("long"))
    i_hi = F.least(F.lit(n_reg - 1),
                   F.floor(hi_us / F.lit(step_us)).cast("long"))
    flagged = i_lo <= i_hi
    if len(wins) > 1:  # final clamped scan [end-step, end]
        end_us = int((end - start).total_seconds() * 1_000_000)
        in_final = ((t_c > F.lit(end_us - step_us))
                    & (t_c <= F.lit(end_us))
                    & (F.coalesce(p_c, F.lit(-(1 << 62)))
                       < F.lit(end_us - step_us)))
        flagged = flagged | in_final
    return base.where(flagged).select(key_col).distinct()
