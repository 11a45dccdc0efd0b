"""Event-stream analytics tier — sessions, funnels, growth, anomalies.

The engine's product-analytics operators over the testdata `events`
table, batch and streaming side by side:

    sessionize / session_stats (gap sessions)
    -> event_funnel (ordered conversion, then time-windowed)
    -> funnel_stream (the same funnel resumed incrementally across
       micro-batches, state as an epoch-scoped artifact)
    -> daily growth + day-N retention cohorts
    -> median/MAD value anomaly summary

Usage: python examples/events_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from epss_spark.operators import sessionize as sz  # noqa: E402
from epss_spark.session import get_spark  # noqa: E402
from epss_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("events-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")

    s = sz.session_stats(ev, gap_seconds=3600, tiebreak="event_id")
    agg = s.agg(
        F.count(F.lit(1)).alias("sessions"),
        F.round(F.avg("n_events"), 2).alias("avg_events"),
        F.round(F.avg("duration_sec"), 1).alias("avg_dur_sec"),
    ).collect()[0]
    print(f"sessions (1h gap): {agg.sessions}  avg_events={agg.avg_events} "
          f"avg_duration={agg.avg_dur_sec}s")

    steps = ["signup", "view", "purchase"]
    print("conversion funnel (unbounded / within 24h):")
    unb = {r.step: r for r in sz.event_funnel(ev, steps).collect()}
    win = {r.step: r for r in
           sz.event_funnel(ev, steps, max_gap_seconds=86400).collect()}
    for i, name in enumerate(steps, start=1):
        print(f"  {i}. {name:<9} {unb[i].n_converted:>6} ({unb[i].conversion})"
              f"   24h: {win[i].n_converted:>6} ({win[i].conversion})")

    # the same funnel as a stream: replay the events table as 3
    # time-ordered micro-batches and read the live snapshot
    from epss_spark.streaming import funnel_stream

    with tempfile.TemporaryDirectory() as td:
        state = os.path.join(td, "state")
        ordered = ev.orderBy("ts", "event_id").collect()
        third = max(1, len(ordered) // 3)
        for epoch, lo in enumerate(range(0, len(ordered), third)):
            funnel_stream.process_funnel_batch(
                spark.createDataFrame(ordered[lo:lo + third], ev.schema),
                epoch, state, steps,
            )
        snap = {r.step: r for r in
                funnel_stream.funnel_snapshot(spark, state, steps).collect()}
        match = all(snap[i].n_converted == unb[i].n_converted for i in (1, 2, 3))
        print(f"streaming funnel snapshot == batch funnel: {match}")

    print("daily growth (first 5 days):")
    d = ev.select("user_id", F.col("ts").cast("date").alias("day"))
    dau = d.groupBy("day").agg(F.count_distinct("user_id").alias("active"))
    for r in dau.orderBy("day").limit(5).collect():
        print(f"  {r.day}: active={r.active}")

    print("day-N retention (first cohort):")
    coh = sz.retention_cohorts(ev)
    first = coh.agg(F.min("cohort_day")).collect()[0][0]
    for r in (coh.filter(F.col("cohort_day") == first)
              .orderBy("day_offset").limit(5).collect()):
        print(f"  day+{r.day_offset}: {r.n_active}/{r.cohort_size} "
              f"({r.retention_rate})")

    print("value anomalies (median/MAD, 3 robust sigmas):")
    for r in sz.value_outliers(ev).orderBy("event_type").collect():
        print(f"  {r.event_type}: n={r.n} median={r.median} mad={r.mad} "
              f"outliers={r.n_outliers}")

    spark.stop()


if __name__ == "__main__":
    main()
