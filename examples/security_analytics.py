"""Security-analytics walkthrough over the events table — the
cybersecurity side of the engine (the reference's home turf), showing
how the window/analytics operators compose into a hunting workflow:

    sessionization (30-min gap)            → user activity sessions
    beaconing detection (gap CV)           → C2-polling candidates
    as-of enrichment (latest snapshot)     → point-in-time context
    value percentiles per event type       → outlier thresholds
    top-N events per user                  → triage shortlist
    attack-chain sequence match (CEP)      → signup→click within 12h
    kill-chain funnel staging              → how far each user got
    bloom-pruned IOC semi join             → events of flagged users
    incident-window range join             → events inside 6h windows
    interval merge (gaps-and-islands)      → consolidated activity spans
    alert suppression (rate limiting)      → first error per user/hour

Run: python examples/security_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F


def main(sf_dir: str) -> None:
    from cybersecurity_miw_spark.catalog import QUERIES
    from cybersecurity_miw_spark.operators import windows
    from cybersecurity_miw_spark.session import get_spark
    from cybersecurity_miw_spark.sources.tables import load_events

    spark = get_spark("security-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_events(spark, sf_dir)

    print("== sessions (30-min gap) — longest first ==")
    sessions = windows.session_summary(ev, gap_minutes=30)
    sessions.orderBy(F.desc("n_events")).show(5)

    print("== beaconing candidates (low inter-event gap CV) ==")
    QUERIES["beacon_interval_profile"](spark, sf_dir).orderBy(
        "cv_x1e6"
    ).show(5)

    print("== as-of enrichment: each event with its latest snapshot ==")
    QUERIES["asof_join_latest_snapshot"](spark, sf_dir).orderBy(
        "event_id"
    ).show(5)

    print("== value percentiles per event type (outlier thresholds) ==")
    QUERIES["event_value_percentiles"](spark, sf_dir).show()

    print("== top-3 events per user (triage shortlist) ==")
    windows.top_n_per_key(
        ev.select("user_id", "event_id", "event_type", "value"),
        n=3, key_col="user_id", order_col="value",
        tiebreak_col="event_id",
    ).orderBy("user_id", F.desc("value")).show(9)

    print("== attack-chain sequence: view immediately → click ≤12h ==")
    QUERIES["sequence_match_view_click"](spark, sf_dir).orderBy(
        "start_s"
    ).show(5)

    print("== kill-chain funnel: signup → click → purchase (24h/stage) ==")
    QUERIES["funnel_signup_click_purchase"](spark, sf_dir).orderBy(
        F.desc("depth"), "user_id"
    ).show(5)

    print("== bloom-pruned semi join: events of high-error users ==")
    QUERIES["bloom_semi_join_error_users"](spark, sf_dir).groupBy(
        "user_id"
    ).count().orderBy(F.desc("count")).show(5)

    print("== range join: events inside per-user 6h incident windows ==")
    QUERIES["range_join_event_windows"](spark, sf_dir).groupBy(
        "window_id"
    ).count().orderBy(F.desc("count")).show(5)

    print("== interval merge: per-user activity consolidated to spans ==")
    QUERIES["merge_user_activity_intervals"](spark, sf_dir).orderBy(
        F.desc("n_merged")
    ).show(5)

    print("== alert suppression: first error per user per hour ==")
    QUERIES["alert_dedup_first_per_hour"](spark, sf_dir).orderBy(
        "hour_s", "user_id"
    ).show(5)

    print("== metrics view: hourly OHLC bars + gap-filled series ==")
    QUERIES["ohlc_hourly_value"](spark, sf_dir).orderBy(
        "event_type", "bucket_s"
    ).show(5)
    QUERIES["gapfill_hourly_avg_value"](spark, sf_dir).where(
        F.col("was_gap")
    ).orderBy("event_type", "bucket_s").show(5)

    print("== feed health: activity gaps >1h per event type ==")
    QUERIES["activity_gap_detection"](spark, sf_dir).orderBy(
        F.desc("gap_s")
    ).show(5)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
