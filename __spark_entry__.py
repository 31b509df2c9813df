"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real catalog lives in ``kafkaconnect_spark/queries.py`` — one
entry per operator from SURVEY.md §2 plus the Phase-E training-data
operators (dedup / similarity / text / multimodal).

Ordering: the driver records a bounded prefix of ``queries()`` per
round (r1 recorded exactly the first 50 of 95), so entries are
ordered not-yet-driver-verified first — computed from the union of
prior CORRECTNESS_r*.json rows — and already-verified last. Each
round therefore converts the oldest unproven tail into driver rows
instead of re-proving the same prefix.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)

from kafkaconnect_spark.queries import QUERY_CATALOG  # noqa: E402


def _driver_covered() -> set[str]:
    """Names with a green row in any prior round's CORRECTNESS file.

    A query counts as covered only by the strongest check it can get:
    hash_match for oracled queries, rows_match for rows-only ones.
    Failed rows stay uncovered so they re-run at the front after a fix.
    """
    covered: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict) or name not in QUERY_CATALOG:
                continue
            if QUERY_CATALOG[name].oracle is None:
                if row.get("rows_match"):
                    covered.add(name)
            elif row.get("hash_match"):
                covered.add(name)
    return covered


# Queries added AFTER this round's 50-entry priority prefix was fixed.
# The driver records a bounded prefix (50 in r1), so a brand-new query
# must not displace an older still-unproven one out of the window;
# deferred names sort after the unproven block and clear naturally
# once the older block gains rows (they then front-run the next round
# as ordinary uncovered entries).
# r3: the r2-deferred block IS this round's front window (30 unproven
# queries); new r3-built queries sort AFTER it so they cannot displace
# the older unproven block. The r3 catalog grew past one window
# (30 old + 32 new > 50): the newest ~12 entries intentionally wait
# for the r4 window — every one of them passes the full local gate at
# all three scale factors (tools/verify_local.py).
_DEFER_NEW: set[str] = {
    "referential_integrity_audit",
    "events_user_erasure_audit",
    "events_key_skew_report",
    "lineitem_price_histogram",
    "mixture_epoch_schedule",
    "events_sliding_distinct",
    "events_funnel_timebound",
    "docs_oov_rate",
    "events_type_overlap_kmv",
    "docs_tfidf_pairs",
    "multimodal_phash",
    "dedup_simhash_pairs",
    "docs_shingle_novelty",
    "events_cumulative_users",
    "orders_pareto_share",
    "embedding_pq_codes",
    "docs_dedup_rate_by_source",
    "events_error_rate_hourly",
    "multimodal_phash_hamming",
    "events_markov_transitions",
    "docs_length_percentiles_by_lang",
    "events_cms_error_audit",
    "embedding_hard_negatives",
    "docs_trigram_vocab_growth",
    "docs_zipf_slope",
    "events_watermark_late_drop",
    "docs_curriculum_phases",
    "docs_weighted_sample",
    "orders_open_backlog_monthly",
    "multimodal_audio_vad",
    "events_session_duration_histogram",
    "orders_customer_ltv_cohort",
    "embedding_dim_truncation_recall",
    "events_ab_test_lift",
    "events_sax_motifs",
    "events_series_similarity",
    "lineitem_rolling_7day_revenue",
    "embedding_centroid_drift",
    "events_anomaly_mad",
    "multimodal_phash_clusters",
    "dedup_lsh_recall_audit",
}


def _ordered_names() -> list[str]:
    covered = _driver_covered()
    names = list(QUERY_CATALOG)
    uncovered = [n for n in names if n not in covered]
    return (
        [n for n in uncovered if n not in _DEFER_NEW]
        + [n for n in uncovered if n in _DEFER_NEW]
        + [n for n in names if n in covered]
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3-shaped
    revenue top-10 (broadcast dim join + co-partitioned fact join)."""
    return QUERY_CATALOG["q3_top_revenue_orders"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / Phase E,
    not-yet-driver-verified entries first."""
    return {name: QUERY_CATALOG[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted entries take the
    driver's weaker rows-only check."""
    return {
        name: QUERY_CATALOG[name].oracle
        for name in _ordered_names()
        if QUERY_CATALOG[name].oracle is not None
    }
