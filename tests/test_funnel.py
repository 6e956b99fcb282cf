"""Funnel / retention / kNN-vote / centroid operator semantics on tiny
hand-built frames (the contract oracles cover the testdata parity)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.funnel import (
    funnel_steps,
    weekly_retention,
)
from uk_housing_dashboard_etl_spark.operators.similarity import (
    knn_classify,
    label_centroids,
)

STEPS = ["signup", "view", "purchase"]


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_strict_ordering(spark):
    rows = [
        # u1 completes in order
        (1, _ts(1), "signup"), (1, _ts(2), "view"), (1, _ts(3), "purchase"),
        # u2: purchase BEFORE view -> stops at view
        (2, _ts(1), "signup"), (2, _ts(3), "view"), (2, _ts(2), "purchase"),
        # u3: never signs up -> reaches nothing
        (3, _ts(1), "view"), (3, _ts(2), "purchase"),
        # u4: signup only
        (4, _ts(5), "signup"),
    ]
    out = {
        r["step"]: (r["event_type"], r["users"])
        for r in funnel_steps(_events(spark, rows), STEPS).collect()
    }
    assert out == {1: ("signup", 3), 2: ("view", 2), 3: ("purchase", 1)}


def test_funnel_equal_ts_excluded_by_strict_gt(spark):
    # view at exactly the signup timestamp must NOT count (strict >)
    rows = [(1, _ts(1), "signup"), (1, _ts(1), "view"), (1, _ts(2), "purchase")]
    out = {r["step"]: r["users"] for r in funnel_steps(_events(spark, rows), STEPS).collect()}
    assert out == {1: 1, 2: 0, 3: 0}


def test_funnel_zero_users_midstep_still_accumulates(spark):
    # nobody ends at step 1: both users progress to step >= 2
    rows = [
        (1, _ts(1), "signup"), (1, _ts(2), "view"),
        (2, _ts(1), "signup"), (2, _ts(2), "view"), (2, _ts(3), "purchase"),
    ]
    out = {r["step"]: r["users"] for r in funnel_steps(_events(spark, rows), STEPS).collect()}
    assert out == {1: 2, 2: 2, 3: 1}


def test_weekly_retention_counts(spark):
    # week of 2024-01-01 (Mon) and 2024-01-08: u1 retained, u2 churned,
    # u3 appears only in week 2
    rows = [
        (1, _ts(2), "view"), (1, _ts(9), "view"),
        (2, _ts(3), "view"),
        (3, _ts(10), "view"),
    ]
    out = {
        r["week"].date().isoformat(): (
            r["active_users"], r["retained_users"], r["retention_rate"]
        )
        for r in weekly_retention(_events(spark, rows)).collect()
    }
    assert out["2024-01-01"] == (2, 1, 0.5)
    assert out["2024-01-08"] == (2, 0, 0.0)


def test_knn_classify_majority_and_tiebreak(spark):
    # cosine to the query (1, 0) is 1/sqrt(1 + tilt^2): distinct at 4dp
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.05], 3),   # cos ~0.9988  (nearest)
            (11, [1.0, 0.10], 7),   # cos ~0.9950
            (12, [1.0, 0.20], 7),   # cos ~0.9806
            (13, [-1.0, 0.0], 5),   # cos -1
        ],
        "vec_id long, embedding array<float>, label int",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, embedding array<float>"
    )
    # k=3 -> labels {3, 7, 7} -> majority 7
    row = knn_classify(corpus, queries, k=3).collect()[0]
    assert (row["predicted_label"], row["votes"]) == (7, 2)
    # k=2 -> one vote each for 3 and 7 -> smaller label wins the tie
    row = knn_classify(corpus, queries, k=2).collect()[0]
    assert (row["predicted_label"], row["votes"]) == (3, 1)


def test_label_centroids_exact_means(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 2.0], 0),
            (1, [3.0, 6.0], 0),
            (2, [5.0, 5.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        (r["label"], r["dim"]): (r["centroid"], r["n_vectors"])
        for r in label_centroids(emb).collect()
    }
    assert out == {
        (0, 0): (2.0, 2),
        (0, 1): (4.0, 2),
        (1, 0): (5.0, 1),
        (1, 1): (5.0, 1),
    }


def test_funnel_single_shuffle_plan(spark, sf_small):
    """The funnel must be ONE aggregate over events (no per-step join
    cascade): exactly one Exchange below the per-user fold."""
    from uk_housing_dashboard_etl_spark.sources.readers import read_table

    ev = read_table(spark, sf_small, "events")
    plan = funnel_steps(ev, STEPS)._jdf.queryExecution().executedPlan().toString()
    # the events-side aggregation appears once; the step-list join is a
    # broadcast of a <=n-row frame, never a shuffle of events
    assert plan.count("SortMergeJoin") == 0

def test_cohort_matrix_triangle(spark):
    import datetime as dt

    from uk_housing_dashboard_etl_spark.operators.funnel import cohort_matrix

    mon = dt.datetime(2024, 1, 1)  # a Monday
    wk = dt.timedelta(days=7)
    rows = [
        # cohort week 0: users 1,2 start; user 1 returns weeks 1 and 2,
        # user 2 returns week 2 only
        (1, mon), (2, mon),
        (1, mon + wk), (1, mon + 2 * wk), (2, mon + 2 * wk),
        # cohort week 1: user 3 only, never returns
        (3, mon + wk),
    ]
    df = spark.createDataFrame(
        [(i, u, t, "click", 1.0) for i, (u, t) in enumerate(rows)],
        ["event_id", "user_id", "ts", "event_type", "value"],
    )
    out = cohort_matrix(df).toPandas()
    c0 = out[out.cohort_week == mon].set_index("week_offset")
    assert c0.loc[0, "cohort_size"] == 2 and c0.loc[0, "retention"] == 1.0
    assert c0.loc[1, "active_users"] == 1 and c0.loc[1, "retention"] == 0.5
    assert c0.loc[2, "active_users"] == 2 and c0.loc[2, "retention"] == 1.0
    c1 = out[out.cohort_week == mon + wk].set_index("week_offset")
    assert c1.loc[0, "cohort_size"] == 1 and len(c1) == 1


def test_funnel_timing_hand_computed(spark):
    import datetime as dt

    from uk_housing_dashboard_etl_spark.operators.funnel import funnel_timing

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: signup -> view after 2 min -> click after 3 more
        (1, t0, 1, "view2", 0.0),  # wrong-type noise
        (2, t0, 1, "signup", 0.0),
        (3, t0 + 2 * m, 1, "view", 0.0),
        (4, t0 + 5 * m, 1, "click", 0.0),
        # user 2: signup -> view after 4 min, never clicks
        (5, t0, 2, "signup", 0.0),
        (6, t0 + 4 * m, 2, "view", 0.0),
        # user 3: view BEFORE signup must not count (strict order)
        (7, t0, 3, "view", 0.0),
        (8, t0 + m, 3, "signup", 0.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = funnel_timing(
        df, ["signup", "view", "click", "purchase"]
    ).toPandas().set_index("stage_from")
    # stage 1->2: users 1 (120 s) and 2 (240 s): median 180
    assert out.loc[1, "n_users"] == 2 and out.loc[1, "median_s"] == 180.0
    # stage 2->3: only user 1 (180 s)
    assert out.loc[2, "n_users"] == 1 and out.loc[2, "median_s"] == 180.0
    assert 3 not in out.index  # nobody purchased
