"""Cho & Garcia-Molina recrawl estimator (operators/freshness.py)."""

from __future__ import annotations

import datetime as dt
import math

from thuvienphapluat_crawler_spark.operators.freshness import (
    MICROS_PER_DAY,
    change_history,
    freshness_schedule,
)

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    # rows: (page_id, day_offset, token)
    return spark.createDataFrame(
        [(p, T0 + dt.timedelta(days=d), t) for p, d, t in rows],
        "page_id long, ts timestamp, content_token long",
    )


def test_change_history_counts_transitions_not_values(spark):
    ev = _events(spark, [(1, 0, 7), (1, 1, 7), (1, 2, 9), (1, 3, 9), (1, 4, 7)])
    h = change_history(ev).collect()[0]
    assert (h.n_obs, h.n_changes) == (5, 2)  # 7->9 and 9->7
    assert h.last_us - h.first_us == 4 * MICROS_PER_DAY


def test_lambda_corrects_for_missed_changes(spark):
    # page A: changed 1 of 4 daily intervals; page B: changed 3 of 4 —
    # the estimator is SUPER-linear in the observed ratio (-ln(1-r)),
    # because frequent change implies unobserved flips between visits
    ev = _events(
        spark,
        [(1, d, [0, 0, 1, 1, 1][d]) for d in range(5)]
        + [(2, d, [0, 1, 0, 1, 0][d]) for d in range(5)],
    )
    out = {r.page_id: r for r in freshness_schedule(change_history(ev)).collect()}
    lam_a, lam_b = out[1].lambda_per_day, out[2].lambda_per_day
    assert lam_a == round(-math.log(1 - 0.25), 6)
    # B hits the X == n singularity? no: 4 of 4 changed -> continuity corr.
    assert lam_b == round(-math.log(1 - 3.5 / 4), 6)
    assert lam_b / lam_a > 3 / 1  # super-linear vs the raw 3x ratio
    assert out[2].priority == 1 and out[1].priority == 2


def test_all_changed_uses_continuity_correction(spark):
    ev = _events(spark, [(1, d, d) for d in range(3)])  # every visit new
    r = freshness_schedule(change_history(ev)).collect()[0]
    assert r.n_changes == r.n_intervals == 2
    assert r.lambda_per_day == round(-math.log(1 - 1.5 / 2), 6)  # finite


def test_single_observation_ranks_last(spark):
    ev = _events(spark, [(1, 0, 0), (2, 0, 0), (2, 1, 1), (3, 0, 0), (3, 1, 0)])
    out = {r.page_id: r for r in freshness_schedule(change_history(ev)).collect()}
    assert out[1].lambda_per_day is None and out[1].priority == 3
    assert out[2].priority == 1  # changed every interval
    assert out[3].lambda_per_day == 0.0  # visited twice, never changed


def test_change_bp_integer_division(spark):
    ev = _events(spark, [(1, d, [0, 1, 0, 0][d]) for d in range(4)])
    r = freshness_schedule(change_history(ev)).collect()[0]
    assert r.change_bp == (2 * 10000) // 3  # 6666, truncated not rounded
