"""attribution + rfm_segments (operators/timeseries.py) on hand events."""

import pytest
from pyspark.sql import functions as F

from influxdb_ha_spark.operators.timeseries import attribution, rfm_segments

DAY = 86_400_000_000_000


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, time long, value double, "
              "event_id long")


def test_attribution_last_touch_and_window(spark):
    ev = _ev(spark, [
        # u1: view@1d, click@2d, purchase@3d -> last touch = click
        (1, "view", 1 * DAY, None, 1),
        (1, "click", 2 * DAY, None, 2),
        (1, "purchase", 3 * DAY, 10.0, 3),
        # u2: view@0, purchase@20d -> view outside 7d window -> (none)
        (2, "view", 0, None, 4),
        (2, "purchase", 20 * DAY, 5.0, 5),
        # u3: purchase with no touches at all -> (none)
        (3, "purchase", 1 * DAY, 2.5, 6),
    ])
    got = {r.channel: (r.conversions, r.revenue)
           for r in attribution(ev, window_ns=7 * DAY).collect()}
    assert got == {"click": (1, 10.0), "(none)": (2, 7.5)}


def test_attribution_same_timestamp_touch_counts(spark):
    # touch at exactly the conversion time attributes (<= semantics);
    # among same-timestamp touches the max event_id wins (pinned order)
    ev = _ev(spark, [
        (1, "view", 5 * DAY, None, 1),
        (1, "click", 5 * DAY, None, 2),
        (1, "purchase", 5 * DAY, 1.0, 3),
    ])
    got = attribution(ev, window_ns=7 * DAY).collect()
    assert len(got) == 1 and got[0].channel == "click"


def test_attribution_first_touch_model(spark):
    ev = _ev(spark, [
        (1, "view", 1 * DAY, None, 1),
        (1, "click", 2 * DAY, None, 2),
        (1, "purchase", 3 * DAY, 4.0, 3),
    ])
    got = attribution(ev, model="first").collect()
    assert len(got) == 1 and got[0].channel == "view"
    with pytest.raises(ValueError):
        attribution(ev, model="linear")


def test_attribution_null_time_rows_excluded(spark):
    ev = _ev(spark, [
        (1, "view", None, None, 1),
        (1, "purchase", 1 * DAY, 3.0, 2),
    ])
    got = attribution(ev).collect()
    assert len(got) == 1 and got[0].channel == "(none)"


def test_rfm_scores_and_totals(spark):
    now = 100 * DAY
    rows = []
    # 8 users with strictly increasing frequency/monetary and
    # decreasing recency: user i makes i+1 purchases of 10.0 each,
    # the last at day 10*i (so higher i = fresher = higher r_score)
    for i in range(8):
        for j in range(i + 1):
            rows.append((i, "purchase", (10 * i - j) * DAY, 10.0,
                         100 * i + j))
    ev = _ev(spark, rows)
    cells = rfm_segments(ev, now_ns=now).collect()
    assert sum(c.n_entities for c in cells) == 8
    assert all(1 <= c.r_score <= 4 and 1 <= c.f_score <= 4
               and 1 <= c.m_score <= 4 for c in cells)
    # total revenue = sum of all purchases
    assert sum(c.revenue for c in cells) == pytest.approx(
        sum(10.0 * (i + 1) for i in range(8)))
    # freshest+heaviest user (i=7) sits in the best cell, the earliest
    # single-purchase user (i=0) in the worst
    keys = {(c.r_score, c.f_score, c.m_score) for c in cells}
    assert (4, 4, 4) in keys and (1, 1, 1) in keys


def test_rfm_requires_now(spark):
    ev = _ev(spark, [(1, "purchase", DAY, 1.0, 1)])
    with pytest.raises(ValueError):
        rfm_segments(ev)


def test_rfm_monetary_ties_share_cell(spark):
    # identical users land in identical cells (deterministic ties)
    now = 10 * DAY
    ev = _ev(spark, [(i, "purchase", 5 * DAY, 7.0, i) for i in range(4)])
    cells = rfm_segments(ev, now_ns=now).collect()
    assert len(cells) == 1 and cells[0].n_entities == 4
