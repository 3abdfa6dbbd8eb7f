"""Sliding-window funnel (ClickHouse windowFunnel semantics)."""

import datetime as dt

from orange3_timeseries_spark.operators.eventstats import window_funnel


def _df(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, base + dt.timedelta(minutes=m), e) for u, m, e in rows],
        "user_id long, ts timestamp, event_type string")


def _levels(spark, rows, window="1 hour"):
    return {r["user_id"]: r["funnel_level"] for r in
            window_funnel(_df(spark, rows), "ts", "event_type",
                          ["user_id"], window=window).collect()}


class TestWindowFunnel:
    def test_full_chain_within_window(self, spark):
        rows = [(1, 0, "view"), (1, 10, "click"), (1, 30, "purchase")]
        assert _levels(spark, rows)[1] == 3

    def test_chain_exceeding_window_caps_level(self, spark):
        # purchase lands 90 min after the anchoring view
        rows = [(1, 0, "view"), (1, 10, "click"), (1, 90, "purchase")]
        assert _levels(spark, rows)[1] == 2

    def test_later_session_converts_where_first_touch_fails(self, spark):
        # first view goes nowhere; a later full chain converts — the
        # first-touch funnel misses this user, windowFunnel must not
        rows = [(1, 0, "view"),
                (1, 300, "view"), (1, 310, "click"),
                (1, 330, "purchase")]
        assert _levels(spark, rows)[1] == 3

    def test_order_matters(self, spark):
        rows = [(1, 0, "click"), (1, 10, "view"), (1, 20, "purchase")]
        # no click AFTER a view -> level 1 only
        assert _levels(spark, rows)[1] == 1

    def test_anchor_restarts_not_slides(self, spark):
        # view@0, click@50, purchase@70: purchase is 70min after the
        # ANCHOR view (beyond 1h) even though it's 20min after click
        rows = [(1, 0, "view"), (1, 50, "click"), (1, 70, "purchase")]
        assert _levels(spark, rows)[1] == 2
        # widen the window and it completes
        assert _levels(spark, rows, window="2 hours")[1] == 3

    def test_best_anchor_chosen(self, spark):
        # two views; the LATER one keeps the purchase inside the window
        rows = [(1, 0, "view"), (1, 45, "view"), (1, 50, "click"),
                (1, 75, "purchase")]
        assert _levels(spark, rows)[1] == 3

    def test_no_steps_level_zero_rows_absent_or_zero(self, spark):
        rows = [(1, 0, "view"), (2, 0, "purchase")]
        lv = _levels(spark, rows)
        assert lv[1] == 1 and lv[2] == 0

    def test_tied_timestamps_are_not_strictly_earlier(self, spark):
        # view and click at the SAME timestamp: the click must not see
        # the tied view — strictness is by TIME VALUE (range frame),
        # deterministic under any physical tie order
        rows = [(1, 0, "view"), (1, 0, "click"), (1, 10, "purchase")]
        assert _levels(spark, rows)[1] == 1
        # one microsecond apart would chain (minutes=10 granularity
        # here, so use a separate row a minute later)
        rows2 = [(1, 0, "view"), (1, 1, "click"), (1, 1, "purchase")]
        # click@1 chains on view@0; purchase tied with click@1 must NOT
        assert _levels(spark, rows2)[1] == 2

    def test_four_step_funnel(self, spark):
        steps = ("signup", "view", "click", "purchase")

        def lv4(rows, window="1 hour"):
            return {r["user_id"]: r["funnel_level"] for r in
                    window_funnel(_df(spark, rows), "ts", "event_type",
                                  ["user_id"], steps=steps,
                                  window=window).collect()}

        full = [(1, 0, "signup"), (1, 5, "view"), (1, 10, "click"),
                (1, 30, "purchase")]
        assert lv4(full)[1] == 4
        # last step lands outside one hour of the anchoring signup
        late = [(1, 0, "signup"), (1, 5, "view"), (1, 10, "click"),
                (1, 90, "purchase")]
        assert lv4(late)[1] == 3
        assert lv4(late, window="2 hours")[1] == 4
        # out-of-order middle step breaks the chain at its depth
        broken = [(1, 0, "signup"), (1, 10, "click"), (1, 20, "view"),
                  (1, 30, "purchase")]
        assert lv4(broken)[1] == 2

    def test_two_step_funnel(self, spark):
        rows = [(1, 0, "view"), (1, 10, "click")]
        out = {r["user_id"]: r["funnel_level"] for r in
               window_funnel(_df(spark, rows), "ts", "event_type",
                             ["user_id"],
                             steps=("view", "click")).collect()}
        assert out[1] == 2
