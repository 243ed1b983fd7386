"""Port of tests/internal/include/sp_window.h.

The reference windows are processing-time (all 11 fixture records land in
one flush); our engine windows on event time (SURVEY §2.9 maps this as the
deterministic default). The fixture spaces records 1 s apart, so a window
wide enough to hold all of them reproduces the single-flush goldens, and
narrower windows exercise the event-time split.
"""

import pytest


def test_window_sum_avg_single_window(sp):
    # "SELECT SUM(id), AVG(id) ... WINDOW TUMBLING (5 SECOND) WHERE word3
    # IS NOT NULL" -> 1 record, over the 10 rows with word3 not-explicit-null
    rows = sp.sql(
        "SELECT SUM(id) AS s, AVG(id) AS a FROM STREAM:FLB "
        "WINDOW TUMBLING (60 SECOND) WHERE word3 IS NOT NULL;"
    ).collect()
    assert len(rows) == 1
    assert rows[0].s == pytest.approx(45.0)  # ids 0..9
    assert rows[0].a == pytest.approx(4.5)


def test_window_tumbling_splits_on_event_time(sp):
    rows = sp.sql(
        "SELECT COUNT(*) AS c FROM STREAM:FLB WINDOW TUMBLING (5 SECOND);"
    ).collect()
    assert sum(r.c for r in rows) == 11
    assert len(rows) == 3  # 11 records, 1s apart -> 3 five-second buckets


def test_window_hopping(sp):
    rows = sp.sql(
        "SELECT COUNT(*) AS c FROM STREAM:FLB "
        "WINDOW HOPPING (4 SECOND, ADVANCE BY 2 SECOND);"
    ).collect()
    # each record multi-assigned to size/advance = 2 windows
    assert sum(r.c for r in rows) == 22


def test_forecast_tumbling(sp):
    # usage = 10..110 at 1 s spacing -> slope 10/s; predict at max_x + 20
    # = 110 + 10*20 = 310 (cb_forecast_tumbling_window golden)
    rows = sp.sql(
        "SELECT AVG(usage) AS a, TIMESERIES_FORECAST(usage, 20) AS fc "
        "FROM STREAM:FLB WINDOW TUMBLING (60 SECOND);"
    ).collect()
    assert len(rows) == 1
    assert rows[0].fc == pytest.approx(310.0)
    assert rows[0].a == pytest.approx(60.0)


def test_windowed_output_carries_bounds(sp):
    df = sp.sql("SELECT COUNT(*) AS c FROM STREAM:FLB WINDOW TUMBLING (5 SECOND);")
    assert df.columns[:2] == ["window_start", "window_end"]


def test_forecast_hopping(sp):
    # sp_window.h check 5: forecast inside each hopping window; with the
    # whole fixture in one wide hop the slope matches the tumbling golden
    rows = sp.sql(
        "SELECT TIMESERIES_FORECAST(usage, 20) AS fc FROM STREAM:FLB "
        "WINDOW HOPPING (60 SECOND, ADVANCE BY 30 SECOND);"
    ).collect()
    assert any(abs(r.fc - 310.0) < 1e-6 for r in rows if r.fc is not None)


def test_tumbling_groupby_aggregates(sp):
    # sp_window.h check 2: aggregates + GROUP BY inside a window
    rows = sp.sql(
        "SELECT bool, MIN(id) AS mn, MAX(id) AS mx, COUNT(*) AS c "
        "FROM STREAM:FLB WINDOW TUMBLING (60 SECOND) "
        "WHERE word3 IS NOT NULL GROUP BY bool;"
    ).collect()
    got = {str(r["bool"]): (r.mn, r.mx, r.c) for r in rows}
    assert got["true"][2] + got["false"][2] == 10
