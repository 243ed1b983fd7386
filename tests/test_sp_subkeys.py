"""Port of tests/internal/include/sp_select_subkeys.h — nested variant
paths with dynamic typing (same path holds a map on one row, a scalar on
another). Goldens from sp_cb_functions.h:210-390.
"""

import pytest

CASES = [
    ("SELECT * FROM STREAM:SUB WHERE map['sub1']['sub2']['color'] = 'blue';", 1),
    ("SELECT * FROM STREAM:SUB WHERE map['sub1']['sub2'] = 123;", 2),
    (
        "SELECT * FROM STREAM:SUB WHERE map['sub1']['sub2']['color'] = 'blue' OR "
        "map['sub1']['sub2']['color'] = 'red' OR map['color'] = 'blue';",
        3,
    ),
    (
        "SELECT * FROM STREAM:SUB WHERE @record.contains(map['sub1']['sub3']) OR "
        "@record.contains(map['color']);",
        5,
    ),
    (
        "SELECT map['sub1']['sub2']['color'] FROM STREAM:SUB WHERE "
        "map['sub1']['sub2']['color'] = 'blue';",
        1,
    ),
]


@pytest.mark.parametrize("sql,expected", CASES, ids=[c[0][:60] for c in CASES])
def test_subkeys_rowcounts(sp, sql, expected):
    assert sp.sql(sql).count() == expected


def test_sum_avg_count_subkeys(sp):
    r = sp.sql(
        "SELECT SUM(map['sub1']['sub2']) AS s, AVG(map['sub1']['sub2']) AS a, "
        "COUNT(map['sub1']['sub2']) AS c "
        "FROM STREAM:SUB WHERE map['sub1']['sub2'] = 123;"
    ).collect()[0]
    assert r.s == pytest.approx(246.0)  # int 123 + string "123"
    assert r.a == pytest.approx(123.0)
    assert r.c == 2


def test_min_max_subkeys(sp):
    r = sp.sql(
        "SELECT MIN(map['sub1']['sub2']) AS mn FROM STREAM:SUB "
        "WHERE map['sub1']['sub2'] > 0;"
    ).collect()[0]
    assert r.mn == pytest.approx(123.0)
    r = sp.sql(
        "SELECT MAX(map['sub1']['sub3']) AS mx FROM STREAM:SUB "
        "WHERE map['sub1']['sub3'] > 0;"
    ).collect()[0]
    assert r.mx == pytest.approx(100.0)


def test_sum_group_by_subkey(sp):
    rows = sp.sql(
        "SELECT SUM(map['sub1']['sub3']) AS s FROM STREAM:SUB GROUP BY map['mtype'];"
    ).collect()
    # reference golden: 3 groups (records missing mtype are skipped),
    # sums 105.5 / 0.5 / 10.5
    assert len(rows) == 3
    assert sorted(r.s for r in rows) == pytest.approx([0.5, 10.5, 105.5])


def test_sum_group_by_two_subkeys(sp):
    rows = sp.sql(
        "SELECT map['sub1']['stype'] AS stype, map['sub1']['sub4'] AS sub4, "
        "SUM(map['sub1']['sub3']) AS s FROM STREAM:SUB "
        "GROUP BY map['sub1']['stype'], map['sub1']['sub4'];"
    ).collect()
    with_vals = {
        (str(r.stype), str(r.sub4)): r.s for r in rows if r.s is not None
    }
    assert with_vals[('"a"', '"circle"')] == pytest.approx(100.0)
    assert with_vals[('"b"', '"rectangle"')] == pytest.approx(11.0)
    assert with_vals[('"a"', '"triangle"')] == pytest.approx(5.5)
