"""processor_tda tests: the per-dimension reduction in extensions/tda.py is
checked against an independent naive implementation — one single boundary
matrix over the FULL interleaved filtration (vertices, edges, triangles,
tets in diameter order), the textbook ELZ algorithm. The persistence
diagram of a Vietoris-Rips filtration is unique (independent of simplexwise
tie-breaking), so the two implementations must produce identical multisets
of positive-persistence bars.

Reference semantics under test: plugins/processor_tda/tda.c:767-1182 and
src/ripser/flb_ripser_wrapper.cpp:59-171 (finite bars only, persistence >=
1e-3, quantile threshold sweep preferring max Betti-1).
"""

import itertools

import numpy as np
import pytest

from fluent_bit_spark.extensions.tda import (
    betti_counts,
    tda_betti,
    tda_window_betti,
    vr_finite_bars,
)


# --------------------------------------------------------------------------
# independent oracle: single-matrix reduction over the interleaved filtration
# --------------------------------------------------------------------------
def naive_vr_bars(dist, threshold, max_dim=1):
    """Full-boundary-matrix ELZ reduction. Returns {dim: multiset of
    (birth, death)} for finite positive-persistence bars only."""
    n = dist.shape[0]
    simp = [(0.0, (v,)) for v in range(n)]
    for i, j in itertools.combinations(range(n), 2):
        if dist[i, j] <= threshold:
            simp.append((float(dist[i, j]), (i, j)))
    if max_dim >= 1:
        for c in itertools.combinations(range(n), 3):
            d = max(dist[a][b] for a, b in itertools.combinations(c, 2))
            if d <= threshold:
                simp.append((float(d), c))
    if max_dim >= 2:
        for c in itertools.combinations(range(n), 4):
            d = max(dist[a][b] for a, b in itertools.combinations(c, 2))
            if d <= threshold:
                simp.append((float(d), c))
    # faces before cofaces: sort by (diameter, dimension, vertex tuple)
    simp.sort(key=lambda s: (s[0], len(s[1]), s[1]))
    index = {s: k for k, (_, s) in enumerate(simp)}
    diam = [d for d, _ in simp]

    cols = []
    for _, s in simp:
        if len(s) == 1:
            cols.append(0)
        else:
            m = 0
            for f in itertools.combinations(s, len(s) - 1):
                m |= 1 << index[f]
            cols.append(m)

    bars = {0: [], 1: [], 2: []}
    pivot_owner = {}
    for k, col in enumerate(cols):
        while col:
            low = col.bit_length() - 1
            if low not in pivot_owner:
                pivot_owner[low] = col
                birth, death = diam[low], diam[k]
                if death > birth:
                    bars[len(simp[low][1]) - 1].append((birth, death))
                break
            col ^= pivot_owner[low]
    return bars


def assert_same_bars(dist, threshold, max_dim):
    got = vr_finite_bars(dist, threshold, max_dim=max_dim)
    want = naive_vr_bars(dist, threshold, max_dim=max_dim)
    for d in range(max_dim + 1):
        assert sorted(np.round(got[d], 9).tolist()) == sorted(
            np.round(want[d], 9).tolist()
        ), f"dim {d} bars differ"


def _pdist(pts):
    pts = np.asarray(pts, dtype=float)
    diff = pts[:, None, :] - pts[None, :, :]
    return np.sqrt((diff * diff).sum(axis=2))


def test_bars_match_naive_on_random_clouds():
    rng = np.random.default_rng(7)
    for trial in range(12):
        n = int(rng.integers(4, 13))
        pts = rng.normal(size=(n, 2))
        dist = _pdist(pts)
        thr = float(np.quantile(dist[np.triu_indices(n, 1)], 0.7))
        assert_same_bars(dist, thr, max_dim=1)


def test_bars_match_naive_dim2_on_small_clouds():
    rng = np.random.default_rng(11)
    for trial in range(6):
        n = int(rng.integers(5, 9))
        pts = rng.normal(size=(n, 3))
        dist = _pdist(pts)
        thr = float(np.quantile(dist[np.triu_indices(n, 1)], 0.8))
        assert_same_bars(dist, thr, max_dim=2)


def test_circle_has_one_loop():
    """12 points on a circle: exactly one high-persistence H1 bar."""
    t = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    dist = _pdist(np.c_[np.cos(t), np.sin(t)])
    bars = vr_finite_bars(dist, threshold=2.0, max_dim=1)
    big = [(b, d) for b, d in bars[1] if d - b > 0.5]
    assert len(big) == 1
    # the loop is born when adjacent points connect and dies near the
    # diameter when chords triangulate it
    assert big[0][0] == pytest.approx(2 * np.sin(np.pi / 12))


def test_octahedron_has_one_void():
    """Cross-polytope vertices: H2 = one bar born at sqrt(2) (the S^2
    shell), dying at 2 (antipodal edges fill the solid)."""
    pts = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    dist = _pdist(pts)
    bars = vr_finite_bars(dist, threshold=2.0, max_dim=2)
    assert sorted(np.round(bars[2], 9).tolist()) == [
        [pytest.approx(np.sqrt(2)), pytest.approx(2.0)]
    ]
    assert_same_bars(dist, 2.0, max_dim=2)


def test_two_clusters_betti0():
    """Two tight clusters far apart: at a threshold below the gap, exactly
    one within-cluster merge regime — counts via betti_counts prefix rule."""
    rng = np.random.default_rng(3)
    a = rng.normal(0, 0.05, size=(6, 2))
    b = rng.normal(10, 0.05, size=(6, 2)) + np.array([10.0, 0.0])
    dist = _pdist(np.vstack([a, b]))
    bars = vr_finite_bars(dist, threshold=float(dist.max()), max_dim=0)
    # 11 merge events total (12 points -> 1 component); exactly one of them
    # is the cross-cluster bridge with death near the gap distance
    assert len(bars[0]) == 11
    assert sum(1 for _, d in bars[0] if d > 5.0) == 1
    b0_below_gap, _, _ = betti_counts(bars, threshold=5.0)
    assert b0_below_gap == 10  # all within-cluster merges, not the bridge


def test_betti_counts_prefix_equals_per_threshold_runs():
    """The one-reduction sweep (count bars with death <= t) must equal
    running the naive oracle separately at each threshold."""
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(10, 2))
    dist = _pdist(pts)
    tri = dist[np.triu_indices(10, 1)]
    thrs = [float(np.quantile(tri, q)) for q in (0.2, 0.5, 0.8)]
    bars_once = vr_finite_bars(dist, max(thrs), max_dim=1)
    for t in thrs:
        want = naive_vr_bars(dist, t, max_dim=1)
        want_counts = tuple(
            sum(1 for b, d in want[dim] if d - b >= 1e-3) for dim in (0, 1, 2)
        )
        assert betti_counts(bars_once, t) == want_counts


def test_window_betti_sine_embedding_finds_loop():
    """tda.c:853-880 delay embedding: a sine wave embedded at (m=2, tau=4
    ~ quarter period) traces an ellipse -> betti1 >= 1."""
    t = np.arange(32)
    x = np.sin(2 * np.pi * t / 16.0)
    res = tda_window_betti(x[:, None], embed_dim=2, embed_delay=4)
    assert res is not None
    assert res["betti1"] >= 1
    # white noise at the same size should rarely show a persistent loop at
    # the quantile the sine picks; assert the sine's best_q is recorded
    assert 0.0 < res["best_q"] <= 0.9


def test_window_betti_too_short_returns_none():
    assert tda_window_betti(np.zeros((3, 1)), embed_dim=4, embed_delay=2) is None
    assert tda_window_betti(np.zeros((1, 1))) is None


def test_user_threshold_overrides_sweep():
    t = np.arange(32)
    x = np.sin(2 * np.pi * t / 16.0)
    res = tda_window_betti(x[:, None], embed_dim=2, embed_delay=4, threshold=0.35)
    assert res is not None
    assert res["best_q"] in (0.0, 0.35)


def test_tda_betti_operator(spark):
    """Spark operator: per-series windows, sine series shows loops, flat
    series shows none; partial trailing windows still emit rows."""
    import pandas as pd

    n = 96
    ts = pd.date_range("2024-01-01", periods=n, freq="s")
    rows = []
    for i in range(n):
        rows.append(("sine", ts[i].to_pydatetime(), float(np.sin(2 * np.pi * i / 16.0))))
        rows.append(("flat", ts[i].to_pydatetime(), 1.0))
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    out = tda_betti(
        df, ["value"], series_col="series", ts_col="ts",
        window_size=32, embed_dim=2, embed_delay=4,
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r.series, []).append(r)
    assert len(by["sine"]) == 3 and len(by["flat"]) == 3
    assert all(r.betti1 >= 1 for r in by["sine"])
    assert all(r.betti1 == 0 for r in by["flat"])
    assert all(r.n_raw == 32 for r in by["sine"])
