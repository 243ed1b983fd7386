"""processor_tda: topological-data-analysis anomaly signals on metric
windows (ripser-equivalent Betti numbers).

Reference semantics (plugins/processor_tda/tda.c:767-1182 +
src/ripser/flb_ripser_wrapper.cpp:59-171):
- keep a ring buffer of the last ``window_size`` samples, each a
  ``feature_dim``-vector of collapsed metric values;
- time-delay embed: point p = (x[t], x[t-tau], ..., x[t-(m-1)tau]) giving
  ``n_embed = n_raw - (m-1)*tau`` points of dimension feature_dim*m
  (tda.c:853-880); m==1 disables embedding;
- dense Euclidean distance matrix over the embedded points (tda.c:887-925);
- run ripser at 9 candidate thresholds — the 0.10..0.90 quantiles of the
  off-diagonal distances (tda.c:808-810, tda_choose_threshold_from_dist);
  a user ``threshold`` in (0,1) overrides every candidate quantile;
- a "Betti number" is the count of FINITE persistence bars with
  persistence >= 1e-3 in the threshold-truncated Vietoris-Rips filtration
  (flb_ripser_wrapper.cpp:73-105: non-finite death and death<=birth bars
  are skipped, MIN_PERSIST=1e-3) — essential classes are NOT counted;
- across the sweep keep the max b1 (loops, the primary signal) and the
  smallest quantile achieving it; if every b1 is 0, fall back to max b0
  (tda.c:948-995); emit gauges tda_betti0/1/2.

Why one reduction instead of nine ripser runs: a finite bar (birth, death)
exists in the truncation at threshold t iff death <= t, so the count at
every candidate threshold is a prefix count over ONE persistence
computation done at the largest candidate — identical output, 9x less
work. b0 bars are the single-linkage merge distances (MST edge weights,
computed by Kruskal/union-find); b1 bars come from the standard GF(2)
boundary-matrix reduction with triangle columns keyed by their max edge
(exact, the same pairing ripser produces). Dimension-2 bars need
tetrahedron columns — O(n^4) columns; implemented behind a size gate
(``max_dim=2`` allowed for n_embed <= 32) and 0 otherwise, a documented
bound, not an approximation (the reference calls ripser with max_dim=2).

Scale shape: one shuffle on (series, window-id); every window is then an
independent ~window_size-point problem inside applyInPandas — at 100 TB
the parallelism is the number of series x windows, with no cross-window
or cross-series state.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Q_CANDIDATES = (0.10, 0.20, 0.30, 0.40, 0.50, 0.60, 0.70, 0.80, 0.90)
MIN_PERSIST = 1e-3


# --------------------------------------------------------------------------
# persistent homology core (exact, GF(2))
# --------------------------------------------------------------------------
def _quantile_threshold(tri: np.ndarray, q: float) -> float:
    """tda_choose_threshold_from_dist: sort the off-diagonal distances and
    index k = round((len-1) * q) (C: pos = q * (k - 1), idx = lround)."""
    if tri.size == 0:
        return 0.0
    vals = np.sort(tri)
    idx = int(round(q * (len(vals) - 1)))
    return float(vals[min(max(idx, 0), len(vals) - 1)])


def vr_finite_bars(dist: np.ndarray, threshold: float, max_dim: int = 1) -> dict[int, list[tuple[float, float]]]:
    """Finite persistence bars of the Vietoris-Rips filtration of a dense
    distance matrix, truncated at ``threshold`` (simplices of diameter
    <= threshold). Returns {dim: [(birth, death), ...]}; essential
    (infinite) classes are omitted — matching the wrapper's counting."""
    n = dist.shape[0]
    bars: dict[int, list[tuple[float, float]]] = {0: [], 1: [], 2: []}
    if n < 2:
        return bars

    iu, ju = np.triu_indices(n, 1)
    w = dist[iu, ju]
    keep = w <= threshold
    edges = sorted(zip(w[keep], iu[keep], ju[keep]))  # filtration order

    # --- dim 0: Kruskal; each union event is a bar (0, weight) ---
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst_edges: set[tuple[int, int]] = set()
    for ew, i, j in edges:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj
            bars[0].append((0.0, float(ew)))
            mst_edges.add((i, j))
    if max_dim < 1:
        return bars

    # --- dim 1: reduce triangle columns over the edge basis ---
    # edge order index = filtration position; columns processed in
    # triangle filtration order; pivot = highest-order edge in the column
    eidx = {(i, j): k for k, (ew, i, j) in enumerate(edges)}
    ew_of = [ew for ew, _, _ in edges]
    adj = dist <= threshold
    tris = []
    for ew, i, j in edges:
        # triangles whose max edge is (i,j): third vertex adjacent to both
        # with both other edges no later in the filtration
        ks = np.nonzero(adj[i] & adj[j])[0]
        e_ij = eidx[(i, j)]
        for k in ks:
            if k == i or k == j:
                continue
            e1 = eidx[(min(i, k), max(i, k))]
            e2 = eidx[(min(j, k), max(j, k))]
            if e1 < e_ij and e2 < e_ij:
                tris.append((e_ij, e1, e2))
    tris.sort()  # by max-edge filtration position = triangle filtration order

    pivots: dict[int, int] = {}  # low edge -> column bitmask
    for e_ij, e1, e2 in tris:
        col = (1 << e_ij) | (1 << e1) | (1 << e2)
        diam = ew_of[e_ij]
        while col:
            low = col.bit_length() - 1
            if low not in pivots:
                pivots[low] = col
                birth = ew_of[low]
                if diam > birth:
                    bars[1].append((float(birth), float(diam)))
                break
            col ^= pivots[low]
    if max_dim < 2 or n > 32:
        return bars

    # --- dim 2: tetrahedron columns over the triangle basis (size-gated) ---
    # Reducing each boundary matrix independently is the standard ELZ
    # algorithm: pivot triangles of this reduction are automatically the
    # positive (cycle-creating) triangles, so no clearing pass is needed
    # for correctness.
    tri_key = {}
    tri_list = []
    for t, (e_ij, e1, e2) in enumerate(tris):
        tri_key[frozenset((e_ij, e1, e2))] = t
        tri_list.append((e_ij, e1, e2))

    def tkey(a: int, b: int, c: int) -> int:
        ea = eidx[(min(a, b), max(a, b))]
        eb = eidx[(min(a, c), max(a, c))]
        ec = eidx[(min(b, c), max(b, c))]
        return tri_key[frozenset((ea, eb, ec))]

    tets = []
    verts_adj = [np.nonzero(adj[v])[0] for v in range(n)]
    for a in range(n):
        for b in verts_adj[a]:
            if b <= a:
                continue
            for c in verts_adj[b]:
                if c <= b or not adj[a][c]:
                    continue
                for d in verts_adj[c]:
                    if d <= c or not (adj[a][d] and adj[b][d]):
                        continue
                    faces = (tkey(a, b, c), tkey(a, b, d), tkey(a, c, d), tkey(b, c, d))
                    diam = max(
                        dist[a][b], dist[a][c], dist[a][d], dist[b][c], dist[b][d], dist[c][d]
                    )
                    tets.append((float(diam), max(faces), faces))
    tets.sort(key=lambda t: (t[0], t[1]))
    tri_diam = [ew_of[t[0]] for t in tri_list]
    pivots2: dict[int, int] = {}
    for diam, _, faces in tets:
        col = 0
        for f in faces:
            col ^= 1 << f
        while col:
            low = col.bit_length() - 1
            if low not in pivots2:
                pivots2[low] = col
                birth = tri_diam[low]
                if diam > birth:
                    bars[2].append((float(birth), float(diam)))
                break
            col ^= pivots2[low]
    return bars


def betti_counts(bars: dict[int, list[tuple[float, float]]], threshold: float) -> tuple[int, int, int]:
    """Wrapper counting rule: finite bars with death <= threshold and
    persistence >= MIN_PERSIST (flb_ripser_wrapper.cpp:92-105)."""
    out = []
    for d in (0, 1, 2):
        out.append(
            sum(1 for b, dth in bars.get(d, []) if dth <= threshold and dth - b >= MIN_PERSIST)
        )
    return tuple(out)  # type: ignore[return-value]


def tda_window_betti(
    samples: np.ndarray,
    embed_dim: int = 1,
    embed_delay: int = 1,
    threshold: float | None = None,
    max_dim: int = 1,
) -> dict | None:
    """One window -> the gauge values the processor would emit.

    ``samples``: (n_raw, feature_dim) float array in time order. Returns
    {betti0, betti1, betti2, best_q, threshold} or None when the window is
    too short for the embedding (tda.c:866-871 early return)."""
    m = max(int(embed_dim), 1)
    tau = max(int(embed_delay), 1) if m > 1 else 1
    n_raw = len(samples)
    if n_raw < 2 or n_raw < (m - 1) * tau + 1:
        return None
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    # delay embedding: point p stacks lags 0..m-1 (tda.c:887-925)
    base = (m - 1) * tau
    emb = np.hstack([x[base - lag * tau : n_raw - lag * tau] for lag in range(m)])
    n_embed = len(emb)
    if n_embed < 2:
        return None
    diff = emb[:, None, :] - emb[None, :, :]
    dist = np.sqrt((diff * diff).sum(axis=2))
    iu, ju = np.triu_indices(n_embed, 1)
    tri = dist[iu, ju]

    user_q = threshold if threshold is not None and 0.0 < threshold < 1.0 else None
    cand_qs = [user_q] * len(Q_CANDIDATES) if user_q else list(Q_CANDIDATES)
    thrs = [_quantile_threshold(tri, q) for q in cand_qs]
    bars = vr_finite_bars(dist, max(thrs), max_dim=max_dim)

    best_b0 = best_b1 = best_b2 = 0
    best_q = 0.0
    for qc, thr in zip(cand_qs, thrs):
        b0, b1, b2 = betti_counts(bars, thr)
        if b1 > best_b1:
            best_b1, best_b0, best_b2, best_q = b1, b0, b2, qc
        elif best_b1 == 0 and b0 > best_b0:
            best_b0, best_b2, best_q = b0, b2, qc
    return {
        "betti0": best_b0,
        "betti1": best_b1,
        "betti2": best_b2,
        "best_q": float(best_q),
        "threshold": float(_quantile_threshold(tri, best_q)) if best_q else float(thrs[-1]),
        "n_embed": n_embed,
    }


# --------------------------------------------------------------------------
# DataFrame operator
# --------------------------------------------------------------------------
def tda_betti(
    df: DataFrame,
    value_cols: list[str],
    series_col: str,
    ts_col: str = "ts",
    window_size: int = 32,
    embed_dim: int = 1,
    embed_delay: int = 1,
    threshold: float | None = None,
    max_dim: int = 1,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Batch analog of the processor: per series, consecutive
    ``window_size``-sample windows -> one Betti gauge row each.
    ``tiebreak`` columns make window assignment deterministic when
    timestamps collide within a series.

    The row_number window is partitioned by series (never global), so the
    shuffle key is (series, window-id) and each window's O(n^3) topology
    work runs independently inside applyInPandas — the 100 TB shape is
    millions of small independent problems, no cross-window state."""
    order = [ts_col, *(tiebreak or [])]
    seq = F.row_number().over(Window.partitionBy(series_col).orderBy(*order)) - 1
    extra = [c for c in (tiebreak or []) if c not in value_cols]
    win = (
        df.select(series_col, ts_col, *extra, *value_cols)
        .withColumn("__win", (seq / window_size).cast("long"))
    )

    out_schema = (
        f"{series_col} string, window_id long, window_start timestamp, n_raw int, "
        "n_embed int, betti0 int, betti1 int, betti2 int, best_q double, threshold double"
    )

    def run(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values(order)
        res = tda_window_betti(
            pdf[value_cols].to_numpy(dtype=float),
            embed_dim=embed_dim,
            embed_delay=embed_delay,
            threshold=threshold,
            max_dim=max_dim,
        )
        if res is None:
            return pd.DataFrame(
                columns=[
                    series_col, "window_id", "window_start", "n_raw", "n_embed",
                    "betti0", "betti1", "betti2", "best_q", "threshold",
                ]
            )
        return pd.DataFrame(
            [
                {
                    series_col: key[0],
                    "window_id": int(key[1]),
                    "window_start": pdf[ts_col].iloc[0],
                    "n_raw": len(pdf),
                    "n_embed": res["n_embed"],
                    "betti0": res["betti0"],
                    "betti1": res["betti1"],
                    "betti2": res["betti2"],
                    "best_q": res["best_q"],
                    "threshold": res["threshold"],
                }
            ]
        )

    return win.groupBy(series_col, "__win").applyInPandas(run, out_schema)
