"""Distributed order statistics: exact per-group discrete quantiles.

``group_quantiles`` computes exact ``percentile_disc`` values per group
over a discrete/bounded-cardinality column (lengths, token counts,
scores rounded to fixed precision — the shape of every corpus-stats
column) without ever sorting the corpus: a map-side (group, value)
count combiner collapses rows to the value histogram, one bucket
shuffle co-locates each group's histogram, and a vectorized
cumsum+searchsorted per group picks the order statistics. The shuffle
moves one row per (batch, group, distinct value) — the counting-sort
shape, not the corpus.

For genuinely continuous high-cardinality columns,
``group_quantiles_sketch`` closes the documented r4 seam: a fixed-grid
histogram sketch with the SAME combiner/reduce shape (the grid plays
the t-digest's role with a deterministic, SQL-replayable rule — error
bounded by the bin width, shuffle bounded by bins×groups).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..shuffle import bucket_tag

__all__ = [
    "group_quantiles", "group_quantiles_sketch", "group_topk",
    "zscore_standardize", "pearson_corr",
]


def group_quantiles(
    ds: "ray.data.Dataset",
    key: str,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """→ Dataset (key, q_pct:int64, value) — exact ``percentile_disc``
    per group: the value at 1-based rank ``ceil(q·n)`` of the group's
    sorted multiset (SQL ``quantile_disc`` / ``percentile_disc``
    semantics; null values are excluded). ``q_pct`` is the percentile
    as an integer (0.25 → 25) so the output hashes stably."""
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in (0, 1]: {qs}")
    q_list = sorted(qs)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df[[key, col]]
            .dropna()
            .groupby([key, col], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, key, num_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per group inside the bucket
        hist = g.groupby([key, col], as_index=False)["n"].sum()
        out_rows = []
        for k, grp in hist.groupby(key, sort=False):
            grp = grp.sort_values(col)
            counts = grp["n"].to_numpy()
            values = grp[col].to_numpy()
            cum = np.cumsum(counts)
            n = int(cum[-1])
            ranks = np.array([math.ceil(q * n) for q in q_list])
            idx = np.searchsorted(cum, ranks, side="left")
            out_rows.append(
                pd.DataFrame(
                    {
                        key: k,
                        "q_pct": (np.asarray(q_list) * 100).round()
                        .astype(np.int64),
                        "value": values[idx],
                    }
                )
            )
        if not out_rows:
            return pd.DataFrame({key: [], "q_pct": [], "value": []})
        return pd.concat(out_rows, ignore_index=True)

    return (
        ds.map_batches(combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def group_quantiles_sketch(
    ds: "ray.data.Dataset",
    key: str,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    num_bins: int = 4096,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """→ Dataset (key, q_pct:int64, value:float64) — approximate
    per-group quantiles of a CONTINUOUS column via a fixed-grid
    histogram sketch (r4 verdict item #7).

    One streaming moments pass finds the global [lo, hi] (two driver
    scalars); values bin to ``floor((x − lo)/width)`` clipped to the
    last bin; the (key, bin) count combiner + bucket shuffle + per-group
    cumsum/searchsorted are EXACTLY ``group_quantiles``' shape, but the
    shuffle is bounded by bins×groups regardless of value cardinality.
    The reported value is the selected bin's midpoint, FLOOR-truncated
    at 1e-6 — error ≤ width/2 = (hi−lo)/(2·num_bins). Every step is a
    deterministic double-precision rule a SQL oracle replays verbatim
    (no rank interpolation, no data-dependent centroids — the reason a
    fixed grid beats a t-digest for the correctness contract; the
    combiner/reduce shape is the same one a t-digest would use)."""
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in (0, 1]: {qs}")
    if num_bins < 2:
        raise ValueError(f"num_bins must be ≥ 2: {num_bins}")
    q_list = sorted(qs)

    def extremes(df: pd.DataFrame) -> pd.DataFrame:
        x = df[col].dropna().to_numpy(dtype=np.float64)
        if not len(x):
            return pd.DataFrame({"lo": [], "hi": []})
        return pd.DataFrame({"lo": [x.min()], "hi": [x.max()]})

    m = ds.map_batches(extremes, batch_format="pandas").to_pandas()
    if "lo" not in m.columns or m.empty:
        raise ValueError(f"group_quantiles_sketch: no rows in {col!r}")
    lo = float(m["lo"].min())
    hi = float(m["hi"].max())
    width = (hi - lo) / num_bins  # exact doubles on both engine + SQL

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, col]].dropna()
        x = d[col].to_numpy(dtype=np.float64)
        if width > 0:
            bins = np.minimum(
                np.floor((x - lo) / width), num_bins - 1
            ).astype(np.int64)
        else:  # constant column: one bin
            bins = np.zeros(len(x), dtype=np.int64)
        g = (
            pd.DataFrame({key: d[key].to_numpy(), "bin": bins})
            .groupby([key, "bin"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, key, num_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        hist = g.groupby([key, "bin"], as_index=False)["n"].sum()
        out_rows = []
        for k, grp in hist.groupby(key, sort=False):
            grp = grp.sort_values("bin")
            cum = np.cumsum(grp["n"].to_numpy())
            n = int(cum[-1])
            ranks = np.array([math.ceil(q * n) for q in q_list])
            idx = np.searchsorted(cum, ranks, side="left")
            sel = grp["bin"].to_numpy()[idx].astype(np.float64)
            vals = lo + (sel + 0.5) * width if width > 0 else (
                np.full(len(sel), lo)
            )
            out_rows.append(
                pd.DataFrame(
                    {
                        key: k,
                        "q_pct": (np.asarray(q_list) * 100).round()
                        .astype(np.int64),
                        "value": np.floor(vals * 1e6) / 1e6,
                    }
                )
            )
        if not out_rows:
            return pd.DataFrame({key: [], "q_pct": [], "value": []})
        return pd.concat(out_rows, ignore_index=True)

    return (
        ds.map_batches(combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def group_topk(
    ds: "ray.data.Dataset",
    key: str,
    score_col: str,
    k: int,
    id_col: str,
    descending: bool = True,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Top-k rows per group by ``score_col`` (ties by ``id_col``
    ascending — a total order, so the result set is deterministic and
    SQL-replayable as ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY
    score [DESC], id) <= k``). The "best k docs per source/domain"
    primitive.

    Scale shape: a map-side combiner keeps k rows per (batch, group),
    so the shuffle moves ≤ k rows per batch per group; one group-bucket
    reduce finishes. Same pattern as curation.per_source_quota but
    ranked by a SCORE, not a hash."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1: {k}")
    asc = [not descending, True]

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values([score_col, id_col], ascending=asc,
                           kind="stable")
            .groupby(key, as_index=False, sort=False)
            .head(k)
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = head_k(df)
        return out.assign(_bucket=bucket_tag(out, key, num_buckets))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return head_k(g).drop(columns=["_bucket"])

    return (
        ds.map_batches(combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def zscore_standardize(
    ds: "ray.data.Dataset",
    col: str,
    out_col: str | None = None,
    ddof: int = 0,
) -> "ray.data.Dataset":
    """Append ``(col − μ) / σ`` (population σ by default — SQL
    ``STDDEV_POP``) as ``out_col``, FLOOR-truncated at 1e-6. The
    signal-standardization step before combining heterogeneous quality
    scores; constant columns (σ = 0) raise rather than emit ±inf.

    μ/σ come from one pass of per-batch (n, Σx, Σx²) partials — three
    scalars on the driver — then the transform is map-side."""
    out_col = out_col or f"{col}_z"

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df[col].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {"n": [np.int64(len(x))], "s": [x.sum()], "ss": [(x * x).sum()]}
        )

    m = ds.map_batches(moments, batch_format="pandas").to_pandas()
    # all-empty input never runs the UDF → frame keeps the input schema
    # (no 'n' column); guard BEFORE indexing (mirrors pearson_corr)
    if "n" not in m.columns or float(m["n"].sum()) == 0:
        raise ValueError(f"zscore_standardize: no rows in {col!r}")
    n = float(m["n"].sum())
    mean = float(m["s"].sum()) / n
    var = float(m["ss"].sum()) / n - mean * mean
    if ddof:
        var = var * n / (n - ddof)
    if var <= 0:
        raise ValueError(
            f"zscore_standardize: column {col!r} is constant (σ=0)"
        )
    sd = math.sqrt(var)

    def transform(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        z = (df[col].to_numpy(dtype=np.float64) - mean) / sd
        df[out_col] = np.floor(z * 1e6) / 1e6
        return df

    return ds.map_batches(transform, batch_format="pandas")


def pearson_corr(
    ds: "ray.data.Dataset",
    x_col: str,
    y_col: str,
) -> float:
    """Pearson correlation of two numeric columns in ONE streaming pass
    of (n, Σx, Σy, Σx², Σy², Σxy) partials — six driver scalars. The
    moment formula is replayed verbatim by the SQL oracle (DuckDB's
    CORR uses the same algebra), FLOOR-truncated at 1e-6 by callers
    that need cross-engine equality. Constant columns raise."""

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(dtype=np.float64)
        y = df[y_col].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "n": [np.int64(len(x))],
                "sx": [x.sum()], "sy": [y.sum()],
                "sxx": [(x * x).sum()], "syy": [(y * y).sum()],
                "sxy": [(x * y).sum()],
            }
        )

    m = ds.map_batches(moments, batch_format="pandas").to_pandas()
    # an all-empty input never runs the UDF → the frame keeps the input
    # schema (no 'n' column); guard BEFORE indexing
    if "n" not in m.columns or float(m["n"].sum()) == 0:
        raise ValueError("pearson_corr: no rows")
    m = m.sum()
    n = float(m["n"])
    cov = m["sxy"] / n - (m["sx"] / n) * (m["sy"] / n)
    vx = m["sxx"] / n - (m["sx"] / n) ** 2
    vy = m["syy"] / n - (m["sy"] / n) ** 2
    if vx <= 0 or vy <= 0:
        raise ValueError("pearson_corr: a column is constant")
    return float(cov / math.sqrt(vx * vy))
