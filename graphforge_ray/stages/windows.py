"""Windowed aggregations over a keyed event stream.

Ray Data is a batch/streaming-batch engine with no event-time watermark
machinery (the reference has none either — SURVEY §2.9); stream-shaped
inputs are treated as an ordered, partitioned log: partition by key with a
``groupby(key)`` shuffle, sort within the group by timestamp, and compute
the windows per group with vectorized pandas (ray_guide "Streaming-shaped
workloads"). Ordering assumption: one group fits a worker (per-user event
counts are bounded); the shuffle key is the entity key, so skew follows
entity activity — salt a pathological hot key upstream if needed.

* ``tumbling_window``  — fixed-size buckets (ts // size)
* ``sliding_window``   — fixed windows every ``slide`` (size > slide →
                         overlapping; an event lands in size/slide windows)
* ``session_window``   — gaps-and-islands: a new session starts when the
                         gap to the previous event exceeds ``gap`` (exactly
                         expressible in SQL with LAG + cumulative SUM —
                         the driver oracle uses that formulation)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

__all__ = ["tumbling_window", "sliding_window", "session_window",
           "trailing_window", "running_window", "lag_window",
           "funnel_counts", "funnel_latency", "retention_cohorts",
           "transition_counts"]

US = 1_000_000


def _ts_us(series: pd.Series) -> np.ndarray:
    return series.astype("datetime64[us]").astype("int64").to_numpy()


def _require_positive(**params: int) -> None:
    bad = {k: v for k, v in params.items() if v <= 0}
    if bad:
        raise ValueError(f"window parameters must be positive: {bad}")


def tumbling_window(
    events: "ray.data.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    size_us: int = 3600 * US,
) -> "ray.data.Dataset":
    """→ (key, window_start_us, n, sum_value) — one row per non-empty
    window. Implemented as a pure groupby on (key, bucket): no per-group
    sort needed for tumbling windows."""
    _require_positive(size_us=size_us)
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    def bucket(batch: "pa.Table") -> "pa.Table":
        # normalize resolution first: pandas-born timestamps are ns,
        # parquet-born are us — cast to timestamp[us] before int64
        us = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
        start = pc.multiply(
            pc.divide(us, pa.scalar(size_us, pa.int64())),
            pa.scalar(size_us, pa.int64()),
        )
        return pa.Table.from_arrays(
            [batch[key], start, batch[value_col]],
            names=[key, "window_start_us", value_col],
        )

    agg = (
        events.map_batches(bucket, batch_format="pyarrow")
        .groupby([key, "window_start_us"])
        .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="sum_value"))
    )
    return agg.map_batches(
        lambda df: df.assign(sum_value=df["sum_value"].round(2)),
        batch_format="pandas",
    )


def sliding_window(
    events: "ray.data.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    size_us: int = 3600 * US,
    slide_us: int = 1800 * US,
) -> "ray.data.Dataset":
    """→ (key, window_start_us, n, sum_value). Each event fans out
    map-side to every window containing it (size/slide rows), then the
    same grouped aggregate as tumbling — no per-group state.

    The fan-out emits ARROW blocks: Ray's sort-aggregate reduces arrow
    blocks with vectorized kernels but pandas blocks per-key in Python —
    measured 30 s vs ~1 s on a 19k-group aggregate at sf0.01."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    _require_positive(size_us=size_us, slide_us=slide_us)
    fanout = int(np.ceil(size_us / slide_us))

    def explode(batch: "pa.Table") -> "pa.Table":
        us = pc.cast(
            pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64()
        ).to_numpy()
        keys = batch[key]
        vals = batch[value_col]
        tables = []
        for i in range(fanout):
            start = ((us - i * slide_us) // slide_us) * slide_us
            keep = (us >= start) & (us < start + size_us)
            idx = pa.array(np.nonzero(keep)[0])
            tables.append(
                pa.Table.from_arrays(
                    [keys.take(idx), pa.array(start[keep]), vals.take(idx)],
                    names=[key, "window_start_us", value_col],
                )
            )
        return pa.concat_tables(tables)

    agg = (
        events.map_batches(explode, batch_format="pyarrow")
        .groupby([key, "window_start_us"])
        .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="sum_value"))
    )
    return agg.map_batches(
        lambda df: df.assign(sum_value=df["sum_value"].round(2)),
        batch_format="pandas",
    )


def session_window(
    events: "ray.data.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_us: int = 1800 * US,
) -> "ray.data.Dataset":
    """→ (key, session_start_us, session_end_us, n, sum_value) — sessions
    split where the inter-event gap exceeds ``gap_us``. groupby(key) →
    per-group ts sort → vectorized gaps-and-islands."""
    _require_positive(gap_us=gap_us)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        us = _ts_us(g[ts_col])
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_session[1:] = (us[1:] - us[:-1]) > gap_us
        session_id = np.cumsum(new_session)
        out = (
            pd.DataFrame(
                {
                    key: g[key].to_numpy(),
                    "_sid": session_id,
                    "_us": us,
                    value_col: g[value_col].to_numpy(),
                }
            )
            .groupby([key, "_sid"], as_index=False)
            .agg(
                session_start_us=("_us", "min"),
                session_end_us=("_us", "max"),
                n=("_us", "size"),
                sum_value=(value_col, "sum"),
            )
        )
        out["sum_value"] = out["sum_value"].round(2)
        out["n"] = out["n"].astype("int64")
        return out.drop(columns=["_sid"])

    return events.groupby(key).map_groups(sessions, batch_format="pandas")


def trailing_window(
    events: "ray.data.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    trail_us: int = 3600 * US,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """→ (id, key, trail_n:int64, trail_sum) — for every event, the
    count and value sum of the key's events with
    ``ts ∈ [ts_e − trail_us, ts_e]`` (peer-inclusive at both ends:
    exactly the SQL ``RANGE BETWEEN INTERVAL … PRECEDING AND CURRENT
    ROW`` frame, which includes same-timestamp peers). The
    trailing-feature primitive ("spend in the last hour").

    One key-bucket shuffle; per bucket ONE sort + two vectorized
    ``searchsorted`` calls over a composite (key_code, ts) integer —
    no per-key loop. The composite fits int64 whenever
    ``n_keys_in_bucket × (ts_span + trail)`` < 2⁶² µs (≈ 146k years of
    span per key-million); wider inputs raise loudly rather than
    overflow silently."""
    _require_positive(trail_us=trail_us, num_buckets=num_buckets)
    from ..shuffle import bucket_tag

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, key, ts_col, value_col]].copy()
        out["_bucket"] = bucket_tag(out, key, num_buckets)
        return out

    def trail(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="stable")
        us = _ts_us(g[ts_col])
        codes = pd.factorize(g[key], sort=False)[0].astype(np.int64)
        span = int(us.max() - us.min()) if len(us) else 0
        shift = span + trail_us + 1
        if codes.max(initial=0) >= (2**62) // max(shift, 1):
            raise ValueError(
                "trailing_window composite overflow: "
                f"{codes.max() + 1} keys × {shift} µs span — RAISE "
                "num_buckets (fewer keys per bucket) or shrink the "
                "window/timestamp span"
            )
        base = us - int(us.min()) if len(us) else us
        arr = codes * shift + base
        lo = np.searchsorted(arr, codes * shift + (base - trail_us),
                             side="left")
        hi = np.searchsorted(arr, arr, side="right")
        vals = g[value_col].to_numpy(dtype=np.float64)
        csum = np.concatenate([[0.0], np.cumsum(vals)])
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key: g[key].to_numpy(),
                "trail_n": (hi - lo).astype(np.int64),
                "trail_sum": np.round(csum[hi] - csum[lo], 2),
            }
        )

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(trail, batch_format="pandas")
    )


def running_window(
    events: "ray.data.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """→ (id, key, running_n:int64, running_sum) — per-key cumulative
    count and value sum in event-time order (ties broken by ``id_col``,
    so the frame is the SQL ``ROWS UNBOUNDED PRECEDING`` one, not the
    peer-inclusive RANGE default). The running-feature primitive
    (lifetime spend, events-so-far) for feature engineering.

    One key-bucket shuffle; per bucket a single vectorized sort +
    per-key cumsum (no per-key Python loop). A key's full history lands
    in one group — same partitioning assumption as ``session_window``;
    ``running_sum`` rounded to 2 (summation prefix order is identical
    on both engines, rounding is anti-ulp headroom only)."""
    from ..shuffle import bucket_tag

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, key, ts_col, value_col]].copy()
        out["_bucket"] = bucket_tag(out, key, num_buckets)
        return out

    def cumulate(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="stable")
        grp = g.groupby(key, sort=False)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key: g[key].to_numpy(),
                "running_n": grp.cumcount().to_numpy() + 1,
                "running_sum": grp[value_col].cumsum().round(2).to_numpy(),
            }
        )

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(cumulate, batch_format="pandas")
    )


def lag_window(
    events: "ray.data.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    periods: int = 1,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """→ (id, key, lag_value, lead_value, gap_us:int64) — per-key
    LAG/LEAD of ``value_col`` by ``periods`` rows in event-time order
    (ties broken by ``id_col``), plus the microsecond gap to the
    previous event (NULL→-1 for the first ``periods`` rows of a key:
    typed sentinel, never an object NaN through the shuffle). The
    inter-arrival / delta-feature primitive.

    One key-bucket shuffle; per bucket a single vectorized sort +
    groupby shift (no per-key Python loop). A key's full history lands
    in one group — the session_window partitioning assumption."""
    from ..shuffle import bucket_tag

    _require_positive(periods=periods)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, key, ts_col, value_col]].copy()
        out["_bucket"] = bucket_tag(out, key, num_buckets)
        return out

    def shift(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="stable")
        grp = g.groupby(key, sort=False)
        lag = grp[value_col].shift(periods)
        lead = grp[value_col].shift(-periods)
        prev_ts = grp[ts_col].shift(periods)
        gap = (
            (_ts_us(g[ts_col]) - _ts_us(prev_ts.fillna(g[ts_col])))
            if np.issubdtype(np.asarray(g[ts_col]).dtype, np.datetime64)
            or str(g[ts_col].dtype).startswith("datetime")
            else (g[ts_col] - prev_ts.fillna(g[ts_col])).to_numpy()
        )
        gap = np.asarray(gap, np.int64)
        gap[prev_ts.isna().to_numpy()] = -1
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key: g[key].to_numpy(),
                "lag_value": lag.to_numpy(np.float64),
                "lead_value": lead.to_numpy(np.float64),
                "gap_us": gap,
            }
        )

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(shift, batch_format="pandas")
    )


def funnel_counts(
    events: "ray.data.Dataset",
    steps: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Ordered-funnel conversion (product telemetry's classic): per
    user, step i matches the EARLIEST event of type ``steps[i]``
    strictly after the matched step i−1 (first-touch semantics, step 0
    = the user's earliest such event) → small DataFrame (step:int64
    1-based, event_type, n_users:int64), one row per step.

    Scale shape: rows filtered to funnel types map-side, ONE user-bucket
    shuffle; each bucket advances all of its users through the step
    chain with len(steps) vectorized groupby-mins (a user lives wholly
    in its bucket, so per-bucket counts are globally exact); the driver
    sums len(steps) partials per bucket."""
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    from ..shuffle import bucket_tag

    step_set = list(dict.fromkeys(steps))
    if len(step_set) != len(steps):
        raise ValueError(f"funnel steps must be distinct: {steps}")

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        d = df.loc[df[type_col].isin(steps),
                   [user_col, type_col, ts_col]].dropna()
        out = pd.DataFrame({
            "u": d[user_col],
            "t": d[type_col].astype(object),
            "ts": _ts_us(d[ts_col]),
        })
        return out.assign(_bucket=bucket_tag(out, "u", num_buckets))

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        cur = None  # Series: user → matched ts of the previous step
        counts = []
        for st in steps:
            sub = g.loc[g["t"] == st, ["u", "ts"]]
            if cur is not None:
                prev = sub["u"].map(cur)
                sub = sub.loc[prev.notna() & (sub["ts"]
                                              > prev.fillna(np.inf))]
            cur = sub.groupby("u")["ts"].min()
            counts.append(len(cur))
        return pd.DataFrame({
            "step": np.arange(1, len(steps) + 1, dtype=np.int64),
            "event_type": pd.Series(steps, dtype=object),
            "n_users": np.array(counts, dtype=np.int64),
        })

    parts = (
        events.map_batches(pick, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(walk, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({
            "step": np.arange(1, len(steps) + 1, dtype=np.int64),
            "event_type": pd.Series(steps, dtype=object),
            "n_users": np.zeros(len(steps), dtype=np.int64),
        })
    out = parts.groupby(["step", "event_type"], as_index=False)[
        "n_users"].sum()
    out["step"] = out["step"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("step").reset_index(drop=True)


def retention_cohorts(
    events: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Retention-cohort matrix: cohort = the user's FIRST event date,
    day_offset = whole days since it → Dataset (cohort_date:str
    'YYYY-MM-DD', day_offset:int64, n_users:int64) counting DISTINCT
    users active at that offset (the activation/retention grid every
    product-analytics stack draws).

    Scale shape: ONE user-bucket shuffle; each bucket derives its
    users' first dates and distinct (cohort, offset) pairs vectorized
    (a user lives wholly in its bucket → partial counts are exact);
    one tiny (cohort, offset) groupby-sum finishes. The matrix is
    calendar-bounded (days × days), never corpus-sized."""
    from ..shuffle import bucket_tag, pair_bucket_tag

    DAY = 86_400_000_000

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[user_col, ts_col]].dropna()
        out = pd.DataFrame({"u": d[user_col],
                            "day": _ts_us(d[ts_col]) // DAY})
        out = out.drop_duplicates()
        return out.assign(_bucket=bucket_tag(out, "u", num_buckets))

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["u", "day"]].drop_duplicates()
        first = g.groupby("u")["day"].transform("min")
        pairs = pd.DataFrame({
            "cohort_day": first.astype(np.int64),
            "day_offset": (g["day"] - first).astype(np.int64),
        })
        out = pairs.groupby(["cohort_day", "day_offset"],
                            as_index=False).size().rename(
            columns={"size": "n_users"})
        out["n_users"] = out["n_users"].astype(np.int64)
        return out.assign(_bucket=pair_bucket_tag(
            out, ["cohort_day", "day_offset"], num_buckets))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["cohort_day", "day_offset"], as_index=False)[
            "n_users"].sum()
        date = pd.to_datetime(out["cohort_day"] * DAY, unit="us")
        return pd.DataFrame({
            "cohort_date": date.dt.strftime("%Y-%m-%d").astype(object),
            "day_offset": out["day_offset"].astype(np.int64),
            "n_users": out["n_users"].astype(np.int64),
        })

    return (
        events.map_batches(pick, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_user, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def transition_counts(
    events: "ray.data.Dataset",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """First-order event-transition (Markov) counts: per user, order
    events by (ts, id) and count consecutive (prev_type, next_type)
    pairs → small DataFrame (prev_type, next_type, n:int64). The
    session-model / next-event-prediction primitive.

    Scale shape: ONE user-bucket shuffle (a user's history lands whole
    in its bucket — the session_window partitioning assumption); per
    bucket a single vectorized sort + groupby shift → per-pair counts;
    the driver merges ≤ |types|² rows per bucket."""
    from ..shuffle import bucket_tag

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[user_col, type_col, ts_col, id_col]].dropna(
            subset=[user_col, type_col, ts_col])
        out = pd.DataFrame({
            "u": out[user_col], "t": out[type_col].astype(object),
            "ts": _ts_us(out[ts_col]), "i": out[id_col],
        })
        return out.assign(_bucket=bucket_tag(out, "u", num_buckets))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts", "i"], kind="stable")
        prev = g.groupby("u", sort=False)["t"].shift(1)
        m = prev.notna()
        out = pd.DataFrame({"prev_type": prev[m],
                            "next_type": g.loc[m, "t"]})
        out = out.groupby(["prev_type", "next_type"],
                          as_index=False).size().rename(
            columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = (
        events.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({
            "prev_type": pd.Series([], dtype=object),
            "next_type": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64)})
    out = parts.groupby(["prev_type", "next_type"], as_index=False)[
        "n"].sum()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["prev_type", "next_type"]).reset_index(
        drop=True)


def funnel_latency(
    events: "ray.data.Dataset",
    steps: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Time-to-convert per funnel transition: for every user advancing
    from step i to step i+1 under ``funnel_counts``' first-touch rule,
    the gap between the two matched events → DataFrame (step:int64 =
    the LATER step's 1-based index, from_type, to_type, n_users:int64,
    mean_gap_us:int64 = FLOOR(Σgap/n), exact — gaps are integer
    microseconds, so the sums agree bit-for-bit with a SQL replay).

    Same shape as funnel_counts: one user-bucket shuffle, vectorized
    step chain per bucket, len(steps)−1 scalar partials per bucket."""
    if len(steps) < 2:
        raise ValueError("funnel_latency needs ≥ 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct: {steps}")
    from ..shuffle import bucket_tag

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        d = df.loc[df[type_col].isin(steps),
                   [user_col, type_col, ts_col]].dropna()
        out = pd.DataFrame({
            "u": d[user_col],
            "t": d[type_col].astype(object),
            "ts": _ts_us(d[ts_col]),
        })
        return out.assign(_bucket=bucket_tag(out, "u", num_buckets))

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        cur = None
        rows = []
        for i, st in enumerate(steps):
            sub = g.loc[g["t"] == st, ["u", "ts"]]
            if cur is not None:
                prev = sub["u"].map(cur)
                sub = sub.loc[prev.notna()
                              & (sub["ts"] > prev.fillna(np.inf))]
            nxt = sub.groupby("u")["ts"].min()
            if cur is not None:
                gaps = (nxt - nxt.index.map(cur)).to_numpy(np.int64)
                rows.append((i + 1, int(gaps.sum()), len(gaps)))
            cur = nxt
        return pd.DataFrame({
            "step": np.array([r[0] for r in rows], dtype=np.int64),
            "gap_sum": np.array([r[1] for r in rows], dtype=np.int64),
            "n_users": np.array([r[2] for r in rows], dtype=np.int64),
        })

    parts = (
        events.map_batches(pick, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(walk, batch_format="pandas")
        .to_pandas()
    )
    base = pd.DataFrame({
        "step": np.arange(2, len(steps) + 1, dtype=np.int64),
        "from_type": pd.Series(steps[:-1], dtype=object),
        "to_type": pd.Series(steps[1:], dtype=object),
    })
    if parts.empty:
        agg = pd.DataFrame({"step": base["step"],
                            "gap_sum": np.int64(0),
                            "n_users": np.int64(0)})
    else:
        agg = parts.groupby("step", as_index=False)[
            ["gap_sum", "n_users"]].sum()
    out = base.merge(agg, on="step", how="left").fillna(0)
    n = out["n_users"].to_numpy(np.int64)
    s = out["gap_sum"].to_numpy(np.int64)
    out["n_users"] = n
    out["mean_gap_us"] = np.where(
        n > 0, np.floor(s / np.maximum(n, 1)), 0).astype(np.int64)
    return out[["step", "from_type", "to_type", "n_users",
                "mean_gap_us"]]
