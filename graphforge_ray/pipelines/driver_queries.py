"""Driver-contract queries: one entry per implemented operator family
(SURVEY.md §2 + the training-data operator suite), each over the driver's
testdata tables, paired with a DuckDB oracle SQL string where the operator
is SQL-expressible.

Column-name parity rule: every computed/aggregate column is explicitly
named IDENTICALLY in the Ray implementation and the SQL (the driver's
compare hashes values after sorting columns by name).

Float parity rule: floating aggregates are rounded (ROUND(x, 2|4|6)) on
BOTH sides; distributed summation order differs from DuckDB's, so raw
float equality is not a contract.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


from ..fixtures import gen_pages_table
from ..query.ops import transitive_closure
from ..stages.dedup import (
    embedding_neardup,
    exact_dedup,
    minhash_dedup,
    simhash_batch,
)
from ..stages.similarity import brute_force_topk
from ..stages.text_analysis import (
    LangIdentifier,
    TextQualityScorer,
    token_stats_batch,
)
from .forge import forge_triples

VOCAB_LANG = "http://schema.org/inLanguage"
VOCAB_SOURCE = "http://graft.example/vocab#source"
VOCAB_NCHARS = "http://graft.example/vocab#nChars"


def _t(sf_dir: str, table: str, columns: list[str] | None = None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Relational capability parity (SURVEY §2.4-2.7)
# ---------------------------------------------------------------------------

def q_count_by_event_type(sf_dir: str):
    """A1/A4: GROUP BY + COUNT (reference testAggregationQuery)."""
    return (
        _t(sf_dir, "events", ["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="cnt"))
    )


SQL_COUNT_BY_EVENT_TYPE = (
    "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type"
)


def q_lineitem_agg(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate (Sum/Mean/Count over groups).
    Map-side partial aggregation is what Ray's groupby does internally;
    rounding applied at the end (float parity rule)."""
    ds = _t(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount"],
    )

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        return batch.append_column("revenue", rev)

    agg = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("revenue", alias_name="sum_revenue"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="n"),
        )
    )

    def final_round(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_qty"] = df["sum_qty"].round(2)
        df["sum_revenue"] = df["sum_revenue"].round(2)
        df["avg_disc"] = df["avg_disc"].round(4)
        return df

    return agg.map_batches(final_round, batch_format="pandas")


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                        AS sum_qty,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
       ROUND(AVG(l_discount), 4)                        AS avg_disc,
       COUNT(*)                                         AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_top_parts_by_qty(sf_dir: str):
    """O2 top-k + J1 join: top 10 parts by total lineitem quantity.

    Scale shape: distributed partial-sum groupby → distributed top-k
    (sort+limit) → the 10 winners look up their names against the
    dimension table with a key-pruned read — the fact table never joins
    the dimension table wholesale."""
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    sums = li.groupby("l_partkey").aggregate(Sum("l_quantity", alias_name="sum_qty"))
    top = (
        sums.sort(["sum_qty", "l_partkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
        .rename(columns={"l_partkey": "p_partkey"})
    )
    names = (
        _t(sf_dir, "part", ["p_partkey", "p_name"])
        .filter(expr=f"p_partkey in {sorted(top['p_partkey'])}")
        .to_pandas()
    )
    out = top.merge(names, on="p_partkey", how="inner")
    out["sum_qty"] = out["sum_qty"].round(2)
    return out[["p_partkey", "p_name", "sum_qty"]]


SQL_TOP_PARTS_BY_QTY = """
SELECT p_partkey, p_name, ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_name
ORDER BY sum_qty DESC, p_partkey LIMIT 10
"""


def q_customer_order_counts(sf_dir: str):
    """J2 OPTIONAL analog — customers with zero orders keep a 0 count.

    Scale shape: aggregate the FACT side distributed (one small row per
    customer), then broadcast-merge the aggregate into the dimension
    Dataset map-side (query.ops.broadcast_lookup_join) — the left-outer
    semantics (zero-fill) come from the merge + fillna, no big shuffle
    join. ``Dataset.join(join_type='left_outer')`` remains available for
    two large sides (exercised in query/ops.optional_join tests)."""
    from ..query.ops import broadcast_lookup_join

    counts = (
        _t(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"))
        .to_pandas()
        .rename(columns={"o_custkey": "c_custkey"})
    )
    cust = _t(sf_dir, "customer", ["c_custkey"])
    joined = broadcast_lookup_join(cust, counts, on="c_custkey", how="left")
    return joined.map_batches(
        lambda df: df.assign(n_orders=df["n_orders"].fillna(0).astype("int64")),
        batch_format="pandas",
    )


SQL_CUSTOMER_ORDER_COUNTS = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
"""


def q_orders_limit(sf_dir: str):
    """O1 LIMIT with deterministic ordering (reference default LIMIT 50)."""
    return (
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .sort("o_orderkey")
        .limit(50)
    )


SQL_ORDERS_LIMIT = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_orderkey LIMIT 50
"""


def q_distinct_flags(sf_dir: str):
    """U2/A5: DISTINCT via groupby shuffle."""
    return (
        _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )


SQL_DISTINCT_FLAGS = (
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"
)


def q_union_names(sf_dir: str):
    """U1 union + distinct: nation ∪ region names."""
    n = _t(sf_dir, "nation", ["n_name"]).map_batches(
        lambda t: t.rename_columns(["name"]), batch_format="pyarrow"
    )
    r = _t(sf_dir, "region", ["r_name"]).map_batches(
        lambda t: t.rename_columns(["name"]), batch_format="pyarrow"
    )
    return (
        n.union(r).groupby("name").aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )


SQL_UNION_NAMES = (
    "SELECT n_name AS name FROM nation UNION SELECT r_name AS name FROM region"
)


def q_revenue_filter(sf_dir: str):
    """P-style vectorized predicate + global aggregate (TPC-H Q6 shape);
    predicate pushdown happens in the arrow filter, only 4 columns read."""
    ds = _t(sf_dir, "lineitem",
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def filt(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"],
                                 pa.scalar(pd.Timestamp("1994-01-01"))),
                pc.less(batch["l_shipdate"],
                        pa.scalar(pd.Timestamp("1995-01-01"))),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(batch["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(batch["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(batch["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = batch.filter(m)
        rev = pc.multiply(t["l_extendedprice"], t["l_discount"])
        return pa.Table.from_arrays([rev], names=["rev"])

    agg = ds.map_batches(filt, batch_format="pyarrow").aggregate(
        Sum("rev", alias_name="revenue")
    )
    return pd.DataFrame({"revenue": [round(agg["revenue"] or 0.0, 2)]})


SQL_REVENUE_FILTER = """
SELECT COALESCE(ROUND(SUM(l_extendedprice * l_discount), 2), 0.0) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate <  TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_events_hourly(sf_dir: str):
    """Streaming-shaped tumbling window: per (user, hour) count + sum
    (ray_guide 'Streaming-shaped workloads' pattern; A1 generalized)."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def add_hour(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000, pa.int64()))
        return pa.Table.from_arrays(
            [batch["user_id"], hour, batch["value"]],
            names=["user_id", "hour", "value"],
        )

    agg = (
        ds.map_batches(add_hour, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    return agg.map_batches(
        lambda df: df.assign(sum_value=df["sum_value"].round(2)),
        batch_format="pandas",
    )


SQL_EVENTS_HOURLY = """
SELECT user_id, epoch_us(ts) // 3600000000 AS hour,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY user_id, hour
"""


def q_events_funnel(sf_dir: str):
    """Ordered-funnel conversion view → click → purchase
    (stages/windows.funnel_counts — first-touch step chain, one
    user-bucket shuffle, exact per-bucket counts). Oracle: stepwise
    MIN(ts)-after-previous-step joins."""
    from ..stages.windows import funnel_counts

    return funnel_counts(
        _t(sf_dir, "events", ["user_id", "event_type", "ts"]),
        steps=["view", "click", "purchase"],
    )


SQL_EVENTS_FUNNEL = """
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t
    FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
    WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t
    FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT * FROM (
    SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
    UNION ALL
    SELECT 2, 'click', COUNT(*) FROM s2
    UNION ALL
    SELECT 3, 'purchase', COUNT(*) FROM s3
) ORDER BY step
"""


def q_events_funnel_latency(sf_dir: str):
    """Mean time-to-convert per funnel transition (stages/windows.
    funnel_latency — integer-microsecond gap sums, exact). Oracle: the
    stepwise MIN-after-previous joins with epoch_us arithmetic."""
    from ..stages.windows import funnel_latency

    return funnel_latency(
        _t(sf_dir, "events", ["user_id", "event_type", "ts"]),
        steps=["view", "click", "purchase"],
    )


SQL_EVENTS_FUNNEL_LATENCY = """
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t
    FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
    WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t
    FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT * FROM (
    SELECT CAST(2 AS BIGINT) AS step, 'view' AS from_type,
           'click' AS to_type, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(FLOOR(CAST(SUM(epoch_us(s2.t) - epoch_us(s1.t))
                           AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS mean_gap_us
    FROM s2 JOIN s1 USING (user_id)
    UNION ALL
    SELECT 3, 'click', 'purchase', COUNT(*),
           CAST(FLOOR(CAST(SUM(epoch_us(s3.t) - epoch_us(s2.t))
                           AS DOUBLE) / COUNT(*)) AS BIGINT)
    FROM s3 JOIN s2 USING (user_id)
) ORDER BY step
"""


def q_events_retention(sf_dir: str):
    """Retention-cohort matrix (stages/windows.retention_cohorts):
    cohort = first event date per user, distinct active users per
    (cohort, day offset). Oracle: the same epoch-day arithmetic with a
    distinct join."""
    from ..stages.windows import retention_cohorts

    out = retention_cohorts(
        _t(sf_dir, "events", ["user_id", "ts"])).to_pandas()
    out["day_offset"] = out["day_offset"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["cohort_date", "day_offset"]).reset_index(
        drop=True)[["cohort_date", "day_offset", "n_users"]]


SQL_EVENTS_RETENTION = """
WITH d AS (
    SELECT DISTINCT user_id,
           epoch_us(ts) // 86400000000 AS day
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
f AS (SELECT user_id, MIN(day) AS d0 FROM d GROUP BY user_id)
SELECT strftime(make_timestamp(f.d0 * 86400000000), '%Y-%m-%d')
           AS cohort_date,
       CAST(d.day - f.d0 AS BIGINT) AS day_offset,
       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
FROM d JOIN f USING (user_id)
GROUP BY f.d0, d.day - f.d0
ORDER BY cohort_date, day_offset
"""


def q_events_transitions(sf_dir: str):
    """First-order event-transition counts (stages/windows.
    transition_counts — per-user ordered shift, one user-bucket
    shuffle). Oracle: LAG window over the same (ts, event_id) order."""
    from ..stages.windows import transition_counts

    return transition_counts(
        _t(sf_dir, "events",
           ["user_id", "event_type", "ts", "event_id"]))


SQL_EVENTS_TRANSITIONS = """
WITH o AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_type
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
          AND ts IS NOT NULL
)
SELECT prev_type, event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM o WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY prev_type, next_type
"""


def q_user_sessions(sf_dir: str):
    """Session windows (30-min gap) per user — groupby(key) shuffle +
    per-group vectorized gaps-and-islands (stages/windows.session_window);
    oracle = SQL LAG + cumulative-SUM islands."""
    from ..stages.windows import session_window

    ev = _t(sf_dir, "events", ["user_id", "ts", "value"])
    return session_window(ev, gap_us=1_800_000_000)


SQL_USER_SESSIONS = """
WITH t AS (
    SELECT user_id, epoch_us(ts) AS us, value,
           CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
), s AS (
    SELECT user_id, us, value,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM t
)
SELECT user_id, MIN(us) AS session_start_us, MAX(us) AS session_end_us,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM s GROUP BY user_id, sid
"""


def q_events_running(sf_dir: str):
    """Per-user cumulative count/sum in event-time order (the
    running-feature primitive, stages/windows.running_window): one
    key-bucket shuffle, vectorized per-bucket sort + cumsum."""
    from ..stages.windows import running_window

    return running_window(
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    )


SQL_EVENTS_RUNNING = """
SELECT event_id, user_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS running_n,
       ROUND(SUM(value) OVER w, 2) AS running_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_events_lag(sf_dir: str):
    """Per-user LAG/LEAD of value + microsecond inter-arrival gap in
    event-time order (stages/windows.lag_window): one key-bucket
    shuffle, vectorized per-bucket sort + groupby shift. NULL firsts
    pinned to the −1 sentinel on both sides."""
    from ..stages.windows import lag_window

    out = lag_window(
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    )
    return out.map_batches(
        lambda df: df.assign(
            lag_value=df["lag_value"].fillna(-1.0),
            lead_value=df["lead_value"].fillna(-1.0),
        ),
        batch_format="pandas",
    )


SQL_EVENTS_LAG = """
SELECT event_id, user_id,
       COALESCE(LAG(value, 1) OVER w, -1.0) AS lag_value,
       COALESCE(LEAD(value, 1) OVER w, -1.0) AS lead_value,
       COALESCE(CAST(epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w)
                AS BIGINT), -1) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_events_trailing(sf_dir: str):
    """Per-event trailing 1-hour count/sum (SQL RANGE-frame semantics,
    peer-inclusive): one key-bucket shuffle, per bucket one sort + two
    vectorized searchsorted calls (stages/windows.trailing_window)."""
    from ..stages.windows import US, trailing_window

    return trailing_window(
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        trail_us=3600 * US,
    )


SQL_EVENTS_TRAILING = """
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS trail_n,
       ROUND(SUM(value) OVER w, 2) AS trail_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def q_events_sliding(sf_dir: str):
    """Sliding windows (1 h size, 30 min slide): map-side fan-out to the
    containing windows, then one grouped aggregate (stages/windows)."""
    from ..stages.windows import sliding_window

    ev = _t(sf_dir, "events", ["user_id", "ts", "value"])
    return sliding_window(
        ev, size_us=3_600_000_000, slide_us=1_800_000_000
    )


SQL_EVENTS_SLIDING = """
SELECT user_id, w AS window_start_us,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM (
    SELECT user_id,
           (epoch_us(ts) // 1800000000) * 1800000000 AS w, value
    FROM events
    UNION ALL
    SELECT user_id,
           (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000 AS w, value
    FROM events
)
GROUP BY user_id, w
"""


def q_part_hierarchy_closure(sf_dir: str, distributed_threshold: int = 200_000):
    """J3 property-path transitive closure over a derived hierarchy
    (p_partkey → p_partkey // 2), matching a recursive CTE oracle.

    Edge distillation stays a Dataset; the closure auto-routes by edge
    count — ≤ threshold: driver-side vectorized semi-naïve (zero
    shuffles), above: ``transitive_closure_distributed`` path-doubling
    rounds (nothing corpus-sized on the driver)."""
    from ..query.ops import transitive_closure_distributed

    part = _t(sf_dir, "part", ["p_partkey"])

    def edges(batch: pa.Table) -> pa.Table:
        keys = batch["p_partkey"]
        t = batch.filter(pc.greater(keys, pa.scalar(1)))
        s = t["p_partkey"]
        o = pc.divide(s, pa.scalar(2, pa.int64()))
        return pa.Table.from_arrays([s, o], names=["s", "o"])

    edges_ds = part.map_batches(edges, batch_format="pyarrow").materialize()
    if edges_ds.count() <= distributed_threshold:
        return transitive_closure(
            edges_ds.to_pandas(), max_iterations=64, include_reflexive=False
        )
    return (
        transitive_closure_distributed(edges_ds)
        .to_pandas()
        .sort_values(["s", "o"])
        .reset_index(drop=True)
    )


SQL_PART_HIERARCHY_CLOSURE = """
WITH RECURSIVE e AS (
    SELECT p_partkey AS s, p_partkey // 2 AS o FROM part WHERE p_partkey > 1
), r(s, o) AS (
    SELECT s, o FROM e
    UNION
    SELECT r.s, e.o FROM r JOIN e ON r.o = e.s
)
SELECT s, o FROM r
"""


# ---------------------------------------------------------------------------
# Graph analytics over the materialized graph (beyond-reference family) —
# PageRank / triangles / components / degree stats, all SQL-expressible on
# deterministic edge sets derived from the testdata tables
# ---------------------------------------------------------------------------

# Deterministic dense-enough test graph over part: every key k >= 1 gets
# directed edges k -> k//2 and k -> k-1 (a binary-tree skeleton plus a
# chain; odd k closes triangles {k//2, k-1, k}); node 0 is dangling.
_PART_GRAPH_SQL = """
    SELECT p_partkey AS s, p_partkey // 2 AS o FROM part WHERE p_partkey >= 1
    UNION ALL
    SELECT p_partkey AS s, p_partkey - 1 AS o FROM part WHERE p_partkey >= 1
"""


def _part_graph_edges(sf_dir: str):
    part = _t(sf_dir, "part", ["p_partkey"])

    def edges(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch["p_partkey"], pa.scalar(1)))
        k = t["p_partkey"]
        half = pc.divide(k, pa.scalar(2, pa.int64()))
        prev = pc.subtract(k, pa.scalar(1, pa.int64()))
        return pa.concat_tables(
            [pa.table({"s": k, "o": half}), pa.table({"s": k, "o": prev})]
        )

    return part.map_batches(edges, batch_format="pyarrow")


def q_graph_pagerank(sf_dir: str, num_iters: int = 3):
    """Distributed PageRank (power iteration, dangling redistribution)
    over the part-derived graph; exact vs an unrolled-iteration SQL
    oracle (both sides round to 8 decimals — float parity rule)."""
    from ..stages.graph import pagerank

    ranks = pagerank(
        _part_graph_edges(sf_dir), num_iters=num_iters, damping=0.85
    )
    df = ranks.to_pandas()
    df["rank"] = df["rank"].round(8)
    return df.sort_values("node").reset_index(drop=True)[["node", "rank"]]


def _pagerank_sql(num_iters: int = 3) -> str:
    """Unrolled power-iteration oracle: r_{i+1} = (1-d)/N +
    d*(Σ_in r_i/deg + dangling_i/N), mirroring stages/graph.pagerank
    term for term (same association order is NOT required — both sides
    round to 8 decimals on ranks of magnitude ~1/N)."""
    ctes = [
        f"WITH e AS ({_PART_GRAPH_SQL}),",
        "nodes AS (SELECT s AS node FROM e UNION SELECT o AS node FROM e),",
        "deg AS (SELECT s AS node, COUNT(*) AS d FROM e GROUP BY s),",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),",
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),",
    ]
    for i in range(num_iters):
        p, c = f"r{i}", f"r{i + 1}"
        ctes.append(
            f"dm{i} AS (SELECT COALESCE(SUM({p}.r), 0) AS dm FROM {p} "
            f"LEFT JOIN deg USING (node) WHERE deg.d IS NULL),"
        )
        ctes.append(
            f"i{i} AS (SELECT e.o AS node, SUM({p}.r / deg.d) AS m FROM e "
            f"JOIN {p} ON {p}.node = e.s JOIN deg ON deg.node = e.s "
            f"GROUP BY e.o),"
        )
        ctes.append(
            f"{c} AS (SELECT nodes.node, (1 - 0.85) / (SELECT n FROM nn) "
            f"+ 0.85 * (COALESCE(i{i}.m, 0) "
            f"+ (SELECT dm FROM dm{i}) / (SELECT n FROM nn)) AS r "
            f"FROM nodes LEFT JOIN i{i} ON i{i}.node = nodes.node),"
        )
    ctes[-1] = ctes[-1].rstrip(",")
    return (
        "\n".join(ctes)
        + f"\nSELECT node, ROUND(r, 8) AS rank FROM r{num_iters} "
        "ORDER BY node"
    )


SQL_GRAPH_PAGERANK = _pagerank_sql(3)


def q_graph_pagerank_warm(sf_dir: str):
    """Warm-started PageRank — the incremental-maintenance path: ranks
    of the BASE graph (edges with s % 5 != 0, 2 rounds) seed the
    iteration over the FULL graph (2 more rounds); nodes new to the
    full graph start at 1/N. Oracle: both phases unrolled in one SQL
    chain."""
    from ..stages.graph import pagerank

    full = _part_graph_edges(sf_dir)
    base = full.map_batches(
        lambda df: df[df["s"] % 5 != 0], batch_format="pandas"
    )
    prior = pagerank(base, num_iters=2, damping=0.85)
    ranks = pagerank(full, num_iters=2, damping=0.85, init_ranks=prior)
    df = ranks.to_pandas()
    df["rank"] = df["rank"].round(8)
    return df.sort_values("node").reset_index(drop=True)[["node", "rank"]]


def _pr_rounds(ctes: list, pfx: str, e: str, nodes: str, deg: str,
               nn: str, r0: str, n: int) -> str:
    """Append n unrolled power-iteration rounds over the given edge /
    node / degree CTE names, starting from rank CTE ``r0``; returns the
    final rank CTE name."""
    prev = r0
    for i in range(n):
        cur = f"{pfx}{i + 1}"
        ctes.append(
            f"dm_{pfx}{i} AS (SELECT COALESCE(SUM({prev}.r), 0) AS dm "
            f"FROM {prev} LEFT JOIN {deg} USING (node) "
            f"WHERE {deg}.d IS NULL),"
        )
        ctes.append(
            f"i_{pfx}{i} AS (SELECT {e}.o AS node, "
            f"SUM({prev}.r / {deg}.d) AS m FROM {e} "
            f"JOIN {prev} ON {prev}.node = {e}.s "
            f"JOIN {deg} ON {deg}.node = {e}.s GROUP BY {e}.o),"
        )
        ctes.append(
            f"{cur} AS (SELECT {nodes}.node, "
            f"(1 - 0.85) / (SELECT n FROM {nn}) "
            f"+ 0.85 * (COALESCE(i_{pfx}{i}.m, 0) "
            f"+ (SELECT dm FROM dm_{pfx}{i}) / (SELECT n FROM {nn})) AS r "
            f"FROM {nodes} LEFT JOIN i_{pfx}{i} "
            f"ON i_{pfx}{i}.node = {nodes}.node),"
        )
        prev = cur
    return prev


def _pagerank_warm_sql(j: int = 2, k: int = 2) -> str:
    """Two-phase unrolled oracle for q_graph_pagerank_warm: j rounds
    over the base edge set seed k rounds over the full edge set (new
    nodes COALESCE to 1/N_full)."""
    ctes = [
        f"WITH fe AS ({_PART_GRAPH_SQL}),",
        "eb AS (SELECT * FROM fe WHERE s % 5 <> 0),",
        "nodesb AS (SELECT s AS node FROM eb UNION SELECT o FROM eb),",
        "degb AS (SELECT s AS node, COUNT(*) AS d FROM eb GROUP BY s),",
        "nnb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodesb),",
        "b0 AS (SELECT node, 1.0 / (SELECT n FROM nnb) AS r FROM nodesb),",
    ]
    last_b = _pr_rounds(ctes, "b", "eb", "nodesb", "degb", "nnb", "b0", j)
    ctes += [
        "nodes AS (SELECT s AS node FROM fe UNION SELECT o FROM fe),",
        "deg AS (SELECT s AS node, COUNT(*) AS d FROM fe GROUP BY s),",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),",
        f"w0 AS (SELECT nodes.node, COALESCE({last_b}.r, "
        f"1.0 / (SELECT n FROM nn)) AS r FROM nodes "
        f"LEFT JOIN {last_b} ON {last_b}.node = nodes.node),",
    ]
    last_w = _pr_rounds(ctes, "w", "fe", "nodes", "deg", "nn", "w0", k)
    ctes[-1] = ctes[-1].rstrip(",")
    return (
        "\n".join(ctes)
        + f"\nSELECT node, ROUND(r, 8) AS rank FROM {last_w} "
        "ORDER BY node"
    )


SQL_GRAPH_PAGERANK_WARM = _pagerank_warm_sql(2, 2)

def q_nation_full_outer(sf_dir: str):
    """Distributed FULL OUTER join (completes the bindings_join type
    matrix: inner/left/semi/anti existed; this exercises 'full_outer'
    where BOTH sides have exclusive keys): per-nation customer counts
    (even nation keys only) ⟗ per-nation supplier counts (keys % 3 == 0
    only) — matches exist at keys % 6 == 0, exclusives on both sides,
    missing counts coalesce to 0."""
    from ..shuffle import bindings_join

    def counts(ds, key, out):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(key, as_index=False).size().rename(
                columns={key: "nation_key", "size": out}
            )
            g["nation_key"] = g["nation_key"].astype(str)
            return g

        from ..shuffle import bucket_tag

        def reduce_b(g: pd.DataFrame) -> pd.DataFrame:
            out_f = g.groupby("nation_key", as_index=False)[out].sum()
            out_f[out] = out_f[out].astype(np.int64)
            return out_f

        return (
            ds.map_batches(partial, batch_format="pandas")
            .map_batches(
                lambda df: df.assign(
                    _bucket=bucket_tag(df, "nation_key", 8)
                ),
                batch_format="pandas",
            )
            .groupby("_bucket")
            .map_groups(reduce_b, batch_format="pandas")
        )

    cust = _t(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda df: df[df["c_nationkey"] % 2 == 0],
        batch_format="pandas",
    )
    supp = _t(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda df: df[df["s_nationkey"] % 3 == 0],
        batch_format="pandas",
    )
    joined = bindings_join(
        counts(cust, "c_nationkey", "n_cust"),
        counts(supp, "s_nationkey", "n_supp"),
        on=["nation_key"], how="full_outer", num_buckets=8,
    ).to_pandas()
    for c in ("n_cust", "n_supp"):
        joined[c] = (
            pd.to_numeric(joined[c], errors="coerce")
            .fillna(0)
            .astype(np.int64)
        )
    joined["nation_key"] = joined["nation_key"].astype(np.int64)
    return joined.sort_values("nation_key").reset_index(drop=True)[
        ["nation_key", "n_cust", "n_supp"]
    ]


SQL_NATION_FULL_OUTER = """
WITH c AS (
    SELECT c_nationkey AS nation_key,
           CAST(COUNT(*) AS BIGINT) AS n_cust
    FROM customer WHERE c_nationkey % 2 = 0 GROUP BY c_nationkey
),
s AS (
    SELECT s_nationkey AS nation_key,
           CAST(COUNT(*) AS BIGINT) AS n_supp
    FROM supplier WHERE s_nationkey % 3 = 0 GROUP BY s_nationkey
)
SELECT COALESCE(c.nation_key, s.nation_key) AS nation_key,
       COALESCE(c.n_cust, 0) AS n_cust,
       COALESCE(s.n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON s.nation_key = c.nation_key
ORDER BY nation_key
"""


_LP_GRAPH_SQL = """
    SELECT p_partkey AS s,
           p_partkey - (p_partkey % 10)
             + ((p_partkey % 10) + 1) % 10 AS o
    FROM part
    UNION ALL
    SELECT p_partkey, p_partkey - (p_partkey % 10)
    FROM part WHERE p_partkey % 10 <> 0
"""


def q_graph_label_prop(sf_dir: str, num_iters: int = 3):
    """Synchronous label propagation over a decade-structured graph
    (10-rings + spokes to each decade hub → real majority votes, not
    just ties) vs an unrolled-round SQL oracle with the identical
    (count DESC, label ASC) tie rule."""
    from ..stages.graph import label_propagation

    part = _t(sf_dir, "part", ["p_partkey"])

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        k = df["p_partkey"].astype(np.int64)
        ring = pd.DataFrame(
            {"s": k, "o": k - (k % 10) + ((k % 10) + 1) % 10}
        )
        m = (k % 10 != 0).to_numpy()
        spoke = pd.DataFrame(
            {"s": k[m], "o": (k[m] - (k[m] % 10))}
        )
        return pd.concat([ring, spoke], ignore_index=True)

    out = label_propagation(
        part.map_batches(to_edges, batch_format="pandas"),
        num_iters=num_iters,
    ).to_pandas()
    return out.sort_values("node").reset_index(drop=True)[
        ["node", "label"]
    ]


def _lp_ctes(num_iters: int = 3) -> tuple[list, str]:
    """Unrolled synchronous-LP CTE chain (shared by the label-prop and
    modularity oracles): per round, each node adopts the most frequent
    neighbor label (ties → smallest), mirroring
    stages/graph.label_propagation round for round. Returns (ctes,
    final label CTE name); the last element carries a trailing comma."""
    ctes = [
        f"WITH e0 AS ({_LP_GRAPH_SQL}),",
        "eu AS (SELECT s, o FROM e0 UNION ALL SELECT o, s FROM e0),",
        "l0 AS (SELECT DISTINCT s AS node, s AS label FROM eu),",
    ]
    for i in range(num_iters):
        prev, cur = f"l{i}", f"l{i + 1}"
        ctes.append(
            f"{cur} AS (SELECT dst AS node, label FROM ("
            f"SELECT e.o AS dst, l.label, COUNT(*) AS c, "
            f"ROW_NUMBER() OVER (PARTITION BY e.o "
            f"ORDER BY COUNT(*) DESC, l.label) AS rn "
            f"FROM eu e JOIN {prev} l ON l.node = e.s "
            f"GROUP BY e.o, l.label) WHERE rn = 1),"
        )
    return ctes, f"l{num_iters}"


def _label_prop_sql(num_iters: int = 3) -> str:
    ctes, last = _lp_ctes(num_iters)
    ctes[-1] = ctes[-1].rstrip(",")
    return (
        "\n".join(ctes)
        + f"\nSELECT node, label FROM {last} ORDER BY node"
    )


SQL_GRAPH_LABEL_PROP = _label_prop_sql(3)


def q_graph_modularity(sf_dir: str, num_iters: int = 3):
    """Modularity Q of the label-propagation partition over the
    decade-structured LP graph (stages/graph.modularity composed onto
    label_propagation — the partition-quality scalar). Oracle: the
    unrolled LP CTE chain feeding the same Q = Σ_c [e_c/m −
    (D_c/2m)²] formula, association-matched; round 8."""
    from ..stages.graph import label_propagation, modularity

    part = _t(sf_dir, "part", ["p_partkey"])

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        k = df["p_partkey"].astype(np.int64)
        ring = pd.DataFrame(
            {"s": k, "o": k - (k % 10) + ((k % 10) + 1) % 10}
        )
        m = (k % 10 != 0).to_numpy()
        spoke = pd.DataFrame(
            {"s": k[m], "o": (k[m] - (k[m] % 10))}
        )
        return pd.concat([ring, spoke], ignore_index=True)

    edges = part.map_batches(to_edges, batch_format="pandas")
    labels = label_propagation(edges, num_iters=num_iters)
    q = modularity(edges, labels)
    return pd.DataFrame({"modularity": [np.round(q, 8)]})


def _modularity_sql(num_iters: int = 3) -> str:
    ctes, last = _lp_ctes(num_iters)
    ctes += [
        "c AS (SELECT DISTINCT LEAST(s, o) AS a, GREATEST(s, o) AS b "
        "FROM e0 WHERE s <> o),",
        "mm AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM c),",
        f"j AS (SELECT la.label AS la, lb.label AS lb FROM c "
        f"JOIN {last} la ON la.node = c.a "
        f"JOIN {last} lb ON lb.node = c.b),",
        "intra AS (SELECT la AS label, CAST(COUNT(*) AS DOUBLE) AS e "
        "FROM j WHERE la = lb GROUP BY la),",
        "degs AS (SELECT label, CAST(COUNT(*) AS DOUBLE) AS dsum FROM ("
        "SELECT la AS label FROM j UNION ALL SELECT lb FROM j"
        ") GROUP BY label),",
        "terms AS (SELECT COALESCE(i.e, 0) / (SELECT m FROM mm) "
        "- (d.dsum / (2 * (SELECT m FROM mm))) "
        "* (d.dsum / (2 * (SELECT m FROM mm))) AS q "
        "FROM degs d LEFT JOIN intra i USING (label))",
    ]
    return ("\n".join(ctes)
            + "\nSELECT ROUND(SUM(q), 8) AS modularity FROM terms")


SQL_GRAPH_MODULARITY = _modularity_sql(3)


_PPR_SEEDS = [1, 2, 3]


def q_graph_ppr(sf_dir: str, num_iters: int = 3):
    """Personalized PageRank (restart to seeds {1,2,3}) over the
    part-derived graph vs an unrolled-iteration SQL oracle; ranks
    round to 8 decimals (float parity rule, same as graph_pagerank)."""
    from ..stages.graph import personalized_pagerank

    ranks = personalized_pagerank(
        _part_graph_edges(sf_dir), _PPR_SEEDS,
        num_iters=num_iters, damping=0.85,
    )
    df = ranks.to_pandas()
    df["rank"] = df["rank"].round(8)
    return df.sort_values("node").reset_index(drop=True)[
        ["node", "rank"]
    ]


def _ppr_sql(num_iters: int = 3, seeds: list | None = None) -> str:
    """Unrolled personalized-PageRank oracle: r_{i+1} = (1-d)·p(v) +
    d·(Σ_in r_i/deg + dangling_i·p(v)), p(v) = 1/|S| on the seed set —
    mirroring stages/graph.personalized_pagerank term for term."""
    seeds = seeds or _PPR_SEEDS
    in_list = ", ".join(str(s) for s in seeds)
    ctes = [
        f"WITH e AS ({_PART_GRAPH_SQL}),",
        "nodes AS (SELECT s AS node FROM e UNION SELECT o AS node FROM e),",
        "deg AS (SELECT s AS node, COUNT(*) AS d FROM e GROUP BY s),",
        f"sv AS (SELECT node, CASE WHEN node IN ({in_list}) "
        "THEN 1.0 ELSE 0.0 END AS sf FROM nodes),",
        "ns AS (SELECT CAST(SUM(sf) AS DOUBLE) AS n FROM sv),",
        "p AS (SELECT node, sf / (SELECT n FROM ns) AS pv FROM sv),",
        "r0 AS (SELECT node, pv AS r FROM p),",
    ]
    for i in range(num_iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        ctes.append(
            f"dm{i} AS (SELECT COALESCE(SUM({prev}.r), 0) AS dm "
            f"FROM {prev} LEFT JOIN deg USING (node) "
            f"WHERE deg.d IS NULL),"
        )
        ctes.append(
            f"i{i} AS (SELECT e.o AS node, SUM({prev}.r / deg.d) AS m "
            f"FROM e JOIN {prev} ON {prev}.node = e.s "
            f"JOIN deg ON deg.node = e.s GROUP BY e.o),"
        )
        ctes.append(
            f"{cur} AS (SELECT nodes.node, (1 - 0.85) * p.pv "
            f"+ 0.85 * (COALESCE(i{i}.m, 0) "
            f"+ (SELECT dm FROM dm{i}) * p.pv) AS r "
            f"FROM nodes JOIN p USING (node) "
            f"LEFT JOIN i{i} ON i{i}.node = nodes.node),"
        )
    ctes[-1] = ctes[-1].rstrip(",")
    return (
        "\n".join(ctes)
        + f"\nSELECT node, ROUND(r, 8) AS rank FROM r{num_iters} "
        "ORDER BY node"
    )


SQL_GRAPH_PPR = _ppr_sql(3)


def q_graph_triangles(sf_dir: str):
    """Distributed triangle count (canonicalize → wedge join → closing
    semi-join) vs a 3-way self-join SQL oracle."""
    from ..stages.graph import triangle_count

    n = triangle_count(_part_graph_edges(sf_dir))
    return pd.DataFrame({"n_triangles": pd.array([n], dtype="int64")})


SQL_GRAPH_TRIANGLES = f"""
WITH raw AS ({_PART_GRAPH_SQL}),
e AS (
    SELECT DISTINCT LEAST(s, o) AS a, GREATEST(s, o) AS b
    FROM raw WHERE s <> o
)
SELECT COUNT(*) AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.b
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
"""


def q_graph_clustering(sf_dir: str):
    """Per-node local clustering coefficient (stages/graph.
    local_clustering: wedge-close triangle rows exploded to per-node
    counts + degree census + one left-outer bindings_join) vs a 3-way
    self-join SQL oracle; both sides round to 8 decimals (the float
    parity rule — the coefficient is one float64 divide of two exact
    integers on both sides)."""
    from ..stages.graph import local_clustering

    df = local_clustering(_part_graph_edges(sf_dir)).to_pandas()
    df["node"] = df["node"].astype(np.int64)
    df["clustering"] = df["clustering"].round(8)
    return df.sort_values("node").reset_index(drop=True)[
        ["node", "clustering"]]


SQL_GRAPH_CLUSTERING = f"""
WITH raw AS ({_PART_GRAPH_SQL}),
c AS (
    SELECT DISTINCT LEAST(s, o) AS a, GREATEST(s, o) AS b
    FROM raw WHERE s <> o
),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d
    FROM (SELECT a AS node FROM c UNION ALL SELECT b AS node FROM c)
    GROUP BY node
),
tri AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM c e1
    JOIN c e2 ON e2.a = e1.b
    JOIN c e3 ON e3.a = e1.a AND e3.b = e2.b
),
tn AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS t
    FROM (SELECT x AS node FROM tri UNION ALL
          SELECT y AS node FROM tri UNION ALL
          SELECT z AS node FROM tri)
    GROUP BY node
)
SELECT deg.node,
       ROUND(CASE WHEN deg.d >= 2
             THEN 2.0 * CAST(COALESCE(tn.t, 0) AS DOUBLE)
                  / CAST(deg.d * (deg.d - 1) AS DOUBLE)
             ELSE 0.0 END, 8) AS clustering
FROM deg LEFT JOIN tn USING (node)
ORDER BY deg.node
"""


def q_graph_assortativity(sf_dir: str):
    """Degree assortativity coefficient (Newman 2002 — Pearson over
    endpoint degrees, both orientations of the undirected simple edge
    set). All five moments are exact-integer float64 sums on both
    sides, so the final divide is bit-comparable; round 8."""
    from ..stages.graph import degree_assortativity

    r = degree_assortativity(_part_graph_edges(sf_dir))
    return pd.DataFrame({"assortativity": [np.round(r, 8)]})


SQL_GRAPH_ASSORTATIVITY = f"""
WITH raw AS ({_PART_GRAPH_SQL}),
c AS (
    SELECT DISTINCT LEAST(s, o) AS a, GREATEST(s, o) AS b
    FROM raw WHERE s <> o
),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d
    FROM (SELECT a AS node FROM c UNION ALL SELECT b AS node FROM c)
    GROUP BY node
),
j AS (
    SELECT da.d AS x, db.d AS y
    FROM c JOIN deg da ON da.node = c.a JOIN deg db ON db.node = c.b
),
m AS (
    SELECT CAST(2 * COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(x + y) AS DOUBLE) AS sx,
           CAST(SUM(x * x + y * y) AS DOUBLE) AS sxx,
           CAST(2 * SUM(x * y) AS DOUBLE) AS sxy
    FROM j
)
SELECT ROUND((n * sxy - sx * sx) / (n * sxx - sx * sx), 8)
           AS assortativity
FROM m
"""


def q_graph_neighbor_agg(sf_dir: str):
    """One-hop neighbor feature smoothing (stages/graph.neighbor_agg —
    the SGC/LightGCN propagate step): mean in-neighbor p_size per node
    of the part graph. p_size is integral, so sums are exact on both
    sides and the single divide is bit-comparable (FLOOR 1e-6)."""
    from ..stages.graph import neighbor_agg

    part = _t(sf_dir, "part", ["p_partkey", "p_size"])
    feats = part.map_batches(
        lambda df: pd.DataFrame({
            "node": df["p_partkey"].astype(np.int64),
            "p_size": df["p_size"].astype(np.float64)}),
        batch_format="pandas")
    out = neighbor_agg(_part_graph_edges(sf_dir), feats,
                       ["p_size"]).to_pandas()
    out["node"] = out["node"].astype(np.int64)
    out["n_nbrs"] = out["n_nbrs"].astype(np.int64)
    return out.sort_values("node").reset_index(drop=True)[
        ["node", "n_nbrs", "p_size_mean"]]


SQL_GRAPH_NEIGHBOR_AGG = f"""
WITH e AS ({_PART_GRAPH_SQL}),
f AS (SELECT p_partkey AS node, CAST(p_size AS DOUBLE) AS v FROM part)
SELECT e.o AS node,
       CAST(COUNT(*) AS BIGINT) AS n_nbrs,
       FLOOR(SUM(f.v) / COUNT(*) * 1e6) / 1e6 AS p_size_mean
FROM e JOIN f ON f.node = e.s
GROUP BY e.o ORDER BY node
"""


def q_graph_truss(sf_dir: str, k: int = 3):
    """3-truss of the part graph (stages/graph.k_truss — iterative
    support peel over the shared wedge-close machinery, runs to
    fixpoint). Oracle: 4 unrolled peel rounds — more than the measured
    fixpoint depth (2 incl. confirm at every sf), and peeling past the
    fixpoint is idempotent, so the round counts need not match."""
    from ..stages.graph import k_truss

    out = k_truss(_part_graph_edges(sf_dir), k=k).to_pandas()
    out["id_a"] = out["id_a"].astype(np.int64)
    out["id_b"] = out["id_b"].astype(np.int64)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)[
        ["id_a", "id_b"]]


def _truss_sql(k: int = 3, rounds: int = 4) -> str:
    need = k - 2
    ctes = [
        f"WITH raw AS ({_PART_GRAPH_SQL}),",
        "t0 AS MATERIALIZED (SELECT DISTINCT LEAST(s, o) AS a, "
        "GREATEST(s, o) AS b FROM raw WHERE s <> o),",
    ]
    for i in range(rounds):
        p, c = f"t{i}", f"t{i + 1}"
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT ea, eb, COUNT(*) AS sup "
            f"FROM ("
            f"SELECT e1.a AS ea, e1.b AS eb FROM {p} e1 "
            f"JOIN {p} e2 ON e2.a = e1.b "
            f"JOIN {p} e3 ON e3.a = e1.a AND e3.b = e2.b "
            f"UNION ALL "
            f"SELECT e1.a, e2.b FROM {p} e1 "
            f"JOIN {p} e2 ON e2.a = e1.b "
            f"JOIN {p} e3 ON e3.a = e1.a AND e3.b = e2.b "
            f"UNION ALL "
            f"SELECT e1.b, e2.b FROM {p} e1 "
            f"JOIN {p} e2 ON e2.a = e1.b "
            f"JOIN {p} e3 ON e3.a = e1.a AND e3.b = e2.b"
            f") GROUP BY ea, eb),"
        )
        ctes.append(
            f"{c} AS MATERIALIZED (SELECT e.a, e.b FROM {p} e "
            f"JOIN s{i} ON s{i}.ea = e.a AND s{i}.eb = e.b "
            f"WHERE s{i}.sup >= {need}),"
        )
    ctes[-1] = ctes[-1].rstrip(",")
    return ("\n".join(ctes)
            + f"\nSELECT a AS id_a, b AS id_b FROM t{rounds} "
            "ORDER BY id_a, id_b")


SQL_GRAPH_TRUSS = _truss_sql(3, 4)


def q_graph_diameter(sf_dir: str):
    """Double-sweep diameter lower bound (stages/graph.
    diameter_estimate): BFS from the min node, re-BFS from the farthest
    (min-node ties) — over the part graph restricted to keys ≤ 1024 so
    the sweep depth (and the oracle's recursion budget) stays bounded
    at every sf. Oracle: two depth-capped recursive CTEs with the same
    deterministic picks."""
    from ..stages.graph import diameter_estimate

    part = _t(sf_dir, "part", ["p_partkey"])

    def edges(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.and_(
            pc.greater_equal(batch["p_partkey"], pa.scalar(1)),
            pc.less_equal(batch["p_partkey"], pa.scalar(1024))))
        k = t["p_partkey"]
        half = pc.divide(k, pa.scalar(2, pa.int64()))
        prev = pc.subtract(k, pa.scalar(1, pa.int64()))
        return pa.concat_tables(
            [pa.table({"s": k, "o": half}), pa.table({"s": k, "o": prev})]
        )

    return diameter_estimate(part.map_batches(edges,
                                              batch_format="pyarrow"))


SQL_GRAPH_DIAMETER = """
WITH RECURSIVE e0 AS (
    SELECT p_partkey AS s, p_partkey // 2 AS o FROM part
    WHERE p_partkey BETWEEN 1 AND 1024
    UNION ALL
    SELECT p_partkey AS s, p_partkey - 1 AS o FROM part
    WHERE p_partkey BETWEEN 1 AND 1024
),
eu AS (
    SELECT s, o FROM e0 WHERE s <> o
    UNION
    SELECT o, s FROM e0 WHERE s <> o
),
seedt AS (
    SELECT MIN(node) AS v
    FROM (SELECT s AS node FROM eu UNION SELECT o FROM eu)
),
w1(node, d) AS (
    SELECT (SELECT v FROM seedt), CAST(0 AS BIGINT)
    UNION
    SELECT eu.o, w1.d + 1 FROM w1 JOIN eu ON eu.s = w1.node
    WHERE w1.d < 40
),
b1 AS (SELECT node, MIN(d) AS d FROM w1 GROUP BY node),
fart AS (
    SELECT node FROM b1
    WHERE d = (SELECT MAX(d) FROM b1)
    ORDER BY node LIMIT 1
),
w2(node, d) AS (
    SELECT (SELECT node FROM fart), CAST(0 AS BIGINT)
    UNION
    SELECT eu.o, w2.d + 1 FROM w2 JOIN eu ON eu.s = w2.node
    WHERE w2.d < 40
),
b2 AS (SELECT node, MIN(d) AS d FROM w2 GROUP BY node)
SELECT (SELECT v FROM seedt) AS seed,
       (SELECT node FROM fart) AS peripheral,
       (SELECT MAX(d) FROM b2) AS diameter_lb
"""


def q_parts_copurchase(sf_dir: str):
    """Co-purchase graph (stages/graph.bipartite_project): parts
    co-occurring in ≥ 2 distinct orders, weighted by distinct-order
    count — the one-mode projection every recommender / co-citation
    pipeline starts from. Oracle: distinct self-join + HAVING."""
    from ..stages.graph import bipartite_project

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    out = bipartite_project(
        li, "l_orderkey", "l_partkey", min_count=2).to_pandas()
    out["a"] = out["a"].astype(np.int64)
    out["b"] = out["b"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)[
        ["a", "b", "n"]]


SQL_PARTS_COPURCHASE = """
WITH b AS (
    SELECT DISTINCT l_orderkey AS k, l_partkey AS v FROM lineitem
),
p AS (
    SELECT x.v AS a, y.v AS b FROM b x JOIN b y USING (k)
    WHERE x.v < y.v
)
SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY a, b HAVING COUNT(*) >= 2
ORDER BY a, b
"""


def q_graph_degree_hist(sf_dir: str):
    """Out-degree histogram of the customer→order graph (orders per
    customer): two-level distributed aggregate, tiny result."""
    from ..stages.graph import degree_histogram

    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderkey"])
    edges = orders.map_batches(
        lambda t: pa.table({"s": t["o_custkey"], "o": t["o_orderkey"]}),
        batch_format="pyarrow",
    )
    return degree_histogram(edges)


SQL_GRAPH_DEGREE_HIST = """
WITH d AS (
    SELECT o_custkey, COUNT(*) AS out_deg FROM orders GROUP BY o_custkey
)
SELECT out_deg, COUNT(*) AS n_nodes FROM d GROUP BY out_deg ORDER BY out_deg
"""


def q_graph_components(sf_dir: str):
    """Connected components (distributed min-label propagation) over
    chain segments of the part keys — every run of 10 consecutive keys
    is one component, so the component label (= min member) is exactly
    computable in SQL."""
    from ..stages.dedup import connected_components

    part = _t(sf_dir, "part", ["p_partkey"])

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        k = df["p_partkey"].to_numpy()
        k = k[k % 10 != 0]
        return pd.DataFrame({"id_a": k, "id_b": k - 1})

    labels = connected_components(
        part.map_batches(edges, batch_format="pandas")
    )
    df = labels.to_pandas()
    return df.sort_values("node").reset_index(drop=True)[["node", "label"]]


SQL_GRAPH_COMPONENTS = """
WITH e AS (
    SELECT p_partkey AS a, p_partkey - 1 AS b FROM part
    WHERE p_partkey % 10 <> 0
),
n AS (SELECT a AS node FROM e UNION SELECT b AS node FROM e)
SELECT node, node - (node % 10) AS label FROM n ORDER BY node
"""


def q_graph_component_sizes(sf_dir: str):
    """Component-size histogram (how fragmented is the graph — the
    first diagnostic on any extracted web/KG graph): pointer-jumped
    connected components → per-label count partials → size histogram.
    Only the histogram (≤ distinct-size rows) reaches the driver."""
    from ..stages.dedup import connected_components
    from ..shuffle import bucket_tag

    part = _t(sf_dir, "part", ["p_partkey"])

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        k = df["p_partkey"].to_numpy()
        k = k[k % 10 != 0]
        return pd.DataFrame({"id_a": k, "id_b": k - 1})

    labels = connected_components(
        part.map_batches(edges, batch_format="pandas"))

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("label", as_index=False).size().rename(
            columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, "label", 16))

    def sizes(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("label", as_index=False)["n"].sum()
        h = out.groupby("n", as_index=False).size().rename(
            columns={"n": "size", "size": "n_components"})
        h["size"] = h["size"].astype(np.int64)
        h["n_components"] = h["n_components"].astype(np.int64)
        return h

    hist = (
        labels.map_batches(count_partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(sizes, batch_format="pandas")
        .to_pandas()
    )
    out = hist.groupby("size", as_index=False)["n_components"].sum()
    out["size"] = out["size"].astype(np.int64)
    out["n_components"] = out["n_components"].astype(np.int64)
    return out.sort_values("size").reset_index(drop=True)


SQL_GRAPH_COMPONENT_SIZES = """
WITH e AS (
    SELECT p_partkey AS a, p_partkey - 1 AS b FROM part
    WHERE p_partkey % 10 <> 0
),
n AS (SELECT a AS node FROM e UNION SELECT b AS node FROM e),
lab AS (SELECT node, node - (node % 10) AS label FROM n),
cs AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS size
       FROM lab GROUP BY label)
SELECT size, CAST(COUNT(*) AS BIGINT) AS n_components
FROM cs GROUP BY size ORDER BY size
"""


def q_graph_hits(sf_dir: str, num_iters: int = 2):
    """HITS hubs/authorities (L1-normalized half-steps) over the
    part-derived graph vs an unrolled-iteration SQL oracle; both sides
    round to 8 decimals (float parity rule, scores of magnitude
    ~1/N — same contract as graph_pagerank)."""
    from ..stages.graph import hits

    scores = hits(_part_graph_edges(sf_dir), num_iters=num_iters)
    df = scores.to_pandas()
    df["hub"] = df["hub"].round(8)
    df["auth"] = df["auth"].round(8)
    return (
        df.sort_values("node").reset_index(drop=True)[["node", "hub", "auth"]]
    )


def _hits_sql(num_iters: int = 2) -> str:
    """Unrolled HITS oracle: raw auth = Σ_in hub, L1-normalize; raw hub
    = Σ_out auth', L1-normalize — mirroring stages/graph.hits half-step
    for half-step (rounding to 8 decimals absorbs association order)."""
    ctes = [
        f"WITH e AS ({_PART_GRAPH_SQL}),",
        "nodes AS (SELECT s AS node FROM e UNION SELECT o AS node FROM e),",
        "h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS h FROM nodes),",
    ]
    for i in range(num_iters):
        nxt = i + 1
        ctes.append(
            f"ra{i} AS (SELECT n.node, COALESCE(SUM(h.h), 0) AS r "
            f"FROM nodes n LEFT JOIN e ON e.o = n.node "
            f"LEFT JOIN h{i} h ON h.node = e.s GROUP BY n.node),"
        )
        ctes.append(
            f"a{nxt} AS (SELECT node, r / (SELECT SUM(r) FROM ra{i}) AS a "
            f"FROM ra{i}),"
        )
        ctes.append(
            f"rh{i} AS (SELECT n.node, COALESCE(SUM(a.a), 0) AS r "
            f"FROM nodes n LEFT JOIN e ON e.s = n.node "
            f"LEFT JOIN a{nxt} a ON a.node = e.o GROUP BY n.node),"
        )
        ctes.append(
            f"h{nxt} AS (SELECT node, r / (SELECT SUM(r) FROM rh{i}) AS h "
            f"FROM rh{i}),"
        )
    ctes[-1] = ctes[-1].rstrip(",")
    n = num_iters
    return (
        "\n".join(ctes)
        + f"\nSELECT h{n}.node, ROUND(h{n}.h, 8) AS hub, "
        f"ROUND(a{n}.a, 8) AS auth "
        f"FROM h{n} JOIN a{n} USING (node) ORDER BY h{n}.node"
    )


SQL_GRAPH_HITS = _hits_sql(2)


def q_graph_bfs(sf_dir: str):
    """Multi-source BFS depths (frontier rounds, broadcast/shuffle
    expansion) from node 1 over the REVERSED part graph (k//2 → k and
    k-1 → k), radius 6 — vs a depth-bounded recursive-CTE oracle taking
    MIN(depth) per node. The reachable set within radius 6 is the same
    for every sf (small keys only), so the query is sf-stable."""
    from ..stages.graph import bfs_depths

    part = _t(sf_dir, "part", ["p_partkey"])

    def edges(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch["p_partkey"], pa.scalar(1)))
        k = t["p_partkey"]
        half = pc.divide(k, pa.scalar(2, pa.int64()))
        prev = pc.subtract(k, pa.scalar(1, pa.int64()))
        return pa.concat_tables(
            [pa.table({"s": half, "o": k}), pa.table({"s": prev, "o": k})]
        )

    depths = bfs_depths(
        part.map_batches(edges, batch_format="pyarrow"),
        seeds=[1],
        max_depth=6,
    )
    df = depths.to_pandas()
    return df.sort_values("node").reset_index(drop=True)[["node", "depth"]]


SQL_GRAPH_BFS = """
WITH RECURSIVE e AS (
    SELECT p_partkey // 2 AS s, p_partkey AS o FROM part WHERE p_partkey >= 1
    UNION ALL
    SELECT p_partkey - 1 AS s, p_partkey AS o FROM part WHERE p_partkey >= 1
), walk(node, depth) AS (
    SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS depth
    UNION
    SELECT e.o, walk.depth + 1 FROM walk JOIN e ON e.s = walk.node
    WHERE walk.depth < 6
)
SELECT node, MIN(depth) AS depth FROM walk GROUP BY node ORDER BY node
"""


def q_graph_jaccard(sf_dir: str):
    """Common-neighbor Jaccard node similarity (link-prediction
    primitive) over the part graph, pairs with ≥2 common neighbors —
    vs a self-join + degree-join SQL oracle. Degrees ride the wedge
    shuffle (no post-hoc join); exact (no hub cap) on this graph."""
    from ..stages.graph import node_jaccard

    sim = node_jaccard(_part_graph_edges(sf_dir), min_common=2)
    df = sim.to_pandas()
    df["jaccard"] = df["jaccard"].round(6)
    return (
        df.sort_values(["a", "b"]).reset_index(drop=True)[
            ["a", "b", "common", "jaccard"]
        ]
    )


SQL_GRAPH_JACCARD = f"""
WITH raw AS ({_PART_GRAPH_SQL}),
und AS (
    SELECT DISTINCT LEAST(s, o) AS a, GREATEST(s, o) AS b
    FROM raw WHERE s <> o
),
adj AS (SELECT a AS n, b AS m FROM und UNION SELECT b AS n, a AS m FROM und),
deg AS (SELECT n, COUNT(*) AS d FROM adj GROUP BY n),
common AS (
    SELECT x.n AS a, y.n AS b, COUNT(*) AS c
    FROM adj x JOIN adj y ON y.m = x.m AND x.n < y.n
    GROUP BY x.n, y.n
)
SELECT c.a, c.b, c.c AS common,
       ROUND(CAST(c.c AS DOUBLE) / (da.d + db.d - c.c), 6) AS jaccard
FROM common c JOIN deg da ON da.n = c.a JOIN deg db ON db.n = c.b
WHERE c.c >= 2
ORDER BY c.a, c.b
"""


def q_graph_kcore(sf_dir: str, k: int = 3, rounds: int = 4):
    """k-core membership + in-core degree (fixed-round peeling form —
    exactly ``rounds`` peels on BOTH sides, so the oracle unrolls the
    identical degree→filter→join rounds; converged rounds are no-ops)."""
    from ..stages.graph import k_core

    core = k_core(_part_graph_edges(sf_dir), k=k, num_rounds=rounds)
    df = core.to_pandas()
    df["deg"] = df["deg"].astype(np.int64)
    return df.sort_values("node").reset_index(drop=True)[["node", "deg"]]


def _kcore_sql(k: int = 3, rounds: int = 4) -> str:
    ctes = [
        f"WITH raw AS ({_PART_GRAPH_SQL}),",
        "und AS (SELECT DISTINCT LEAST(s, o) AS a, GREATEST(s, o) AS b "
        "FROM raw WHERE s <> o),",
        "a0 AS (SELECT a AS n, b AS m FROM und "
        "UNION ALL SELECT b, a FROM und),",
    ]
    for i in range(rounds):
        ctes.append(
            f"d{i} AS (SELECT n, COUNT(*) AS d FROM a{i} GROUP BY n),"
        )
        ctes.append(f"k{i} AS (SELECT n FROM d{i} WHERE d >= {k}),")
        ctes.append(
            f"a{i + 1} AS (SELECT a.n, a.m FROM a{i} a "
            f"JOIN k{i} x ON x.n = a.n JOIN k{i} y ON y.n = a.m),"
        )
    ctes[-1] = ctes[-1].rstrip(",")
    return (
        "\n".join(ctes)
        + f"\nSELECT n AS node, COUNT(*) AS deg FROM a{rounds} "
        "GROUP BY n ORDER BY n"
    )


SQL_GRAPH_KCORE = _kcore_sql(3, 4)


def q_graph_sssp(sf_dir: str):
    """Hop-bounded weighted shortest paths (Bellman-Ford frontier
    relaxation, ≤6 hops from node 1) over the reversed part graph with
    deterministic integer weights w = dst%7 + 1 — vs a hop-bounded
    recursive-CTE MIN(dist) oracle. Weights are integer-valued doubles,
    so both sides are float-exact; ROUND(6) guards the rule anyway."""
    from ..stages.graph import sssp

    part = _t(sf_dir, "part", ["p_partkey"])

    def edges(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch["p_partkey"], pa.scalar(1)))
        k = t["p_partkey"]
        half = pc.divide(k, pa.scalar(2, pa.int64()))
        prev = pc.subtract(k, pa.scalar(1, pa.int64()))
        seven = pa.scalar(7, pa.int64())
        mod7 = pc.subtract(k, pc.multiply(pc.divide(k, seven), seven))
        w = pc.cast(pc.add(mod7, pa.scalar(1, pa.int64())), pa.float64())
        return pa.concat_tables(
            [
                pa.table({"s": half, "o": k, "w": w}),
                pa.table({"s": prev, "o": k, "w": w}),
            ]
        )

    dist = sssp(
        part.map_batches(edges, batch_format="pyarrow"),
        seeds=[1],
        max_hops=6,
    )
    df = dist.to_pandas()
    df["dist"] = df["dist"].round(6)
    return df.sort_values("node").reset_index(drop=True)[["node", "dist"]]


SQL_GRAPH_SSSP = """
WITH RECURSIVE e AS (
    SELECT p_partkey // 2 AS s, p_partkey AS o,
           CAST(p_partkey % 7 + 1 AS DOUBLE) AS w
    FROM part WHERE p_partkey >= 1
    UNION ALL
    SELECT p_partkey - 1 AS s, p_partkey AS o,
           CAST(p_partkey % 7 + 1 AS DOUBLE) AS w
    FROM part WHERE p_partkey >= 1
), walk(node, dist, hops) AS (
    SELECT CAST(1 AS BIGINT), CAST(0 AS DOUBLE), 0
    UNION
    SELECT e.o, walk.dist + e.w, walk.hops + 1
    FROM walk JOIN e ON e.s = walk.node WHERE walk.hops < 6
)
SELECT node, ROUND(MIN(dist), 6) AS dist FROM walk GROUP BY node
ORDER BY node
"""


def q_graph_temporal_reach(sf_dir: str):
    """Hop-bounded earliest-arrival TEMPORAL reachability
    (stages/graph.temporal_reach — an edge (s, o, t) is traversable
    only when t >= arrival at s; same Bellman-Ford frontier discipline
    as sssp, ≤6 hops from node 1 at start=0) over the part graph with
    deterministic integer timestamps t = dst % 11 — vs a hop-bounded
    recursive-CTE time-respecting-walk oracle. Arrivals are
    integer-valued doubles, so both sides are float-exact; ROUND(6)
    guards the rule anyway."""
    from ..stages.graph import temporal_reach

    part = _t(sf_dir, "part", ["p_partkey"])

    def edges(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch["p_partkey"], pa.scalar(1)))
        k = t["p_partkey"]
        half = pc.divide(k, pa.scalar(2, pa.int64()))
        prev = pc.subtract(k, pa.scalar(1, pa.int64()))
        eleven = pa.scalar(11, pa.int64())
        mod11 = pc.subtract(k, pc.multiply(pc.divide(k, eleven), eleven))
        ts = pc.cast(mod11, pa.float64())
        return pa.concat_tables(
            [
                pa.table({"s": half, "o": k, "t": ts}),
                pa.table({"s": prev, "o": k, "t": ts}),
            ]
        )

    reach = temporal_reach(
        part.map_batches(edges, batch_format="pyarrow"),
        seeds=[1],
        start=0.0,
        max_hops=6,
    )
    df = reach.to_pandas()
    df["arrival"] = df["arrival"].round(6)
    return df.sort_values("node").reset_index(drop=True)[["node", "arrival"]]


SQL_GRAPH_TEMPORAL_REACH = """
WITH RECURSIVE e AS (
    SELECT p_partkey // 2 AS s, p_partkey AS o,
           CAST(p_partkey % 11 AS DOUBLE) AS t
    FROM part WHERE p_partkey >= 1
    UNION ALL
    SELECT p_partkey - 1 AS s, p_partkey AS o,
           CAST(p_partkey % 11 AS DOUBLE) AS t
    FROM part WHERE p_partkey >= 1
), walk(node, arrival, hops) AS (
    SELECT CAST(1 AS BIGINT), CAST(0 AS DOUBLE), 0
    UNION
    SELECT e.o, e.t, walk.hops + 1
    FROM walk JOIN e ON e.s = walk.node AND e.t >= walk.arrival
    WHERE walk.hops < 6
)
SELECT node, ROUND(MIN(arrival), 6) AS arrival FROM walk GROUP BY node
ORDER BY node
"""


# ---------------------------------------------------------------------------
# KG mapping over documents (RML path, S2/P-family) — SQL-expressible
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Temporal as-of / interval joins (beyond-reference family, stages/asof.py)
# ---------------------------------------------------------------------------

def q_events_session_join(sf_dir: str):
    """Interval (range) join: every event attached to its containing
    session window (stages/asof.interval_join — bucket shuffle on user,
    vectorized merge_asof-on-start + end-containment mask per bucket;
    sessions are non-overlapping per user by construction). Oracle:
    gaps-and-islands session CTE + BETWEEN join. Every event falls in
    exactly one of its own sessions, so inner join row count = events."""
    from ..stages.asof import interval_join
    from ..stages.windows import session_window

    ev = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    sessions = session_window(ev, gap_us=1_800_000_000).map_batches(
        lambda df: df[["user_id", "session_start_us", "session_end_us"]],
        batch_format="pandas",
    )
    points = ev.map_batches(
        lambda df: pd.DataFrame(
            {
                "event_id": df["event_id"],
                "user_id": df["user_id"],
                "us": df["ts"].astype("datetime64[us]").astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    joined = interval_join(
        points, sessions, by="user_id", on="us",
        start="session_start_us", end="session_end_us",
    )
    return joined.map_batches(
        lambda df: pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts_us": df["us"].astype("int64"),
                "session_start_us": df["session_start_us_r"]
                .astype("int64"),
                "session_end_us": df["session_end_us_r"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


SQL_EVENTS_SESSION_JOIN = """
WITH t AS (
    SELECT user_id, event_id, epoch_us(ts) AS us,
           CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
), s AS (
    SELECT user_id, event_id, us,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM t
), sess AS (
    SELECT user_id, sid, MIN(us) AS session_start_us,
           MAX(us) AS session_end_us
    FROM s GROUP BY user_id, sid
)
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       sess.session_start_us, sess.session_end_us
FROM events e JOIN sess
  ON e.user_id = sess.user_id
 AND epoch_us(e.ts) BETWEEN sess.session_start_us AND sess.session_end_us
"""

def q_events_asof_click(sf_dir: str):
    """As-of join: every purchase event attached to the user's most
    recent click at-or-before it (the 'state at event time' join,
    stages/asof.asof_join — one bucket shuffle on user, one vectorized
    merge_asof per bucket). The click side is deduped to the min
    event_id per (user, ts) on BOTH sides so the tie winner is defined;
    oracle is DuckDB's native ASOF LEFT JOIN over the same CTE.
    Timestamps compare as epoch microseconds; unmatched → -1."""
    from ..shuffle import bucket_tag
    from ..stages.asof import asof_join

    ev = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    purchases = ev.map_batches(
        lambda df: df.loc[df["event_type"] == "purchase",
                          ["event_id", "user_id", "ts"]],
        batch_format="pandas",
    )

    def click_combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.loc[df["event_type"] == "click",
                   ["user_id", "ts", "event_id"]]
            .groupby(["user_id", "ts"], as_index=False)["event_id"].min()
        )
        return g.assign(_bucket=bucket_tag(g, "user_id", 32))

    clicks = (
        ev.map_batches(click_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: g.groupby(["user_id", "ts"], as_index=False)[
                "event_id"
            ].min(),
            batch_format="pandas",
        )
    )
    joined = asof_join(purchases, clicks, by="user_id", on="ts")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "click_event_id": df["event_id_r"]
                .fillna(-1).astype("int64"),
                "click_ts_us": df["ts_r"]
                .astype("datetime64[us]").astype("int64")
                .where(df["ts_r"].notna(), -1),
            }
        )
        return out

    return joined.map_batches(finish, batch_format="pandas")


SQL_EVENTS_ASOF_CLICK = """
WITH clicks AS (
    SELECT user_id, ts, MIN(event_id) AS click_event_id
    FROM events WHERE event_type = 'click'
    GROUP BY user_id, ts
),
p AS (
    SELECT event_id, user_id, ts FROM events
    WHERE event_type = 'purchase'
)
SELECT p.event_id,
       p.user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
       COALESCE(c.click_event_id, -1) AS click_event_id,
       COALESCE(CAST(epoch_us(c.ts) AS BIGINT), -1) AS click_ts_us
FROM p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_rml_documents_triples(sf_dir: str):
    """RML-style column-to-triple mapping over the documents table."""
    docs = _t(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])

    def to_triples(df: pd.DataFrame) -> pd.DataFrame:
        subj = "doc:" + df["doc_id"].astype(str)
        frames = [
            pd.DataFrame({"subj": subj, "pred": VOCAB_LANG, "obj": df["lang"]}),
            pd.DataFrame({"subj": subj, "pred": VOCAB_SOURCE, "obj": df["source"]}),
            pd.DataFrame({"subj": subj, "pred": VOCAB_NCHARS,
                          "obj": df["n_chars"].astype(str)}),
        ]
        return pd.concat(frames, ignore_index=True)

    return docs.map_batches(to_triples, batch_format="pandas")


SQL_RML_DOCUMENTS_TRIPLES = f"""
SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS subj, '{VOCAB_LANG}' AS pred,
       lang AS obj FROM documents
UNION ALL
SELECT 'doc:' || CAST(doc_id AS VARCHAR), '{VOCAB_SOURCE}', source
FROM documents
UNION ALL
SELECT 'doc:' || CAST(doc_id AS VARCHAR), '{VOCAB_NCHARS}',
       CAST(n_chars AS VARCHAR) FROM documents
"""


def q_triples_pred_counts(sf_dir: str):
    """A1 over the mapped triples: per-predicate counts."""
    return (
        q_rml_documents_triples(sf_dir)
        .groupby("pred")
        .aggregate(Count(alias_name="cnt"))
    )


SQL_TRIPLES_PRED_COUNTS = (
    f"SELECT pred, COUNT(*) AS cnt FROM ({SQL_RML_DOCUMENTS_TRIPLES}) "
    "GROUP BY pred"
)


# ---------------------------------------------------------------------------
# Training-data operators — dedup / text analysis / similarity
# ---------------------------------------------------------------------------

def q_docs_exact_dedup(sf_dir: str):
    """Exact dedup: min doc_id per md5(text)."""
    return exact_dedup(_t(sf_dir, "documents", ["doc_id", "text"]))


SQL_DOCS_EXACT_DEDUP = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id
FROM documents GROUP BY md5(text)
"""


def q_doc_token_stats(sf_dir: str):
    """Vectorized token counting (whitespace + BPE-ish pieces)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda df: token_stats_batch(df)[["doc_id", "n_tokens", "n_bpe_tokens"]],
        batch_format="pandas",
    )


SQL_DOC_TOKEN_STATS = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+'))                        AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))
                                                                   AS n_bpe_tokens
FROM documents
"""


def q_doc_char_classes(sf_dir: str):
    """Quality-signal counts (actor-pool TextQualityScorer; integer
    columns only — float parity rule)."""
    from ..stages.proc_cache import process_cached_stage

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        process_cached_stage(TextQualityScorer),
        batch_format="pandas",
    ).map_batches(
        lambda df: df[["doc_id", "n_chars_text", "n_punct", "n_digits",
                       "n_upper", "n_stopwords"]],
        batch_format="pandas",
    )


SQL_DOC_CHAR_CLASSES = r"""
SELECT doc_id,
       len(text)                                           AS n_chars_text,
       len(regexp_extract_all(text, '[^\w\s]'))            AS n_punct,
       len(regexp_extract_all(text, '[0-9]'))              AS n_digits,
       len(regexp_extract_all(text, '[A-Z]'))              AS n_upper,
       len(list_filter(regexp_extract_all(lower(text), '[a-z'']+'),
           t -> t IN ('the','and','of','a','an','to','in','is','it','that',
                      'for','on','as','with','was','are','be','this','at',
                      'by')))                              AS n_stopwords
FROM documents
"""


def _query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """Fetch ONE query embedding with a metadata-pruned direct parquet
    read (row-group predicate pushdown on the driver) — launching a Ray
    execution to retrieve a single row costs ~2 s of fixed overhead."""
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["embedding"], filter=pads.field("vec_id") == vec_id
    )
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 against the vec_id=0 embedding (broadcast
    query matrix, per-batch matmul + partial top-k)."""
    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = _query_vec(sf_dir)
    out = brute_force_topk(emb, q, k=10)
    out = out[["vec_id", "cosine"]].copy()
    out["cosine"] = out["cosine"].round(4)
    return out.reset_index(drop=True)


SQL_ANN_TOPK = """
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(e.embedding, q.embedding), 4) AS cosine
FROM embeddings e, q
ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id
LIMIT 10
"""


def q_ann_topk_multi(sf_dir: str):
    """Multi-query exact ANN (the batched form production retrieval
    uses): 5 query vectors broadcast as ONE matrix, per-block matmul
    scoring, distributed per-query top-k merge forced on (the
    many-query scale path). query_id = row index of the query matrix =
    vec_id here (queries are vec_id < 5 sorted)."""
    from ..stages.similarity import brute_force_topk

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = (
        emb.map_batches(
            lambda df: df[df["vec_id"] < 5], batch_format="pandas"
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.stack(qdf["embedding"].to_numpy())
    out = brute_force_topk(emb, queries, k=10, distributed_merge=True)
    # hash on (query_id, rank, vec_id), NOT the score: DuckDB's
    # list_cosine_similarity computes in float32 (≤ 5e-7 off the numpy
    # float64 value — measured), while the smallest top-15 score gap in
    # the fixture is 9e-5, so rank/membership is noise-stable where the
    # rounded score is not
    out = out.sort_values(
        ["query_id", "cosine", "vec_id"],
        ascending=[True, False, True],
    ).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype(np.int64) + 1
    out["query_id"] = out["query_id"].astype(np.int64)
    return out[["query_id", "rank", "vec_id"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


SQL_ANN_TOPK_MULTI = """
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qe
    FROM embeddings WHERE vec_id < 5
),
s AS (
    SELECT q.query_id, e.vec_id,
           list_cosine_similarity(e.embedding, q.qe) AS c
    FROM embeddings e, q
),
r AS (
    SELECT query_id, vec_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY c DESC, vec_id) AS BIGINT)
               AS rank
    FROM s
)
SELECT query_id, rank, vec_id FROM r WHERE rank <= 10
ORDER BY query_id, rank
"""


# -- rows-only checks (no clean ANSI-SQL equivalent) ------------------------

def q_docs_langid(sf_dir: str):
    """n-gram language-ID heuristic (actor pool)."""
    from ..stages.proc_cache import process_cached_stage

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        process_cached_stage(LangIdentifier), batch_format="pandas"
    ).map_batches(lambda df: df[["doc_id", "lang_pred"]], batch_format="pandas")


def q_docs_ngram_jaccard(sf_dir: str):
    """Exact word-trigram Jaccard for every pair among doc_id < 40 — the
    verification kernel exposed as its own operator, run through the
    distributed pair-verify shuffle (threshold 0 → all pairs kept) and
    hash-checked against a from-scratch SQL recomputation."""
    from ..stages.dedup import verify_candidate_pairs

    docs = _t(sf_dir, "documents", ["doc_id", "text"]).filter(
        expr="doc_id < 40"
    )
    ids = list(range(40))
    pairs = rd.from_pandas(
        pd.DataFrame(
            [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]],
            columns=["id_a", "id_b"],
        )
    )
    out = verify_candidate_pairs(pairs, docs, threshold=0.0).to_pandas()
    # FLOOR at 1e-6, not round: numpy rounds half-even, DuckDB half-away
    # (0.0078125 → 0.007812 vs 0.007813); floor of identical doubles is
    # unambiguous on both sides
    out["jaccard"] = np.floor(out["jaccard"] * 1e6) / 1e6
    return out


SQL_DOCS_NGRAM_JACCARD = r"""
WITH tok AS (
    SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
    FROM documents WHERE doc_id < 40
),
grams AS (
    SELECT doc_id,
           CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
           END AS g
    FROM tok
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       FLOOR(len(list_intersect(a.g, b.g)) * 1.0
             / len(list_distinct(a.g || b.g)) * 1000000)
       / 1000000 AS jaccard
FROM grams a JOIN grams b ON a.doc_id < b.doc_id
"""


def q_docs_incremental_neardup(sf_dir: str):
    """Incremental near-dup (r4 verdict item #5): the FULL documents
    table is the indexed base corpus; 25 probe copies (doc_id+200000 of
    doc_id<25) arrive as NEW docs and are band-equi-joined against the
    persisted MinHash index — base signatures never recomputed. The
    oracle is the FULL-RECLUSTER ground truth: brute-force trigram
    Jaccard ≥ 0.8 over base∪new, filtered to pairs with ≥1 new side
    (same stable-LSH argument as docs_minhash_dedup's oracle)."""
    import tempfile

    from ..stages.dedup import build_band_index, probe_band_index

    base = _t(sf_dir, "documents", ["doc_id", "text"])
    new = base.filter(expr="doc_id < 25").map_batches(
        lambda df: df.assign(doc_id=df["doc_id"] + 200000),
        batch_format="pandas",
    )
    idx_dir = tempfile.mkdtemp(prefix="graft_ndindex_")
    build_band_index(base, idx_dir)
    out = probe_band_index(new, idx_dir, base).to_pandas()
    out["jaccard"] = np.floor(out["jaccard"] * 1e6) / 1e6
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


SQL_DOCS_INCREMENTAL_NEARDUP = r"""
WITH docs2 AS (
    SELECT doc_id, text, 0 AS is_new FROM documents
    UNION ALL
    SELECT doc_id + 200000, text, 1 FROM documents WHERE doc_id < 25
),
tok AS (
    SELECT doc_id, is_new,
           regexp_extract_all(lower(text), '\w+') AS w
    FROM docs2
),
grams AS (
    SELECT doc_id, is_new,
           CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
           END AS g
    FROM tok
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       FLOOR(len(list_intersect(a.g, b.g)) * 1.0
             / len(list_distinct(a.g || b.g)) * 1000000)
       / 1000000 AS jaccard
FROM grams a JOIN grams b ON a.doc_id < b.doc_id
WHERE (a.is_new = 1 OR b.is_new = 1)
  AND len(list_intersect(a.g, b.g)) * 1.0
      / len(list_distinct(a.g || b.g)) >= 0.8
ORDER BY id_a, id_b
"""


def q_docs_fingerprint(sf_dir: str):
    """Winnowing-style document fingerprints (min-k of rolling hashes;
    stages.text_analysis.fingerprint_batch). Rows-only: the rolling-hash
    kernel has no SQL analog; determinism is pinned by pytest goldens."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    from ..stages.text_analysis import fingerprint_batch

    return ds.map_batches(
        lambda df: fingerprint_batch(df)[["doc_id", "fingerprint"]],
        batch_format="pandas",
    )


def q_docs_minhash_dedup(sf_dir: str):
    """MinHash-LSH near-dup clustering, EXACT-oracled: the documents
    table contains genuine near-dup text pairs (e.g. 8/245 at jaccard
    0.99), and deterministic probe copies (doc_id < 25, id + 100000) are
    unioned in so exact-dup clustering is exercised too. The DuckDB
    oracle recomputes trigram-Jaccard pairs + connected components from
    scratch (recursive CTE), so every cluster assignment is checked."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    probes = ds.filter(expr="doc_id < 25").map_batches(
        lambda df: df.assign(doc_id=df["doc_id"] + 100000),
        batch_format="pandas",
    )
    return minhash_dedup(ds.union(probes), threshold=0.8)


# EXACT oracle: word-trigram Jaccard pairs (the same shingle definition as
# stages.dedup._shingles, on raw gram strings instead of 64-bit hashes) +
# connected components as a recursive CTE, over documents ∪ probes. The
# LSH candidate stage has a nonzero false-negative probability in theory
# (16 bands × 4 rows: P(miss | j=0.8) ≈ 2e-4), but the seeded minhash is
# deterministic, so agreement on this table is a stable exact check. The
# size-ratio prefilter (|A|/|B| ≥ 0.8) is implied by jaccard ≥ 0.8.
SQL_DOCS_MINHASH_DEDUP = r"""
WITH RECURSIVE
docs2 AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25
),
tok AS (
    SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM docs2
),
grams AS (
    SELECT doc_id,
           CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
           END AS g
    FROM tok
),
pairs AS (
    SELECT a.doc_id AS ia, b.doc_id AS ib
    FROM grams a JOIN grams b
      ON a.doc_id < b.doc_id
     AND len(a.g) * 5 >= len(b.g) * 4 AND len(b.g) * 5 >= len(a.g) * 4
    WHERE len(list_intersect(a.g, b.g)) * 1.0
          / len(list_distinct(a.g || b.g)) >= 0.8
),
edges AS (
    SELECT ia AS a, ib AS b FROM pairs
    UNION
    SELECT ib, ia FROM pairs
),
reach(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
lab AS (
    SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
)
SELECT d.doc_id,
       COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
       COALESCE(l.cluster_id, d.doc_id) = d.doc_id AS keep
FROM docs2 d LEFT JOIN lab l ON l.doc_id = d.doc_id
"""


def q_docs_dedup_survivors(sf_dir: str):
    """The dedup pipeline's END step: near-dup clusters (minhash_dedup
    over documents ∪ exact-dup probes) → keep the BEST-quality member
    per cluster (quality = text length here; ties → min doc_id) with
    the member count — minhash_dedup ∘ bindings_join ∘ group_topk.
    The oracle extends the exact recursive-CTE clustering with the
    same window-rank survivor rule."""
    from ..shuffle import bindings_join
    from ..stages.profile import group_distinct_count
    from ..stages.stats import group_topk

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    probes = ds.filter(expr="doc_id < 25").map_batches(
        lambda df: df.assign(doc_id=df["doc_id"] + 100000),
        batch_format="pandas",
    )
    union = ds.union(probes)
    clusters = minhash_dedup(union, threshold=0.8).map_batches(
        lambda df: df[["doc_id", "cluster_id"]], batch_format="pandas"
    )
    qual = union.map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "quality": df["text"].fillna("").str.len().astype(
                    np.int64
                ),
            }
        ),
        batch_format="pandas",
    )
    j = bindings_join(clusters, qual, on=["doc_id"]).map_batches(
        # post-join dtype restore BEFORE the next bucket shuffle
        # (numeric-key lesson, CLAUDE.md)
        lambda df: df.assign(
            doc_id=pd.to_numeric(df["doc_id"]).astype(np.int64),
            cluster_id=pd.to_numeric(df["cluster_id"]).astype(np.int64),
            quality=pd.to_numeric(df["quality"]).astype(np.int64),
        ),
        batch_format="pandas",
    )
    sur = group_topk(
        j, key="cluster_id", score_col="quality", k=1, id_col="doc_id"
    ).map_batches(
        lambda df: df.rename(columns={"doc_id": "survivor"}),
        batch_format="pandas",
    )
    counts = group_distinct_count(
        clusters, "cluster_id", "doc_id"
    ).map_batches(
        lambda df: df.rename(columns={"n_distinct": "n_members"}),
        batch_format="pandas",
    )
    out = bindings_join(sur, counts, on=["cluster_id"]).to_pandas()
    for c in ("cluster_id", "survivor", "quality", "n_members"):
        out[c] = pd.to_numeric(out[c]).astype(np.int64)
    return out.sort_values("cluster_id").reset_index(drop=True)[
        ["cluster_id", "survivor", "quality", "n_members"]
    ]


# survivor oracle = the exact clustering CTEs of SQL_DOCS_MINHASH_DEDUP
# + the same window-rank survivor rule (quality desc, id asc)
SQL_DOCS_DEDUP_SURVIVORS = (
    SQL_DOCS_MINHASH_DEDUP[
        : SQL_DOCS_MINHASH_DEDUP.index("SELECT d.doc_id,")
    ].rstrip().rstrip(")").rstrip()
    + """
),
mem AS (
    SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
           CAST(length(COALESCE(d.text, '')) AS BIGINT) AS quality
    FROM docs2 d LEFT JOIN lab l ON l.doc_id = d.doc_id
),
sur AS (
    SELECT cluster_id, doc_id, quality,
           ROW_NUMBER() OVER (PARTITION BY cluster_id
                              ORDER BY quality DESC, doc_id) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
               AS n_members
    FROM mem
)
SELECT cluster_id, doc_id AS survivor, quality, n_members
FROM sur WHERE rn = 1 ORDER BY cluster_id
"""
)


def q_docs_simhash(sf_dir: str):
    """64-bit SimHash per document (hex string for portability)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def sh(df: pd.DataFrame) -> pd.DataFrame:
        out = simhash_batch(df)
        out["simhash_hex"] = [f"{int(h):016x}" for h in out["simhash"]]
        return out[["doc_id", "simhash_hex"]]

    return ds.map_batches(sh, batch_format="pandas")


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs (LSH buckets + verify) —
    FALSIFIABLE form: the synthetic embeddings are near-orthogonal (max
    pairwise cosine ≈ 0.51), so a bare run always returns 0 rows.
    Deterministic probe copies (vec_id < 20, id + 100000) are unioned in;
    identical vectors always share LSH buckets, so the result is exactly
    the 20 (source, copy) pairs at cosine 1.0 — SQL-oracle-able."""
    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    probes = emb.filter(expr="vec_id < 20").map_batches(
        lambda df: df.assign(vec_id=df["vec_id"] + 100000),
        batch_format="pandas",
    )
    # the operator returns a DISTRIBUTED pair Dataset; only the verified
    # result (20 rows here) is collected for the driver compare
    out = embedding_neardup(emb.union(probes), threshold=0.95).to_pandas()
    out["cosine"] = out["cosine"].round(4)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


SQL_EMBEDDING_NEARDUP = """
SELECT vec_id AS id_a, vec_id + 100000 AS id_b, 1.0 AS cosine
FROM embeddings WHERE vec_id < 20
"""


def q_ann_ivf(sf_dir: str):
    """IVF (coarse-quantized) approximate top-10 — the ANN scale path:
    deterministic k-means centroids, map-side cluster assignment, nprobe
    pruning before exact scoring. Rows-only (approximate by design)."""
    from ..stages.similarity import assign_clusters, ivf_topk, train_centroids

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = _query_vec(sf_dir)
    cents = train_centroids(emb, num_clusters=8, max_sample=4096)
    assigned = assign_clusters(emb, cents)
    out = ivf_topk(assigned, cents, q, k=10, nprobe=4)
    out = out[["vec_id", "cosine"]].copy()
    out["cosine"] = out["cosine"].round(4)
    return out.reset_index(drop=True)


def q_ann_quantized(sf_dir: str):
    """int8-quantized exact top-10 (rows-only — approximate by design):
    per-vector symmetric quantization (4× less vector volume through
    the object store at corpus scale), scoring on the dequantized grid.
    Recall vs the float path pinned by pytest."""
    from ..stages.similarity import quantize_embeddings, quantized_topk

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = quantized_topk(quantize_embeddings(emb), _query_vec(sf_dir), k=10)
    out = out[["rank", "vec_id", "cosine"]].copy()
    out["cosine"] = out["cosine"].round(4)
    return out.reset_index(drop=True)


def q_sparql_describe(sf_dir: str):
    """SPARQL DESCRIBE (subject-slice form) mixing both shapes in one
    query: a constant IRI plus a variable bound by a WHERE group — the
    IRI set broadcast map-side, the variable set semi-joined
    distributed. Oracle: the RML triples filtered to the same subject
    union."""
    from ..query.sparql import run_describe

    triples = q_rml_documents_triples(sf_dir)
    return run_describe(
        triples,
        f"DESCRIBE <doc:3> ?d WHERE {{ ?d <{VOCAB_SOURCE}> \"src3\" }}",
    )


SQL_SPARQL_DESCRIBE = f"""
WITH t AS ({SQL_RML_DOCUMENTS_TRIPLES}),
keys AS (
    SELECT 'doc:3' AS k
    UNION
    SELECT subj FROM t
    WHERE pred = '{VOCAB_SOURCE}' AND obj = 'src3'
)
SELECT DISTINCT subj, pred, obj FROM t JOIN keys ON t.subj = keys.k
"""


def q_embeddings_centroids(sf_dir: str):
    """Per-label mean embedding (long form: label, dim, value) — the
    cluster-stats / semantic-drift primitive. Partial sums per batch →
    one (group, dim) bucket shuffle; oracle replays with
    unnest + generate_subscripts + AVG. Both sides round to 6 (float
    association-order rule)."""
    from ..stages.similarity import group_centroids

    emb = _t(sf_dir, "embeddings", ["embedding", "label"])
    out = group_centroids(emb, "embedding", "label").to_pandas()
    return (
        pd.DataFrame(
            {
                "label": out["group"].astype(np.int64),
                "dim": out["dim"].astype(np.int64),
                "value": out["value"].round(6),
            }
        )
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )


SQL_EMBEDDINGS_CENTROIDS = """
WITH x AS (
    SELECT label,
           generate_subscripts(embedding, 1) - 1 AS dim,
           unnest(embedding) AS val
    FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       ROUND(AVG(CAST(val AS DOUBLE)), 6) AS value
FROM x GROUP BY label, dim ORDER BY label, dim
"""


def q_embeddings_project(sf_dir: str):
    """Deterministic ±1 random projection (Achlioptas) 64 → 16 dims in
    long form — the md5 sign rule lets the oracle rebuild the SAME
    matrix in SQL (stages/vectorize.random_project)."""
    from ..stages.vectorize import random_project

    return random_project(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]), out_dim=16
    )


SQL_EMBEDDINGS_PROJECT = """
WITH r AS (
    SELECT i, j,
           CASE WHEN CAST(CONCAT('0x',
                    substr(md5('rp:' || CAST(i AS VARCHAR) || ':'
                               || CAST(j AS VARCHAR)), 1, 10))
                    AS BIGINT) % 2 = 0
                THEN 1.0 ELSE -1.0 END AS sgn
    FROM (SELECT unnest(generate_series(0, 63)) AS i)
    CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j)
),
x AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS i,
           FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1048576 + 0.5) AS v
    FROM embeddings
)
SELECT x.vec_id, CAST(r.j AS BIGINT) AS dim_idx,
       FLOOR(SUM(x.v * r.sgn) / 1048576 / SQRT(16.0) * 1e6) / 1e6 AS val
FROM x JOIN r ON x.i = r.i
GROUP BY x.vec_id, r.j
"""


def q_embeddings_kmeans(sf_dir: str):
    """Distributed spherical k-means over the embeddings table
    (stages/similarity.kmeans_fit — map-side partial sums, driver holds
    only k×d; the SemDeDup semantic-clustering primitive), then map-side
    assignment and per-cluster sizes. Rows-only (no SQL k-means);
    exactness is pinned by the numpy-replay pytest golden."""
    from ..stages.similarity import assign_clusters, kmeans_fit

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents, _ = kmeans_fit(emb, num_clusters=10, iters=5)
    assigned = assign_clusters(emb, cents)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster", as_index=False).size().rename(
            columns={"size": "n"}
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    return (
        assigned.map_batches(counts, batch_format="pandas")
        .groupby("cluster")
        .map_groups(
            lambda g: g.groupby("cluster", as_index=False)["n"].sum(),
            batch_format="pandas",
        )
    )


VOCAB_CHILDOF = "http://graft.example/vocab#childOf"
VOCAB_PNAME = "http://graft.example/vocab#pname"


def q_sparql_filter_orderby(sf_dir: str):
    """SPARQL FILTER (numeric coercion) + multi-key ORDER BY through the
    SELECT compiler, over the RML-mapped documents triples. Oracled: the
    result set is order-insensitive (no LIMIT), so the DuckDB compare is
    exact."""
    from ..query.sparql import run_select

    triples = q_rml_documents_triples(sf_dir)
    return run_select(
        triples,
        f'SELECT ?s ?v WHERE {{ ?s <{VOCAB_NCHARS}> ?v . '
        "FILTER (?v > 300) } ORDER BY DESC(?v) ?s",
    )


SQL_SPARQL_FILTER_ORDERBY = """
SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS s, CAST(n_chars AS VARCHAR) AS v
FROM documents WHERE n_chars > 300
"""


def _part_triples(sf_dir: str):
    """part table → (subj, pred, obj) triples: childOf hierarchy edges +
    pname labels (the fixture graph for path+BGP SPARQL queries)."""
    part = _t(sf_dir, "part", ["p_partkey", "p_name"])

    def to_tri(df: pd.DataFrame) -> pd.DataFrame:
        subj = "part:" + df["p_partkey"].astype(str)
        child = df["p_partkey"] > 1
        edges = pd.DataFrame(
            {
                "subj": subj[child],
                "pred": VOCAB_CHILDOF,
                "obj": "part:" + (df.loc[child, "p_partkey"] // 2).astype(str),
            }
        )
        names = pd.DataFrame(
            {"subj": subj, "pred": VOCAB_PNAME, "obj": df["p_name"]}
        )
        return pd.concat([edges, names], ignore_index=True)

    return part.map_batches(to_tri, batch_format="pandas")


def q_sparql_path_bgp(sf_dir: str):
    """Property-path pattern JOINED with a BGP pattern + FILTER — the
    r1-missing mixed-pattern case: all descendants of part 3 in the
    derived hierarchy with the ancestor's name attached."""
    from ..query.sparql import run_select

    return run_select(
        _part_triples(sf_dir),
        f'SELECT ?s ?n WHERE {{ ?s (<{VOCAB_CHILDOF}>)* ?o . '
        f'?o <{VOCAB_PNAME}> ?n . FILTER (?o = "part:3") }}',
    )


SQL_SPARQL_PATH_BGP = """
WITH RECURSIVE e AS (
    SELECT p_partkey AS s, p_partkey // 2 AS o FROM part WHERE p_partkey > 1
), r(s, o) AS (
    SELECT s, o FROM e
    UNION
    SELECT r.s, e.o FROM r JOIN e ON r.o = e.s
), nodes AS (
    SELECT s AS k FROM e UNION SELECT o FROM e
), rr AS (
    -- explicit DISTINCT: inside a WITH RECURSIVE clause DuckDB does not
    -- reliably dedup a plain UNION of a recursive CTE with another CTE
    SELECT DISTINCT s, o FROM (
        SELECT s, o FROM r UNION ALL SELECT k, k FROM nodes
    )
)
SELECT 'part:' || CAST(rr.s AS VARCHAR) AS s, p.p_name AS n
FROM rr JOIN part p ON p.p_partkey = rr.o
WHERE rr.o = 3
"""


def q_sparql_union_distinct(sf_dir: str):
    """SPARQL { } UNION { } + SELECT DISTINCT through the compiler, over
    the part-hierarchy triples: parts that appear as a child OR carry a
    label starting letter match is overkill — just union children and
    parents, distinct."""
    from ..query.sparql import run_select

    return run_select(
        _part_triples(sf_dir),
        f"SELECT DISTINCT ?x WHERE {{ "
        f"{{ ?x <{VOCAB_CHILDOF}> ?y }} UNION {{ ?y <{VOCAB_CHILDOF}> ?x }}"
        f" }}",
    )


SQL_SPARQL_UNION_DISTINCT = """
SELECT DISTINCT 'part:' || CAST(k AS VARCHAR) AS x FROM (
    SELECT p_partkey AS k FROM part WHERE p_partkey > 1
    UNION
    SELECT p_partkey // 2 FROM part WHERE p_partkey > 1
)
"""


def q_sparql_group_agg(sf_dir: str):
    """SPARQL aggregates beyond COUNT (SUM/AVG/MIN/MAX, multi-aggregate
    projection + GROUP BY) through the SELECT compiler: per-source
    character statistics over the RML-mapped documents triples (a BGP
    join of the source and n_chars patterns feeds a distributed
    groupby-aggregate). Floats are FLOOR-truncated at 1e-4 on both sides
    (identical doubles floor identically; ROUND half-even vs half-away
    differs at boundaries)."""
    from ..query.sparql import run_select

    triples = q_rml_documents_triples(sf_dir)
    out = run_select(
        triples,
        f"SELECT ?src (SUM(?n) AS ?total) (AVG(?n) AS ?mean) "
        f"(MIN(?n) AS ?lo) (MAX(?n) AS ?hi) (COUNT(?n) AS ?cnt) "
        f"WHERE {{ ?s <{VOCAB_SOURCE}> ?src . ?s <{VOCAB_NCHARS}> ?n }} "
        f"GROUP BY ?src",
    )
    for col in ("total", "mean", "lo", "hi"):
        out[col] = np.floor(out[col].astype(float) * 1e4) / 1e4
    return out.sort_values("src").reset_index(drop=True)


SQL_SPARQL_GROUP_AGG = """
SELECT source AS src,
       FLOOR(SUM(n_chars) * 10000.0) / 10000 AS total,
       FLOOR(AVG(n_chars) * 10000.0) / 10000 AS mean,
       FLOOR(MIN(n_chars) * 10000.0) / 10000 AS lo,
       FLOOR(MAX(n_chars) * 10000.0) / 10000 AS hi,
       COUNT(*) AS cnt
FROM documents
GROUP BY source
"""


def q_sparql_string_filter(sf_dir: str):
    """SPARQL string-function FILTERs (CONTAINS + REGEX) through the
    SELECT compiler: docs whose source contains '1' and whose lang
    matches ^(en|fr)$."""
    from ..query.sparql import run_select

    triples = q_rml_documents_triples(sf_dir)
    return run_select(
        triples,
        f"SELECT ?s ?src ?lang WHERE {{ "
        f"?s <{VOCAB_SOURCE}> ?src . ?s <{VOCAB_LANG}> ?lang . "
        f'FILTER(CONTAINS(?src, "1")) . '
        f'FILTER(REGEX(?lang, "^(en|fr)$")) }}',
    )


SQL_SPARQL_STRING_FILTER = """
SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS s, source AS src, lang
FROM documents
WHERE source LIKE '%1%' AND regexp_matches(lang, '^(en|fr)$')
"""


def q_sparql_bind_builtins(sf_dir: str):
    """SPARQL 1.1 expression builtins through the compiler in one
    query: SUBSTR (1-based) + STRAFTER + CONCAT build a derived key,
    IF(cond,…) classifies on a numeric comparison (coercion failure →
    else), REPLACE rewrites with a $1 backref. Oracle: the same four
    expressions in DuckDB (substr / || / CASE / regexp_replace)."""
    from ..query.sparql import run_select

    triples = q_rml_documents_triples(sf_dir)
    return run_select(
        triples,
        f"SELECT ?s ?key ?tag ?r WHERE {{ "
        f"?s <{VOCAB_SOURCE}> ?src . ?s <{VOCAB_NCHARS}> ?n . "
        f'BIND(CONCAT(SUBSTR(?src, 1, 3), "-", STRAFTER(?s, ":")) '
        f"AS ?key) . "
        f'BIND(IF(?n >= 200, "long", "short") AS ?tag) . '
        f'BIND(REPLACE(?src, "src(\\d+)", "s#$1") AS ?r) }}',
    )


SQL_SPARQL_BIND_BUILTINS = r"""
SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS s,
       substr(source, 1, 3) || '-' || CAST(doc_id AS VARCHAR) AS key,
       CASE WHEN n_chars >= 200 THEN 'long' ELSE 'short' END AS tag,
       regexp_replace(source, 'src(\d+)', 's#\1') AS r
FROM documents
"""


def q_sparql_seq_path(sf_dir: str):
    """SPARQL sequence property path through the compiler:
    ``?s <childOf>/<pname> ?n`` (parent's name) — compile-time rewrite
    into chained patterns through a fresh intermediate variable, executed
    as a distributed BGP join."""
    from ..query.sparql import run_select

    return run_select(
        _part_triples(sf_dir),
        f"SELECT ?s ?n WHERE {{ ?s <{VOCAB_CHILDOF}>/<{VOCAB_PNAME}> ?n }}",
    )


SQL_SPARQL_SEQ_PATH = """
SELECT 'part:' || CAST(c.p_partkey AS VARCHAR) AS s, p.p_name AS n
FROM part c JOIN part p ON p.p_partkey = c.p_partkey // 2
WHERE c.p_partkey > 1
"""


def q_sparql_having(sf_dir: str):
    """SPARQL HAVING through the compiler: per-source SUM(n_chars) with
    a post-aggregate HAVING filter. Floats FLOOR-truncated at 1e-4 on
    both sides (the sparql_group_agg discipline)."""
    from ..query.sparql import run_select

    triples = q_rml_documents_triples(sf_dir)
    out = run_select(
        triples,
        f"SELECT ?src (SUM(?n) AS ?total) WHERE {{ "
        f"?s <{VOCAB_SOURCE}> ?src . ?s <{VOCAB_NCHARS}> ?n }} "
        f"GROUP BY ?src HAVING (?total > 7400)",
    )
    out["total"] = np.floor(out["total"].astype(float) * 1e4) / 1e4
    return out.sort_values("src").reset_index(drop=True)


SQL_SPARQL_HAVING = """
SELECT source AS src,
       FLOOR(SUM(n_chars) * 10000.0) / 10000 AS total
FROM documents
GROUP BY source
HAVING SUM(n_chars) > 7400
"""


def q_sparql_expr_filter(sf_dir: str):
    """General-expression FILTER through the compiler: arithmetic over
    a bound variable with the P13 parseFloat row-drop coercion —
    FILTER(?n * 2 - 100 > 800) over the mapped document triples."""
    from ..query.sparql import run_select

    triples = q_rml_documents_triples(sf_dir)
    out = run_select(
        triples,
        f"SELECT ?s ?n WHERE {{ ?s <{VOCAB_NCHARS}> ?n "
        f"FILTER(?n * 2 - 100 > 800) }}",
    )
    return out.sort_values("s").reset_index(drop=True)


SQL_SPARQL_EXPR_FILTER = """
SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS s,
       CAST(n_chars AS VARCHAR) AS n
FROM documents
WHERE n_chars * 2 - 100 > 800
"""


def q_sparql_subselect(sf_dir: str):
    """'{ SELECT … }' subquery through the compiler: an aggregate
    subselect (per-source SUM of chars) joins back onto the outer BGP,
    and the outer FILTER sees the subselect's alias — every document in
    a source whose total chars exceed the threshold. Only string/int
    columns projected (the float aggregate stays internal)."""
    from ..query.sparql import run_select

    triples = q_rml_documents_triples(sf_dir)
    out = run_select(
        triples,
        f"SELECT ?s ?src WHERE {{ "
        f"{{ SELECT ?src (SUM(?n) AS ?total) WHERE {{ "
        f"?d <{VOCAB_SOURCE}> ?src . ?d <{VOCAB_NCHARS}> ?n }} "
        f"GROUP BY ?src }} "
        f"?s <{VOCAB_SOURCE}> ?src FILTER(?total > 7400) }}",
    )
    return out.sort_values("s").reset_index(drop=True)


SQL_SPARQL_SUBSELECT = """
WITH agg AS (
    SELECT source, SUM(n_chars) AS total FROM documents GROUP BY source
)
SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS s, source AS src
FROM documents JOIN agg USING (source)
WHERE agg.total > 7400
"""


def q_sparql_not_exists(sf_dir: str):
    """SPARQL negation through the compiler: FILTER NOT EXISTS as a
    distributed anti-join (shuffle.bindings_join how='anti') — leaf
    parts of the derived hierarchy (no inbound childOf edge)."""
    from ..query.sparql import run_select

    return run_select(
        _part_triples(sf_dir),
        f"SELECT ?s ?n WHERE {{ ?s <{VOCAB_PNAME}> ?n . "
        f"FILTER NOT EXISTS {{ ?y <{VOCAB_CHILDOF}> ?s }} }}",
    )


SQL_SPARQL_NOT_EXISTS = """
SELECT 'part:' || CAST(p_partkey AS VARCHAR) AS s, p_name AS n
FROM part
WHERE p_partkey NOT IN (
    SELECT p_partkey // 2 FROM part WHERE p_partkey > 1
)
"""


def q_sparql_values_bind(sf_dir: str):
    """SPARQL VALUES inline data + BIND expression through the SELECT
    compiler: restrict docs to two languages via a VALUES block
    (broadcast-joined — never a shuffle) and BIND the source-string
    length as a derived column."""
    from ..query.sparql import run_select

    triples = q_rml_documents_triples(sf_dir)
    return run_select(
        triples,
        f"SELECT ?s ?src ?nlen WHERE {{ "
        f"?s <{VOCAB_SOURCE}> ?src . ?s <{VOCAB_LANG}> ?l . "
        f'VALUES ?l {{ "en" "fr" }} . '
        f"BIND(STRLEN(?src) AS ?nlen) }}",
    )


SQL_SPARQL_VALUES_BIND = """
SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS s, source AS src,
       LENGTH(source) AS nlen
FROM documents WHERE lang IN ('en', 'fr')
"""


def q_sparql_count_distinct(sf_dir: str):
    """SPARQL COUNT(DISTINCT ?v) with GROUP BY through the compiler:
    distinct languages per source. Distributed bucketed dedup of the
    (src, lang) projection feeds a per-group Count — the distinct set
    never lands on the driver."""
    from ..query.sparql import run_select

    triples = q_rml_documents_triples(sf_dir)
    out = run_select(
        triples,
        f"SELECT ?src (COUNT(DISTINCT ?l) AS ?nlang) WHERE {{ "
        f"?s <{VOCAB_SOURCE}> ?src . ?s <{VOCAB_LANG}> ?l }} "
        f"GROUP BY ?src",
    )
    return out.sort_values("src").reset_index(drop=True)


SQL_SPARQL_COUNT_DISTINCT = """
SELECT source AS src, COUNT(DISTINCT lang) AS nlang
FROM documents GROUP BY source
"""

VOCAB_INLANG = "http://graft.example/vocab#inLang"
VOCAB_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
VOCAB_DOCCLASS = "http://graft.example/vocab#Document"


def q_sparql_construct(sf_dir: str):
    """SPARQL CONSTRUCT through the compiler: re-shape the documents
    graph into (doc inLang lang) + (doc rdf:type Document) triples.
    Fully distributed — template instantiation per batch, set semantics
    via the bucketed pair-dedup shuffle; the driver only sees the final
    Dataset."""
    from ..query.sparql import run_construct

    triples = q_rml_documents_triples(sf_dir)
    return run_construct(
        triples,
        f"CONSTRUCT {{ ?s <{VOCAB_INLANG}> ?l . "
        f"?s <{VOCAB_TYPE}> <{VOCAB_DOCCLASS}> }} "
        f"WHERE {{ ?s <{VOCAB_LANG}> ?l }}",
    )


SQL_SPARQL_CONSTRUCT = f"""
SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS subj,
       '{VOCAB_INLANG}' AS pred, lang AS obj
FROM documents
UNION
SELECT 'doc:' || CAST(doc_id AS VARCHAR), '{VOCAB_TYPE}',
       '{VOCAB_DOCCLASS}'
FROM documents
"""


def q_media_image_features(sf_dir: str):
    """Multimodal image path E2E (rows-only — decode is not
    SQL-expressible): the deterministic media fixture corpus
    (fixtures.gen_media_table — testdata ships no media column) through
    the ImageDecoder stage. Covers the real from-scratch codecs (binary
    PPM/PGM, COMPRESSED PNG with scanline filters 0-4, GIF/LZW, baseline
    JPEG over 4:4:4/4:2:0/4:2:2 + restart intervals), the GFIMG fixture
    format, AND the poison path: 'poison' rows are TRUNCATED JPEGs that
    must come out as (-1,-1,-1,-1.0,'') sentinel rows, never a crash.
    Exact phash/mean values are pinned by pytest goldens
    (tests/test_dataops.py)."""
    from ..fixtures import media_dataset
    from ..stages.multimodal import ImageDecoder
    from ..stages.proc_cache import process_cached_stage

    media = media_dataset(240).map_batches(
        lambda df: df[df["kind"].isin(["ppm", "pgm", "png", "gif",
                                       "jpeg", "gfimg", "poison"])],
        batch_format="pandas",
    )
    out = media.map_batches(
        process_cached_stage(ImageDecoder, data_col="payload"),
        batch_format="pandas",
    ).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def q_media_image_neardup(sf_dir: str):
    """Image perceptual-hash near-dup (rows-only — pixel decode is not
    SQL-expressible): dHash + 16-bit LSH bands + thumbnail-MSE verify
    over the planted-near-dup corpus (fixtures.neardup_media_dataset:
    every id≡1 (mod 4) is a brightness-shifted copy of id−1 → 75
    planted pairs at n=300, hamming 0 / MSE 1.0; poison rows ride
    along). Pinned by pytest (tests/test_dataops.py)."""
    from ..fixtures import neardup_media_dataset
    from ..stages.multimodal import image_neardup_pairs

    pairs = image_neardup_pairs(neardup_media_dataset(300)).to_pandas()
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_media_audio_neardup(sf_dir: str):
    """Audio fingerprint near-dup (rows-only — sample decode is not
    SQL-expressible): 64-bit gradient-sign fingerprint + 16-bit LSH
    bands + envelope-MSE verify over the planted-near-dup corpus
    (fixtures.neardup_audio_dataset: every id≡1 (mod 4) is an
    amplitude-shifted copy of id−1 → 75 planted pairs at n=300,
    hamming 0 / MSE (1/128)²; poison rows ride along). Pinned by
    pytest (tests/test_dataops.py)."""
    from ..fixtures import neardup_audio_dataset
    from ..stages.multimodal import audio_neardup_pairs

    pairs = audio_neardup_pairs(neardup_audio_dataset(300)).to_pandas()
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_media_audio_features(sf_dir: str):
    """Multimodal audio path E2E (rows-only): RIFF PCM-16 WAV via the
    stdlib wave module plus the GFAUD fixture format through
    AudioFeatureExtractor. frame_means (list column) is dropped for a
    scalar-only driver schema; rms/duration pinned by pytest goldens."""
    from ..fixtures import media_dataset
    from ..stages.multimodal import AudioFeatureExtractor
    from ..stages.proc_cache import process_cached_stage

    media = media_dataset(240).map_batches(
        lambda df: df[df["kind"].isin(["wav", "gfaud"])],
        batch_format="pandas",
    )
    out = media.map_batches(
        process_cached_stage(AudioFeatureExtractor, data_col="payload"),
        batch_format="pandas",
    ).to_pandas()
    out = out.drop(columns=["frame_means"])
    return out.sort_values("media_id").reset_index(drop=True)


def q_docs_quality_filter(sf_dir: str):
    """Quality scoring E2E: TextQualityScorer over the documents table,
    keep score ≥ 0.5 — the SQL oracle recomputes the whole composite
    (length/punct/digit/stopword signals) from scratch. Ratios round to
    6 decimals before the composite (matching the scorer); the final
    score compares at 4 decimals (float parity rule)."""
    from ..stages.proc_cache import process_cached_stage

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    scored = ds.map_batches(
        process_cached_stage(TextQualityScorer), batch_format="pandas"
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.loc[df["quality_score"] >= 0.5, ["doc_id", "quality_score"]]
        return out.assign(quality_score=out["quality_score"].round(4))

    return scored.map_batches(finish, batch_format="pandas")


SQL_DOCS_QUALITY_FILTER = r"""
WITH sig AS (
    SELECT doc_id,
           len(text) AS n_chars,
           ROUND(len(regexp_extract_all(text, '[^\w\s]')) * 1.0
                 / GREATEST(len(text), 1), 6)                  AS punct_ratio,
           ROUND(len(regexp_extract_all(text, '\d')) * 1.0
                 / GREATEST(len(text), 1), 6)                  AS digit_ratio,
           ROUND(len(list_filter(regexp_extract_all(lower(text), '[a-z'']+'),
                     t -> t IN ('the','and','of','a','an','to','in','is','it',
                                'that','for','on','as','with','was','are',
                                'be','this','at','by'))) * 1.0
                 / GREATEST(len(regexp_extract_all(lower(text), '[a-z'']+')),
                            1), 6)                             AS stop_ratio
    FROM documents
), score AS (
    SELECT doc_id,
           ROUND(LEAST(n_chars, 2000) / 2000.0 * 0.4
                 + (1 - LEAST(punct_ratio * 4, 1)) * 0.2
                 + (1 - LEAST(digit_ratio * 4, 1)) * 0.2
                 + LEAST(stop_ratio * 4, 1) * 0.2, 6)          AS q
    FROM sig
)
SELECT doc_id, ROUND(q, 4) AS quality_score FROM score WHERE q >= 0.5
"""


def q_docs_hash_split(sf_dir: str):
    """Deterministic train/test split by keyed md5 (stages/sampling):
    reproducible across runs/cluster sizes and stable under corpus
    growth — the property random_sample lacks. Oracled: the SQL replays
    the exact md5-prefix rule."""
    from ..stages.sampling import hash_split

    ds = _t(sf_dir, "documents", ["doc_id"])
    return hash_split(ds, key_col="doc_id", test_pct=10.0)


SQL_DOCS_HASH_SPLIT = """
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':graft-split'), 1, 4)
                 < '1999' THEN 'test' ELSE 'train' END AS split
FROM documents
"""


# ---------------------------------------------------------------------------
# Corpus curation (beyond-reference family, stages/curation.py) —
# Gopher-style repetition filters, benchmark decontamination,
# per-source (per-domain) quota sampling
# ---------------------------------------------------------------------------

def q_lineitem_price_quantiles(sf_dir: str):
    """Approximate per-flag quantiles of the CONTINUOUS extendedprice
    column via the fixed-grid histogram sketch (r4 verdict item #7 —
    the documented continuous-column seam): the shuffle is bounded by
    bins×groups, and every double-precision step (global lo/hi, bin
    rule, midpoint) is replayed verbatim by the SQL oracle."""
    from ..stages.stats import group_quantiles_sketch

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    out = group_quantiles_sketch(
        ds, key="l_returnflag", col="l_extendedprice",
        qs=(0.25, 0.5, 0.75, 0.9), num_bins=4096,
    )
    return (
        out.to_pandas()
        .rename(columns={"l_returnflag": "flag"})
        .sort_values(["flag", "q_pct"])
        .reset_index(drop=True)[["flag", "q_pct", "value"]]
    )


SQL_LINEITEM_PRICE_QUANTILES = """
WITH m AS (
    SELECT MIN(l_extendedprice) AS lo,
           (MAX(l_extendedprice) - MIN(l_extendedprice)) / 4096.0 AS w
    FROM lineitem
),
b AS (
    SELECT l_returnflag AS flag,
           LEAST(CAST(FLOOR((l_extendedprice - m.lo) / m.w) AS BIGINT),
                 4095) AS bin
    FROM lineitem, m
    WHERE l_extendedprice IS NOT NULL
),
q AS (
    SELECT flag, unnest([25, 50, 75, 90]) AS q_pct,
           unnest(quantile_disc(bin, [0.25, 0.5, 0.75, 0.9])) AS bin
    FROM b GROUP BY flag
)
SELECT q.flag, CAST(q.q_pct AS BIGINT) AS q_pct,
       FLOOR((m.lo + (q.bin + 0.5) * m.w) * 1000000) / 1000000 AS value
FROM q, m
ORDER BY flag, q_pct
"""


def q_docs_length_quantiles(sf_dir: str):
    """Exact per-language length quantiles (percentile_disc semantics)
    via the distributed counting-sort histogram (stages/stats) — the
    shuffle moves (lang, n_chars, count) rows, never documents. Oracle:
    DuckDB quantile_disc lists unnested."""
    from ..stages.stats import group_quantiles

    ds = _t(sf_dir, "documents", ["lang", "n_chars"])
    out = group_quantiles(
        ds, key="lang", col="n_chars", qs=(0.25, 0.5, 0.75, 0.9)
    )
    return out.map_batches(
        lambda df: pd.DataFrame(
            {
                "lang": df["lang"],
                "q_pct": df["q_pct"].astype("int64"),
                "value": df["value"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


SQL_DOCS_LENGTH_QUANTILES = """
WITH a AS (
    SELECT lang,
           quantile_disc(n_chars, [0.25, 0.5, 0.75, 0.9]) AS vs
    FROM documents GROUP BY lang
)
SELECT lang,
       unnest([25, 50, 75, 90]) AS q_pct,
       unnest(vs) AS value
FROM a
"""


def q_docs_repetition(sf_dir: str):
    """Gopher/MassiveText repetition signals, word-level: duplicate-word
    fraction and most-frequent-bigram character coverage, fully
    vectorized (explode + groupby, no per-document loop). Oracle:
    DuckDB recomputes both from a parallel-unnest word/position table;
    ratios round to 6 decimals on both sides."""
    from ..stages.curation import repetition_stats_batch

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        repetition_stats_batch, batch_format="pandas"
    ).map_batches(
        lambda df: df[
            ["doc_id", "n_words", "dup_word_frac", "top_bigram_char_frac"]
        ],
        batch_format="pandas",
    )


SQL_DOCS_REPETITION = r"""
WITH split AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'),
                       w -> w <> '') AS ws
    FROM documents
),
words AS (
    SELECT doc_id, unnest(ws) AS w,
           unnest(range(1, len(ws) + 1)) AS ord
    FROM split
),
per_doc AS (
    SELECT doc_id, COUNT(*) AS n_words,
           COUNT(DISTINCT w) AS n_uniq,
           SUM(length(w)) AS word_chars
    FROM words GROUP BY doc_id
),
grams AS (
    SELECT a.doc_id, a.w || ' ' || b.w AS g, COUNT(*) AS cnt
    FROM words a
    JOIN words b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
    GROUP BY a.doc_id, g
),
top AS (
    SELECT doc_id, g, cnt,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY cnt DESC, g ASC) AS rn
    FROM grams
)
SELECT d.doc_id,
       COALESCE(p.n_words, 0) AS n_words,
       ROUND(COALESCE(1.0 - p.n_uniq * 1.0 / p.n_words, 0), 6)
           AS dup_word_frac,
       ROUND(COALESCE(t.cnt * (length(t.g) - 1) * 1.0 / p.word_chars, 0),
             6) AS top_bigram_char_frac
FROM documents d
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN top t ON t.doc_id = d.doc_id AND t.rn = 1
"""


def q_docs_decontaminate(sf_dir: str):
    """Benchmark decontamination: deterministic probe set (the first 48
    chars of every doc_id % 50 == 0 document — a stand-in eval set),
    broadcast once via ray.put, vectorized substring scan per batch →
    (doc_id, contaminated). Oracle: correlated EXISTS over the same
    probe CTE."""
    from ..stages.curation import contamination_flags

    probe_df = (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            lambda df: df[df["doc_id"] % 50 == 0], batch_format="pandas"
        )
        .to_pandas()
    )
    probes = [t[:48] for t in probe_df["text"].fillna("")]
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return contamination_flags(ds, probes).map_batches(
        lambda df: df[["doc_id", "contaminated"]], batch_format="pandas"
    )


def q_docs_bloom_decontam(sf_dir: str):
    """Bloom-filter decontamination (stages/bloom): the benchmark's
    8-gram set builds a 65536-bit filter DISTRIBUTED (per-block
    partial bitsets OR-reduced), the fixed-size bytes broadcast once,
    and the corpus scans map-side. Every bit is a pure md5 function,
    so the oracle replays membership — false positives included —
    exactly."""
    from ..stages.bloom import bloom_ngram_flags, build_bloom

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    bench = docs.map_batches(
        lambda df: df[df["doc_id"] % 50 == 0], batch_format="pandas")

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split()
        lens = words.str.len().to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"g": pd.Series([], dtype=object)})
        flat = pd.Series(
            np.concatenate([np.asarray(w, dtype=object)
                            for w in words if len(w)]),
            dtype=object)
        gram = flat.copy()
        for sh in range(1, 8):
            gram = gram + " " + flat.shift(-sh)
        ends = np.cumsum(lens)
        starts = ends - lens
        pos = np.arange(len(flat)) - np.repeat(starts, lens)
        valid = pos + 8 <= np.repeat(lens, lens)
        return pd.DataFrame(
            {"g": gram.to_numpy(object)[valid]}).drop_duplicates()

    bloom = build_bloom(
        bench.map_batches(grams, batch_format="pandas"),
        "g", m_bits=65536, k=4)
    out = bloom_ngram_flags(docs, bloom, n=8, m_bits=65536, k=4)
    return out.map_batches(
        lambda df: df[["doc_id", "n_grams", "n_hit", "contaminated"]],
        batch_format="pandas",
    )


SQL_DOCS_BLOOM_DECONTAM = r"""
WITH pw AS (
    SELECT regexp_extract_all(COALESCE(text, ''), '\S+') AS ws,
           CAST(len(regexp_extract_all(COALESCE(text, ''), '\S+'))
                AS BIGINT) AS n
    FROM documents WHERE doc_id % 50 = 0
),
pg AS (
    SELECT DISTINCT array_to_string(
        ws[CAST(s.i AS INT) : CAST(s.i + 7 AS INT)], ' ') AS g
    FROM pw, unnest(generate_series(1, n - 7)) s(i)
    WHERE n >= 8
),
bits AS (
    SELECT DISTINCT
        CAST(CONCAT('0x', substr(md5('graft-bloom|'
            || CAST(t.j AS VARCHAR) || '|' || g), 1, 10))
            AS BIGINT) % 65536 AS pos
    FROM pg, UNNEST(generate_series(0, 3)) t(j)
),
dw AS (
    SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\S+') AS ws,
           CAST(len(regexp_extract_all(COALESCE(text, ''), '\S+'))
                AS BIGINT) AS n
    FROM documents
),
dg AS (
    SELECT DISTINCT doc_id, array_to_string(
        ws[CAST(s.i AS INT) : CAST(s.i + 7 AS INT)], ' ') AS g
    FROM dw, unnest(generate_series(1, n - 7)) s(i)
    WHERE n >= 8
),
hit AS (
    SELECT d.doc_id, d.g,
           SUM(CASE WHEN CAST(CONCAT('0x', substr(md5('graft-bloom|'
               || CAST(t.j AS VARCHAR) || '|' || d.g), 1, 10))
               AS BIGINT) % 65536 IN (SELECT pos FROM bits)
               THEN 1 ELSE 0 END) AS nbits
    FROM dg d, UNNEST(generate_series(0, 3)) t(j)
    GROUP BY d.doc_id, d.g
),
agg AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN nbits = 4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit
    FROM hit GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_grams, 0) AS n_grams,
       COALESCE(a.n_hit, 0) AS n_hit,
       CAST(COALESCE(a.n_hit, 0) > 0 AS BIGINT) AS contaminated
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q_events_hll_by_type(sf_dir: str):
    """Per-event-type HLL distinct-user estimates
    (stages/sketches.approx_distinct_hll_grouped — one register row per
    group, fully distributed fold, never on the driver) vs a
    register-exact per-group SQL replay."""
    from ..stages.sketches import approx_distinct_hll_grouped

    out = approx_distinct_hll_grouped(
        _t(sf_dir, "events", ["event_type", "user_id"]),
        "event_type", "user_id", b=10).to_pandas()
    out["m"] = out["m"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)[
        ["event_type", "m", "est"]]


SQL_EVENTS_HLL_BY_TYPE = """
WITH h AS (
    SELECT event_type AS k,
           CAST(CONCAT('0x', substr(md5('graft-hll|'
               || CAST(user_id AS VARCHAR)), 1, 10)) AS BIGINT) AS hv
    FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
r AS (
    SELECT k, hv // 1073741824 AS idx, hv % 1073741824 AS rem FROM h
),
reg AS (
    SELECT k, idx,
           MAX(CASE WHEN rem = 0 THEN 31
               ELSE 30 - CAST(FLOOR(LOG2(rem)) AS BIGINT) END) AS M
    FROM r GROUP BY k, idx
),
s AS (
    SELECT k, SUM(POWER(2.0, -M)) AS sp,
           CAST(COUNT(*) AS BIGINT) AS nreg
    FROM reg GROUP BY k
),
e AS (
    SELECT k, (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0
               / (sp + (1024 - nreg) * 1.0) AS raw,
           1024 - nreg AS zeros
    FROM s
)
SELECT k AS event_type,
       CAST(1024 AS BIGINT) AS m,
       FLOOR(1e4 * CASE WHEN raw <= 2560.0 AND zeros > 0
                        THEN 1024.0 * LN(1024.0 / zeros)
                        ELSE raw END) / 1e4 AS est
FROM e ORDER BY event_type
"""


def q_events_distinct_hll(sf_dir: str):
    """HyperLogLog distinct-user estimate over events
    (stages/sketches.approx_distinct_hll): m-byte register partials
    per block, driver max-merge — vs a register-exact SQL replay
    (same md5 top-bits index / leftmost-one rule, same α·m²/Σ2^−M
    estimator and small-range correction, FLOOR-1e4 parity)."""
    from ..stages.sketches import approx_distinct_hll

    return approx_distinct_hll(
        _t(sf_dir, "events", ["user_id"]), "user_id", b=10)


SQL_EVENTS_DISTINCT_HLL = """
WITH h AS (
    SELECT CAST(CONCAT('0x', substr(md5('graft-hll|'
               || CAST(user_id AS VARCHAR)), 1, 10)) AS BIGINT) AS hv
    FROM events WHERE user_id IS NOT NULL
),
r AS (
    SELECT hv // 1073741824 AS idx, hv % 1073741824 AS rem FROM h
),
reg AS (
    SELECT idx,
           MAX(CASE WHEN rem = 0 THEN 31
               ELSE 30 - CAST(FLOOR(LOG2(rem)) AS BIGINT) END) AS M
    FROM r GROUP BY idx
),
s AS (
    SELECT SUM(POWER(2.0, -M)) AS sp,
           CAST(COUNT(*) AS BIGINT) AS nreg
    FROM reg
),
e AS (
    SELECT (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0
               / (sp + (1024 - nreg) * 1.0) AS raw,
           1024 - nreg AS zeros
    FROM s
)
SELECT CAST(1024 AS BIGINT) AS m,
       FLOOR(1e4 * CASE WHEN raw <= 2560.0 AND zeros > 0
                        THEN 1024.0 * LN(1024.0 / zeros)
                        ELSE raw END) / 1e4 AS est
FROM e
"""


def q_events_type_cms(sf_dir: str):
    """Count-Min sketch frequency estimates
    (stages/sketches.count_min_sketch, Cormode & Muthukrishnan 2005):
    4×3 additive counter sketch over events.event_type built from
    per-block bincount partials, then the min-over-rows point estimate
    for every distinct type. width=4 < |domain| forces slot collisions,
    so the estimates genuinely exercise the upper-bound min rule — the
    oracle replays counters AND estimator register-exactly (same
    md5-prefix slot rule)."""
    from ..stages.sketches import cms_estimate, count_min_sketch

    ev = _t(sf_dir, "events", ["event_type"])
    sketch = count_min_sketch(ev, "event_type", width=4, depth=3)
    keys = sorted(
        ev.map_batches(
            lambda df: df.drop_duplicates(), batch_format="pandas"
        )
        .to_pandas()["event_type"]
        .dropna()
        .unique()
    )
    est = cms_estimate(sketch, keys, width=4, depth=3)
    est = est.rename(columns={"key": "event_type"})
    est["est"] = est["est"].astype(np.int64)
    return est.sort_values("event_type").reset_index(drop=True)


SQL_EVENTS_TYPE_CMS = """
WITH tc AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events WHERE event_type IS NOT NULL GROUP BY event_type
),
hashed AS (
    SELECT i, event_type, cnt,
           CAST(CONCAT('0x', substr(md5('graft-cms' || CAST(i AS VARCHAR)
               || '|' || event_type), 1, 10)) AS BIGINT) % 4 AS slot
    FROM tc CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS i)
),
counters AS (
    SELECT i, slot, SUM(cnt) AS c FROM hashed GROUP BY i, slot
)
SELECT h.event_type, CAST(MIN(c.c) AS BIGINT) AS est
FROM hashed h JOIN counters c ON c.i = h.i AND c.slot = h.slot
GROUP BY h.event_type
ORDER BY h.event_type
"""


def _web_edge_frame(df: pd.DataFrame,
                    with_anchor: bool = False) -> pd.DataFrame:
    """doc_id rows → deterministic (src_url, href[, anchor_text]) pairs
    exercising every resolution case — absolute w/ case-varied host,
    protocol-relative, root-relative, query-only, path-relative,
    ``../`` dot segment, fragment-only (self), and a non-http scheme
    (dropped). Mirrored exactly by ``_WEB_EDGES_SQL``."""
    i = df["doc_id"].astype(np.int64)
    tld = pd.Series(
        np.select([(i % 3) == 0, (i % 3) == 1],
                  ["com", "co.uk"], "org"),
        index=df.index)
    www = pd.Series(np.where(i % 2 == 0, "www.", ""), index=df.index)
    url = ("http://" + www + "site" + (i % 5).astype(str) + "."
           + tld + "/a/b/page" + (i % 20).astype(str) + ".html")
    m = i % 8
    href = pd.Series(np.select(
        [m == 0, m == 1, m == 2, m == 3, m == 4, m == 5, m == 6],
        ["http://Other" + (i % 3).astype(str) + ".COM/x",
         "//cdn-site" + (i % 4).astype(str) + ".net/lib.js",
         "/root/doc" + (i % 6).astype(str),
         "?q=" + (i % 9).astype(str),
         "rel" + (i % 7).astype(str) + "/sub.html",
         "../up" + (i % 5).astype(str) + ".html",
         "#frag"],
        "mailto:user@ex.org"), index=df.index, dtype=object)
    out = pd.DataFrame({"src_url": url.astype(object), "href": href})
    if with_anchor:
        a = i % 5
        out["anchor_text"] = pd.Series(np.select(
            [a == 0, a == 1, a == 2, a == 3],
            ["Click Here!",
             "read more",
             "Home page 3",
             "the-best_Site 42"],
            ""), index=df.index, dtype=object)
    return out


def q_web_host_graph(sf_dir: str):
    """Host-level web-link graph (stages/weblinks.host_link_graph) over
    the doc_id-derived edge set (``_web_edge_frame``), resolved per RFC
    3986 §5 (documented subset), mapped to registered domains and
    counted. The oracle replays the IDENTICAL resolution chain (every
    step an RE2 regex; the dot-collapse round unrolled twice — fixture
    hrefs hold at most one dot segment) and domain rule."""
    from ..stages.weblinks import host_link_graph

    docs = _t(sf_dir, "documents", ["doc_id"])
    return host_link_graph(docs.map_batches(_web_edge_frame,
                                            batch_format="pandas"))


# Shared SQL fragments for the web-link family (host graph / host
# PageRank / anchor top-k) — one definition of the doc_id-derived edge
# set, the RFC 3986 resolution chain, and the host→registered-domain
# mapping, so every oracle replays the IDENTICAL rules.
_WEB_EDGES_SQL = """
  SELECT
    'http://' || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END ||
    'site' || CAST(doc_id % 5 AS VARCHAR) || '.' ||
    CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
         ELSE 'org' END ||
    '/a/b/page' || CAST(doc_id % 20 AS VARCHAR) || '.html' AS src_url,
    CASE doc_id % 8
      WHEN 0 THEN 'http://Other' || CAST(doc_id % 3 AS VARCHAR)
                  || '.COM/x'
      WHEN 1 THEN '//cdn-site' || CAST(doc_id % 4 AS VARCHAR)
                  || '.net/lib.js'
      WHEN 2 THEN '/root/doc' || CAST(doc_id % 6 AS VARCHAR)
      WHEN 3 THEN '?q=' || CAST(doc_id % 9 AS VARCHAR)
      WHEN 4 THEN 'rel' || CAST(doc_id % 7 AS VARCHAR) || '/sub.html'
      WHEN 5 THEN '../up' || CAST(doc_id % 5 AS VARCHAR) || '.html'
      WHEN 6 THEN '#frag'
      ELSE 'mailto:user@ex.org' END AS href
  FROM documents
"""


def _web_resolve_sql(extra: str = "") -> str:
    r"""CTE chain ``parts → … → keep`` resolving e(src_url, href
    {extra}) per the documented RFC 3986 subset — regex-for-regex the
    stages/weblinks.resolve_href_batch chain (dot-collapse round
    unrolled twice; fixture hrefs hold at most one dot segment).
    ``extra`` is a trailing ``, col`` list passed through every CTE."""
    return rf"""
parts AS (
  SELECT src_url{extra},
    regexp_replace(href, '#.*$', '') AS h0,
    regexp_extract(src_url,
      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*') AS origin,
    regexp_extract(src_url, '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1) AS scheme,
    regexp_replace(substr(src_url, length(regexp_extract(src_url,
      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*')) + 1),
      '[?#].*$', '') AS spath
  FROM e
),
r0 AS (
  SELECT src_url{extra},
    CASE
      WHEN h0 = '' THEN regexp_replace(src_url, '#.*$', '')
      WHEN regexp_matches(h0, '^[a-zA-Z][a-zA-Z0-9+.-]*:') THEN h0
      WHEN h0 LIKE '//%' THEN scheme || ':' || h0
      WHEN h0 LIKE '/%' THEN origin || h0
      WHEN h0 LIKE '?%' THEN origin || spath || h0
      ELSE origin ||
           CASE WHEN regexp_replace(spath, '[^/]*$', '') = ''
                THEN '/' ELSE regexp_replace(spath, '[^/]*$', '') END
           || h0
    END AS raw
  FROM parts
),
r1 AS (
  SELECT src_url{extra},
    CASE WHEN regexp_extract(raw, '^([a-zA-Z][a-zA-Z0-9+.-]*:)') <> ''
    THEN lower(regexp_extract(raw, '^([a-zA-Z][a-zA-Z0-9+.-]*:)'))
         || substr(raw, length(regexp_extract(raw,
              '^([a-zA-Z][a-zA-Z0-9+.-]*:)')) + 1)
    ELSE raw END AS res
  FROM r0
),
sp AS (
  SELECT src_url{extra}, res,
    regexp_extract(res, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*') AS org2,
    regexp_replace(substr(res, length(regexp_extract(res,
      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*')) + 1),
      '\?.*$', '') AS p0,
    regexp_extract(substr(res, length(regexp_extract(res,
      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*')) + 1), '(\?.*)$', 1) AS qs
  FROM r1
),
c1 AS (
  SELECT src_url{extra}, org2, qs,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(p0,
        '/\./', '/', 'g'), '/\.$', '/'), '^/\.\./', '/'),
        '^/\.\.$', '/'), '/[^/?#]+/\.\./', '/'),
        '/[^/?#]+/\.\.$', '/') AS p1
  FROM sp
),
c2 AS (
  SELECT src_url{extra}, org2 ||
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(p1,
        '/\./', '/', 'g'), '/\.$', '/'), '^/\.\./', '/'),
        '^/\.\.$', '/'), '/[^/?#]+/\.\./', '/'),
        '/[^/?#]+/\.\.$', '/') || qs AS resolved
  FROM c1
),
keep AS (
  SELECT src_url{extra}, resolved FROM c2
  WHERE regexp_matches(resolved, '^https?://')
)"""


_WEB_HOST_EXPR = (
    "NULLIF(rtrim(lower(regexp_extract({col}, "
    "'^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)), "
    "'.'), '')"
)
_WEB_DOM_EXPR = (
    r"COALESCE(NULLIF(regexp_extract({h}, "
    r"'([^.]+\.(?:co\.uk|org\.uk|ac\.uk|gov\.uk|com\.au|net\.au"
    r"|org\.au|co\.jp|co\.in|co\.kr|com\.br|com\.cn|com\.mx)"
    r"|[^.]+\.[^.]+)$', 1), ''), {h})"
)

_WEB_DOMS_SQL = f"""
hosts AS (
  SELECT
    {_WEB_HOST_EXPR.format(col="src_url")} AS sh,
    {_WEB_HOST_EXPR.format(col="resolved")} AS dh
  FROM keep
),
doms AS (
  SELECT
    {_WEB_DOM_EXPR.format(h="sh")} AS src_domain,
    {_WEB_DOM_EXPR.format(h="dh")} AS dst_domain
  FROM hosts WHERE sh IS NOT NULL AND dh IS NOT NULL
)"""


SQL_WEB_HOST_GRAPH = f"""
WITH e AS ({_WEB_EDGES_SQL}),
{_web_resolve_sql()},
{_WEB_DOMS_SQL}
SELECT src_domain, dst_domain, CAST(COUNT(*) AS BIGINT) AS n_links
FROM doms GROUP BY src_domain, dst_domain
ORDER BY src_domain, dst_domain
"""


def q_web_page_links(sf_dir: str):
    """Host-level link graph over the REAL synthetic pages corpus
    (rows-only — html anchor extraction is not SQL-expressible):
    pages → forge anchor walk (extract/html_text.py, the byte-identical
    extractor) → RFC 3986 resolution → registered-domain edge counts.
    Pinned by pytest goldens on the deterministic fixture corpus."""
    from ..stages.weblinks import host_link_graph, page_link_edges

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        n = max(64, int(float(sf) * 60_000))
    except ValueError:
        n = 200
    pages = rd.from_arrow(gen_pages_table(n))
    return host_link_graph(page_link_edges(pages))


def q_web_anchor_topk(sf_dir: str, k: int = 3):
    """Aggregated anchor text per target domain (stages/weblinks.
    anchor_term_topk) — the web-search "what the rest of the web calls
    this site" signal: doc_id-derived (src_url, href, anchor_text)
    rows → resolve → registered domain → lowercase [a-z0-9]+ tokens →
    per-(domain, term) counts → top-k per domain (ties by term). The
    oracle replays the identical chain with regexp_extract_all +
    ROW_NUMBER."""
    from ..stages.weblinks import anchor_term_topk

    docs = _t(sf_dir, "documents", ["doc_id"])
    edges = docs.map_batches(
        lambda df: _web_edge_frame(df, with_anchor=True),
        batch_format="pandas")
    out = anchor_term_topk(edges, k=k).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["dst_domain", "term"]).reset_index(drop=True)[
        ["dst_domain", "term", "n"]]


_WEB_ANCHOR_CASE = """,
    CASE doc_id % 5
      WHEN 0 THEN 'Click Here!'
      WHEN 1 THEN 'read more'
      WHEN 2 THEN 'Home page 3'
      WHEN 3 THEN 'the-best_Site 42'
      ELSE '' END AS anchor_text"""
_WEB_EDGES_ANCHOR_SQL = _WEB_EDGES_SQL.replace(
    "END AS href\n  FROM documents",
    "END AS href" + _WEB_ANCHOR_CASE + "\n  FROM documents")

SQL_WEB_ANCHOR_TOPK = f"""
WITH e AS ({_WEB_EDGES_ANCHOR_SQL}),
{_web_resolve_sql(", anchor_text")},
ahosts AS (
  SELECT {_WEB_HOST_EXPR.format(col="resolved")} AS dh, anchor_text
  FROM keep
),
adoms AS (
  SELECT {_WEB_DOM_EXPR.format(h="dh")} AS dst_domain, anchor_text
  FROM ahosts WHERE dh IS NOT NULL
),
toks AS (
  SELECT dst_domain,
         unnest(regexp_extract_all(lower(anchor_text), '[a-z0-9]+'))
             AS term
  FROM adoms
),
counts AS (
  SELECT dst_domain, term, CAST(COUNT(*) AS BIGINT) AS n
  FROM toks GROUP BY dst_domain, term
),
ranked AS (
  SELECT dst_domain, term, n,
         ROW_NUMBER() OVER (PARTITION BY dst_domain
                            ORDER BY n DESC, term) AS rk
  FROM counts
)
SELECT dst_domain, term, n FROM ranked WHERE rk <= 3
ORDER BY dst_domain, term
"""


def q_web_host_pagerank(sf_dir: str, num_iters: int = 2):
    """Domain authority: PageRank over the host-level link graph —
    host_link_graph composed into stages/graph.pagerank (string node
    ids; each distinct (src_domain, dst_domain) pair is one edge;
    dst-only domains exercise the dangling path). Oracle: the shared
    resolution-chain SQL feeding the same unrolled power-iteration CTEs
    as graph_pagerank; both sides round to 8 decimals."""
    from ..stages.graph import pagerank
    from ..stages.weblinks import host_link_graph

    docs = _t(sf_dir, "documents", ["doc_id"])
    hg = host_link_graph(docs.map_batches(_web_edge_frame,
                                          batch_format="pandas"))
    pe = hg.map_batches(
        lambda df: pd.DataFrame({"s": df["src_domain"],
                                 "o": df["dst_domain"]}),
        batch_format="pandas")
    df = pagerank(pe, num_iters=num_iters, damping=0.85).to_pandas()
    df["rank"] = df["rank"].round(8)
    return (df.rename(columns={"node": "domain"})
            .sort_values("domain").reset_index(drop=True)
            [["domain", "rank"]])


def _web_host_pagerank_sql(num_iters: int = 2) -> str:
    ctes = [
        f"WITH e AS ({_WEB_EDGES_SQL}),",
        _web_resolve_sql().lstrip("\n") + ",",
        _WEB_DOMS_SQL.lstrip("\n") + ",",
        # MATERIALIZED: every unrolled round references pe/deg/nodes —
        # un-materialized they re-inline the whole regex resolve chain
        # per reference and DuckDB OOMs planning it
        "pe AS MATERIALIZED (SELECT src_domain AS s, dst_domain AS o "
        "FROM doms GROUP BY src_domain, dst_domain),",
        "nodes AS MATERIALIZED "
        "(SELECT s AS node FROM pe UNION SELECT o FROM pe),",
        "deg AS MATERIALIZED "
        "(SELECT s AS node, COUNT(*) AS d FROM pe GROUP BY s),",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),",
        "p0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),",
    ]
    last = _pr_rounds(ctes, "p", "pe", "nodes", "deg", "nn", "p0",
                      num_iters)
    ctes[-1] = ctes[-1].rstrip(",")
    return (
        "\n".join(ctes)
        + f"\nSELECT node AS domain, ROUND(r, 8) AS rank FROM {last} "
        "ORDER BY domain"
    )


SQL_WEB_HOST_PAGERANK = _web_host_pagerank_sql(2)


def q_web_host_pagerank_weighted(sf_dir: str, num_iters: int = 2):
    """Weighted domain authority: PageRank with the host graph's
    n_links as edge weights (rank flows proportionally to link count —
    pagerank(weight_col=...)). Oracle: same unrolled rounds with
    d = Σ out-weights and contribution (r / d) · w, association-matched
    to the distributed kernel; round 8."""
    from ..stages.graph import pagerank
    from ..stages.weblinks import host_link_graph

    docs = _t(sf_dir, "documents", ["doc_id"])
    hg = host_link_graph(docs.map_batches(_web_edge_frame,
                                          batch_format="pandas"))
    pe = hg.map_batches(
        lambda df: pd.DataFrame({
            "s": df["src_domain"], "o": df["dst_domain"],
            "w": df["n_links"].astype(np.float64)}),
        batch_format="pandas")
    df = pagerank(pe, num_iters=num_iters, damping=0.85,
                  weight_col="w").to_pandas()
    df["rank"] = df["rank"].round(8)
    return (df.rename(columns={"node": "domain"})
            .sort_values("domain").reset_index(drop=True)
            [["domain", "rank"]])


def _pr_rounds_w(ctes: list, pfx: str, e: str, nodes: str, deg: str,
                 nn: str, r0: str, n: int) -> str:
    """Append n unrolled WEIGHTED power-iteration rounds (edge table
    ``e``(s, o, w), ``deg`` = Σ out-weights; contribution association
    (r / d) · w matches the distributed kernel). Returns the final
    rank CTE name."""
    prev = r0
    for i in range(n):
        cur = f"{pfx}{i + 1}"
        ctes.append(
            f"dm_{pfx}{i} AS (SELECT COALESCE(SUM({prev}.r), 0) AS dm "
            f"FROM {prev} LEFT JOIN {deg} USING (node) "
            f"WHERE {deg}.d IS NULL),"
        )
        ctes.append(
            f"i_{pfx}{i} AS (SELECT {e}.o AS node, "
            f"SUM(({prev}.r / {deg}.d) * {e}.w) AS m FROM {e} "
            f"JOIN {prev} ON {prev}.node = {e}.s "
            f"JOIN {deg} ON {deg}.node = {e}.s GROUP BY {e}.o),"
        )
        ctes.append(
            f"{cur} AS (SELECT {nodes}.node, "
            f"(1 - 0.85) / (SELECT n FROM {nn}) "
            f"+ 0.85 * (COALESCE(i_{pfx}{i}.m, 0) "
            f"+ (SELECT dm FROM dm_{pfx}{i}) / (SELECT n FROM {nn})) "
            f"AS r FROM {nodes} LEFT JOIN i_{pfx}{i} "
            f"ON i_{pfx}{i}.node = {nodes}.node),"
        )
        prev = cur
    return prev


def _web_host_pagerank_weighted_sql(num_iters: int = 2) -> str:
    ctes = [
        f"WITH e AS ({_WEB_EDGES_SQL}),",
        _web_resolve_sql().lstrip("\n") + ",",
        _WEB_DOMS_SQL.lstrip("\n") + ",",
        "pe AS MATERIALIZED (SELECT src_domain AS s, dst_domain AS o, "
        "CAST(COUNT(*) AS DOUBLE) AS w "
        "FROM doms GROUP BY src_domain, dst_domain),",
        "nodes AS MATERIALIZED "
        "(SELECT s AS node FROM pe UNION SELECT o FROM pe),",
        "deg AS MATERIALIZED "
        "(SELECT s AS node, SUM(w) AS d FROM pe GROUP BY s),",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),",
        "p0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),",
    ]
    last = _pr_rounds_w(ctes, "p", "pe", "nodes", "deg", "nn", "p0",
                        num_iters)
    ctes[-1] = ctes[-1].rstrip(",")
    return (
        "\n".join(ctes)
        + f"\nSELECT node AS domain, ROUND(r, 8) AS rank FROM {last} "
        "ORDER BY domain"
    )


SQL_WEB_HOST_PAGERANK_WEIGHTED = _web_host_pagerank_weighted_sql(2)


def q_web_frontier(sf_dir: str, k: int = 20):
    """Crawl-frontier prioritization — the end-to-end crawl-governance
    composition: resolve every harvested href, keep http(s) targets NOT
    already fetched (anti join vs the source-URL set), score each
    candidate by its registered domain's PageRank over the host graph,
    return the top-k (rank desc, url asc). Every stage distributed:
    map-side resolve, bucket dedup, bindings_join anti, rank join on
    domain, partial-top-k. Oracle: the shared resolve-chain SQL + the
    unrolled host-PageRank rounds + NOT IN + ORDER BY/LIMIT."""
    from ..shuffle import bindings_join, bucket_tag
    from ..stages.graph import pagerank
    from ..stages.urls import registered_domain_batch
    from ..stages.weblinks import host_link_graph, resolve_href_batch

    docs = _t(sf_dir, "documents", ["doc_id"])
    edges = docs.map_batches(_web_edge_frame,
                             batch_format="pandas").materialize()

    def resolved_targets(df: pd.DataFrame) -> pd.DataFrame:
        res = resolve_href_batch(df["src_url"], df["href"])
        ok = res.astype("string").str.match(r"^https?://").fillna(False)
        out = pd.DataFrame({"url": res[ok].astype(object)})
        return out.assign(_bucket=bucket_tag(out, "url", 16))

    cand = (
        edges.map_batches(resolved_targets, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(lambda g: g[["url"]].drop_duplicates(),
                    batch_format="pandas")
    )
    seen = edges.map_batches(
        lambda df: df[["src_url"]].drop_duplicates().rename(
            columns={"src_url": "url"}),
        batch_format="pandas")
    unseen = bindings_join(cand, seen, on=["url"], how="anti",
                           num_buckets=16)

    hg = host_link_graph(edges)
    pe = hg.map_batches(
        lambda df: pd.DataFrame({"s": df["src_domain"],
                                 "o": df["dst_domain"]}),
        batch_format="pandas")
    ranks = pagerank(pe, num_iters=2, damping=0.85).map_batches(
        lambda df: pd.DataFrame({"dom": df["node"],
                                 "rank": df["rank"].round(8)}),
        batch_format="pandas")

    def with_dom(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "url": df["url"].astype(object),
            "dom": registered_domain_batch(
                df["url"].astype("string")).astype(object)})

    scored = bindings_join(
        unseen.map_batches(with_dom, batch_format="pandas"),
        ranks, on=["dom"], how="inner", num_buckets=16)

    # partial top-k per block, final top-k on ≤ k·blocks rows
    def topk(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "url": df["url"].astype(object),
            "rank": pd.to_numeric(df["rank"]).astype(np.float64)})
        return d.sort_values(["rank", "url"],
                             ascending=[False, True]).head(k)

    parts = scored.map_batches(topk, batch_format="pandas").to_pandas()
    return (parts.sort_values(["rank", "url"],
                              ascending=[False, True])
            .head(k).reset_index(drop=True)[["url", "rank"]])


def _web_frontier_sql(k: int = 20) -> str:
    dom_of_url = _WEB_DOM_EXPR.format(
        h=_WEB_HOST_EXPR.format(col="u.url"))
    ctes = [
        f"WITH e AS ({_WEB_EDGES_SQL}),",
        _web_resolve_sql().lstrip("\n") + ",",
        _WEB_DOMS_SQL.lstrip("\n") + ",",
        "pe AS MATERIALIZED (SELECT src_domain AS s, dst_domain AS o "
        "FROM doms GROUP BY src_domain, dst_domain),",
        "nodes AS MATERIALIZED "
        "(SELECT s AS node FROM pe UNION SELECT o FROM pe),",
        "deg AS MATERIALIZED "
        "(SELECT s AS node, COUNT(*) AS d FROM pe GROUP BY s),",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),",
        "p0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),",
    ]
    last = _pr_rounds(ctes, "p", "pe", "nodes", "deg", "nn", "p0", 2)
    ctes += [
        "cand AS MATERIALIZED (SELECT DISTINCT resolved FROM keep),",
        "seen AS MATERIALIZED (SELECT DISTINCT src_url FROM e),",
        "unseen AS (SELECT resolved AS url FROM cand "
        "WHERE resolved NOT IN (SELECT src_url FROM seen)),",
        f"scored AS (SELECT u.url, ROUND({last}.r, 8) AS rank "
        f"FROM unseen u JOIN {last} ON {last}.node = {dom_of_url})",
    ]
    return ("\n".join(ctes)
            + f"\nSELECT url, rank FROM scored "
            f"ORDER BY rank DESC, url LIMIT {k}")


SQL_WEB_FRONTIER = _web_frontier_sql(20)


def q_web_redirects(sf_dir: str):
    """Redirect-chain resolution to terminal targets (stages/urls.
    resolve_redirects, pointer jumping — ⌈log₂ depth⌉ shuffle rounds):
    doc_id-derived map ``p<i> → p<i//2>`` for i % 3 == 0, i > 0
    (acyclic, multi-hop whenever i//2 is again ≡ 0 mod 3), resolved for
    EVERY doc URL. Oracle: recursive CTE following the same map, max
    hops per source = terminal."""
    from ..stages.urls import resolve_redirects

    docs = _t(sf_dir, "documents", ["doc_id"])

    def derive_map(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype(np.int64)
        m = (i % 3 == 0) & (i > 0)
        i = i[m]
        return pd.DataFrame({
            "s": ("http://r.com/p" + i.astype(str)).astype(object),
            "t": ("http://r.com/p" + (i // 2).astype(str)).astype(object),
        })

    def derive_urls(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype(np.int64)
        return pd.DataFrame(
            {"url": ("http://r.com/p" + i.astype(str)).astype(object)})

    out = resolve_redirects(
        docs.map_batches(derive_map, batch_format="pandas"),
        docs.map_batches(derive_urls, batch_format="pandas"),
    ).to_pandas()
    out["hops"] = out["hops"].astype(np.int64)
    return out.sort_values("url").reset_index(drop=True)[
        ["url", "final_url", "hops"]]


SQL_WEB_REDIRECTS = """
WITH RECURSIVE m AS (
    SELECT 'http://r.com/p' || CAST(doc_id AS VARCHAR) AS s,
           'http://r.com/p' || CAST(doc_id // 2 AS VARCHAR) AS t
    FROM documents WHERE doc_id % 3 = 0 AND doc_id > 0
),
u AS (
    SELECT 'http://r.com/p' || CAST(doc_id AS VARCHAR) AS url
    FROM documents
),
r(src, cur, hops) AS (
    SELECT s, t, 1 FROM m
    UNION ALL
    SELECT r.src, m.t, r.hops + 1 FROM r JOIN m ON m.s = r.cur
),
term AS (
    SELECT src, cur, hops,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY hops DESC) AS rk
    FROM r
)
SELECT u.url,
       COALESCE(term.cur, u.url) AS final_url,
       CAST(COALESCE(term.hops, 0) AS BIGINT) AS hops
FROM u LEFT JOIN term ON term.src = u.url AND term.rk = 1
ORDER BY u.url
"""


def q_docs_robots_filter(sf_dir: str):
    """robots.txt-style crawl governance (stages/urls.robots_filter):
    RFC 9309 longest-match Allow/Disallow over doc_id-derived URLs —
    the rule set exercises longest-match override, an exact-length
    tie (Allow wins), a whole-host Disallow, and unruled hosts. Oracle
    replays the 2·len+allow max-score rule with LIKE prefixes."""
    from ..stages.urls import robots_filter

    docs = _t(sf_dir, "documents", ["doc_id"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype(np.int64)
        url = ("http://site-" + (i % 5).astype(str)
               + ".com/sec/" + (i % 13).astype(str))
        return pd.DataFrame({"doc_id": i, "url": url})

    rules = pd.DataFrame({
        "host": ["site-0.com", "site-0.com", "site-1.com",
                 "site-2.com", "site-2.com"],
        "prefix": ["/sec/1", "/sec/12", "/", "/sec/3", "/sec/3"],
        "allow": [0, 1, 0, 0, 1],
    })
    return robots_filter(
        docs.map_batches(derive, batch_format="pandas"), rules)


SQL_DOCS_ROBOTS_FILTER = """
WITH u AS (
    SELECT doc_id,
           'http://site-' || CAST(doc_id % 5 AS VARCHAR)
               || '.com/sec/' || CAST(doc_id % 13 AS VARCHAR) AS url,
           'site-' || CAST(doc_id % 5 AS VARCHAR) || '.com' AS host,
           '/sec/' || CAST(doc_id % 13 AS VARCHAR) AS path
    FROM documents
),
rules(host, prefix, allow) AS (
    VALUES ('site-0.com', '/sec/1', 0), ('site-0.com', '/sec/12', 1),
           ('site-1.com', '/', 0),
           ('site-2.com', '/sec/3', 0), ('site-2.com', '/sec/3', 1)
),
m AS (
    SELECT u.doc_id,
           MAX(2 * len(r.prefix) + r.allow) AS best
    FROM u JOIN rules r
      ON r.host = u.host AND u.path LIKE r.prefix || '%'
    GROUP BY u.doc_id
)
SELECT u.doc_id, u.url,
       CAST(CASE WHEN m.best IS NULL THEN 1 ELSE m.best % 2 END
            AS BIGINT) AS allowed,
       CAST(CASE WHEN m.best IS NULL THEN -1 ELSE m.best // 2 END
            AS BIGINT) AS rule_len
FROM u LEFT JOIN m ON m.doc_id = u.doc_id
"""


def q_docs_ngram_overlap(sf_dir: str):
    """N-gram-overlap decontamination (fraction form): the benchmark =
    every doc_id % 50 == 0 document; docs with doc_id % 9 == 0 get a
    12-word snippet of the first probe APPENDED (planted partial
    overlap — ≥5 hit 8-grams), probe docs themselves overlap ~100 %.
    Threshold 1/20 of distinct 8-grams, integer-exact. Oracle rebuilds
    probe and doc gram sets with the same slice/unnest chain."""
    from ..stages.curation import ngram_overlap_flags

    probe_df = (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            lambda df: df[df["doc_id"] % 50 == 0],
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    probes = probe_df["text"].fillna("").tolist()
    snippet = " ".join(probes[0].split()[:12])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": i,
                "text": df["text"].fillna("")
                + np.where(i % 9 == 0, " " + snippet, ""),
            }
        )

    ds = _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        plant, batch_format="pandas"
    )
    out = ngram_overlap_flags(
        ds, probes, n=8, threshold_num=1, threshold_den=20
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "n_grams", "n_hit", "contaminated"]
    ]


SQL_DOCS_NGRAM_OVERLAP = r"""
WITH sn AS (
    SELECT array_to_string(
        list_slice(regexp_extract_all(COALESCE(text, ''), '\S+'),
                   1, 12), ' ') AS s
    FROM documents WHERE doc_id = 0
),
d AS (
    SELECT doc_id,
           COALESCE(text, '') ||
           CASE WHEN doc_id % 9 = 0
                THEN ' ' || (SELECT s FROM sn) ELSE '' END AS u
    FROM documents
),
pw AS (
    SELECT regexp_extract_all(COALESCE(text, ''), '\S+') AS ws,
           CAST(len(regexp_extract_all(COALESCE(text, ''), '\S+'))
                AS BIGINT) AS n
    FROM documents WHERE doc_id % 50 = 0
),
pg AS (
    SELECT DISTINCT array_to_string(
        ws[CAST(s.i AS INT) : CAST(s.i + 7 AS INT)], ' ') AS g
    FROM pw, unnest(generate_series(1, n - 7)) s(i)
    WHERE n >= 8
),
dw AS (
    SELECT doc_id, regexp_extract_all(u, '\S+') AS ws,
           CAST(len(regexp_extract_all(u, '\S+')) AS BIGINT) AS n
    FROM d
),
dg AS (
    SELECT DISTINCT doc_id, array_to_string(
        ws[CAST(s.i AS INT) : CAST(s.i + 7 AS INT)], ' ') AS g
    FROM dw, unnest(generate_series(1, n - 7)) s(i)
    WHERE n >= 8
),
agg AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN g IN (SELECT g FROM pg)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
    FROM dg GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_grams, 0) AS n_grams,
       COALESCE(a.n_hit, 0) AS n_hit,
       CAST(CASE WHEN COALESCE(a.n_grams, 0) > 0
                  AND 20 * COALESCE(a.n_hit, 0)
                      >= COALESCE(a.n_grams, 0)
                 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM d LEFT JOIN agg a ON a.doc_id = d.doc_id
ORDER BY d.doc_id
"""


SQL_DOCS_DECONTAMINATE = """
WITH probes AS (
    SELECT substr(text, 1, 48) AS p FROM documents WHERE doc_id % 50 = 0
)
SELECT d.doc_id,
       CAST(EXISTS (SELECT 1 FROM probes WHERE contains(d.text, probes.p))
            AS BIGINT) AS contaminated
FROM documents d
"""


def q_docs_pii_scrub(sf_dir: str):
    """PII redaction (emails / IPv4 / 555-phone → typed placeholders,
    sequential, vectorized regex kernels). The fixture corpus contains
    no PII, so a deterministic augmentation synthesizes it from doc_id
    IDENTICALLY on both sides (email iff doc_id%3==0, ip iff %2==0,
    phone always) — the operator under test is the scrub, the
    augmentation is test plumbing. Oracle: DuckDB/RE2 replays the same
    count+replace sequence."""
    from ..stages.text_analysis import pii_scrub_batch

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def augment(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype("int64")
        t = df["text"].fillna("")
        em = pd.Series(
            " contact user" + did.astype(str) + "@example.com",
            index=df.index,
        ).where(did % 3 == 0, "")
        ip = pd.Series(
            " ip 10." + (did % 200).astype(str) + ".0.7", index=df.index
        ).where(did % 2 == 0, "")
        ph = " call 555-" + (did % 10000).astype(str).str.zfill(4)
        return df.assign(text=t + em + ip + ph)

    return (
        ds.map_batches(augment, batch_format="pandas")
        .map_batches(pii_scrub_batch, batch_format="pandas")
        .map_batches(
            lambda df: df[
                ["doc_id", "n_emails", "n_ips", "n_phones",
                 "redacted_chars"]
            ],
            batch_format="pandas",
        )
    )


SQL_DOCS_PII_SCRUB = r"""
WITH aug AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 3 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com' ELSE '' END
           || CASE WHEN doc_id % 2 = 0
                   THEN ' ip 10.' || CAST(doc_id % 200 AS VARCHAR)
                        || '.0.7' ELSE '' END
           || ' call 555-'
           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
    FROM documents
),
s1 AS (
    SELECT doc_id,
           len(regexp_extract_all(
               t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS n_emails,
           regexp_replace(
               t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS t
    FROM aug
),
s2 AS (
    SELECT doc_id, n_emails,
           len(regexp_extract_all(
               t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
           regexp_replace(
               t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
               '<IP>', 'g') AS t
    FROM s1
),
s3 AS (
    SELECT doc_id, n_emails, n_ips,
           len(regexp_extract_all(t, '\b555-\d{4}\b')) AS n_phones,
           regexp_replace(t, '\b555-\d{4}\b', '<PHONE>', 'g') AS t
    FROM s2
)
SELECT doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_ips AS BIGINT) AS n_ips,
       CAST(n_phones AS BIGINT) AS n_phones,
       CAST(length(t) AS BIGINT) AS redacted_chars
FROM s3
"""


def q_docs_url_dedup(sf_dir: str):
    """URL-level dedup (C4/CCNet-style pre-content pass): URLs derived
    deterministically from doc_id (mixed-case host, default port,
    utm params, fragments, trailing slash), canonicalized by the
    SQL-replayable rule chain (stages/urls), grouped by canonical form
    with COUNT + MIN(doc_id) survivor. DuckDB applies the identical
    nested-regex chain — parity pinned by tests/test_urls.py."""
    from ..stages.urls import url_dedup

    docs = _t(sf_dir, "documents", ["doc_id"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype(np.int64)
        url = (
            "HTTP://Example-" + (i % 7).astype(str) + ".COM"
            + np.where(i % 2 == 0, ":80", "")
            + "/Path/" + (i % 50).astype(str)
            + np.where(i % 4 == 0, "/", "")
            + np.where(i % 3 == 0, "?utm_source=feed&x=", "?x=")
            + (i % 25).astype(str)
            + np.where(i % 5 == 0, "#Sec", "")
        )
        return pd.DataFrame({"doc_id": i, "url": url})

    out = url_dedup(
        docs.map_batches(derive, batch_format="pandas")
    ).to_pandas()
    return (
        out.sort_values("canon_url").reset_index(drop=True)[
            ["canon_url", "n_dups", "keep_id"]
        ]
    )


SQL_DOCS_URL_DEDUP = r"""
WITH u AS (
  SELECT doc_id,
    'HTTP://Example-' || CAST(doc_id % 7 AS VARCHAR) || '.COM' ||
    CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END ||
    '/Path/' || CAST(doc_id % 50 AS VARCHAR) ||
    CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
    CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&x=' ELSE '?x=' END ||
    CAST(doc_id % 25 AS VARCHAR) ||
    CASE WHEN doc_id % 5 = 0 THEN '#Sec' ELSE '' END AS u0
  FROM documents
),
s1 AS (SELECT doc_id, regexp_replace(u0, '#.*$', '') AS u1 FROM u),
s2 AS (
  SELECT doc_id,
    CASE WHEN regexp_extract(u1, '^[a-zA-Z]+://[^/?#]*') <> ''
    THEN lower(regexp_extract(u1, '^[a-zA-Z]+://[^/?#]*')) ||
         substr(u1, length(regexp_extract(u1, '^[a-zA-Z]+://[^/?#]*')) + 1)
    ELSE u1 END AS u2
  FROM s1
),
s3 AS (
  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(u2,
             '([?&])(utm_[a-zA-Z0-9_]+|fbclid|gclid|msclkid)=[^&]*',
             '\1', 'g'),
           '\?&', '?'), '&&+', '&', 'g'), '[?&]+$', '') AS u3
  FROM s2
),
s4 AS (
  SELECT doc_id, regexp_replace(regexp_replace(u3,
           '^(http://[^/:]+):80(/|$)', '\1\2'),
           '^(https://[^/:]+):443(/|$)', '\1\2') AS u4
  FROM s3
),
c AS (SELECT doc_id, regexp_replace(u4, '/+$', '') AS canon_url FROM s4)
SELECT canon_url, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
FROM c GROUP BY canon_url ORDER BY canon_url
"""


def q_docs_normalize(sf_dir: str):
    """C4-style text normalization (NFC, control chars → space, unicode
    whitespace squeeze, trim) over deterministically-dirtied fixture
    text (leading spaces, NBSP after every space, trailing LF + a
    control char + fullwidth suffix; NUL itself is untestable — DuckDB
    truncates string literals at chr(0)) — the oracle dirties and normalizes with the
    IDENTICAL chain, and the value hash covers the normalized TEXT
    itself (strongest parity check)."""
    from ..stages.text_analysis import normalize_text_batch

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def dirty_and_norm(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "text": "  "
                + df["text"].str.replace(" ", " \u00a0", regex=False)
                + "\n\x01\uFF25\uFF1D\uFF4D\uFF43\uFF12",
            }
        )
        out = normalize_text_batch(d)
        return pd.DataFrame(
            {"doc_id": d["doc_id"], "norm_text": out["norm_text"]}
        )

    out = docs.map_batches(
        dirty_and_norm, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "norm_text"]
    ]


SQL_DOCS_NORMALIZE = r"""
WITH d AS (
  SELECT doc_id,
         '  ' || replace(text, ' ', ' ' || chr(160)) || chr(10) ||
         chr(1) || chr(65317) || chr(65309) || chr(65357) ||
         chr(65347) || chr(65298) AS u0
  FROM documents
)
SELECT doc_id,
       trim(regexp_replace(regexp_replace(nfc_normalize(u0),
            '[\x00-\x1F\x7F]', ' ', 'g'),
            '[ \t\n\r\f\v\x{00A0}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+',
            ' ', 'g')) AS norm_text
FROM d ORDER BY doc_id
"""


def q_docs_jsonl_roundtrip(sf_dir: str):
    """JSONL source/sink roundtrip: documents → per-block .jsonl files
    under a scratch dir → read back with a DECLARED schema → must equal
    the parquet table (the oracle reads the parquet directly). Proves
    null-safe typed parsing, atomic per-block files, and strict-JSON
    output."""
    import shutil
    import tempfile

    from ..sources.jsonl import read_jsonl, write_jsonl

    docs = _t(sf_dir, "documents",
              ["doc_id", "text", "lang", "source"])
    out_dir = os.path.join(
        tempfile.gettempdir(), "graft_jsonl_rt",
        sf_dir.strip("/").replace("/", "_"),
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    write_jsonl(docs, out_dir)
    back = read_jsonl(
        out_dir,
        {"doc_id": "int64", "text": "str", "lang": "str",
         "source": "str"},
    ).to_pandas()
    back["doc_id"] = back["doc_id"].astype(np.int64)
    return back.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "text", "lang", "source"]
    ]


SQL_DOCS_JSONL_ROUNDTRIP = """
SELECT doc_id, text, lang, source FROM documents ORDER BY doc_id
"""


def q_docs_gopher_rules(sf_dir: str):
    """Gopher/MassiveText document-quality rules (Rae et al. 2021
    §A1.1) over deterministically-dirtied fixture text: stopword tail
    on even ids, bullet lines on %3, ellipsis line-ends on %4, symbol
    runs on %5, and %25 docs replaced by an all-bullet list (so the
    bullet rule actually fires false). Every ratio threshold is a
    cross-multiplied integer comparison, so the oracle replays each
    rule exactly — no float seam."""
    from ..stages.text_analysis import gopher_rules_batch

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    rules = [
        "r_words", "r_mean_len", "r_symbol", "r_alpha", "r_stop",
        "r_bullet", "r_ellipsis", "gopher_pass",
    ]

    def dirty_and_rule(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        u = (
            df["text"].fillna("")
            + np.where(ids % 2 == 0, " to be of and that have with", "")
            + np.where(
                ids % 3 == 0, "\n- bullet item\n* second one", ""
            )
            + np.where(ids % 4 == 0, "\ntrailing thought...", "")
            + np.where(ids % 5 == 0, " ## ## ...", "")
        )
        u = pd.Series(
            np.where(
                ids % 25 == 0,
                "- alpha beta\n- gamma delta\n- epsilon zeta",
                u,
            ),
            index=df.index,
        )
        out = gopher_rules_batch(
            pd.DataFrame({"doc_id": df["doc_id"], "text": u}),
            min_words=40,
        )
        for c in rules:
            out[c] = out[c].astype(np.int64)
        return out[["doc_id", "n_words", *rules]]

    out = docs.map_batches(
        dirty_and_rule, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_DOCS_GOPHER_RULES = r"""
WITH d AS (
  SELECT doc_id,
    CASE WHEN doc_id % 25 = 0 THEN
      '- alpha beta' || chr(10) || '- gamma delta' || chr(10) ||
      '- epsilon zeta'
    ELSE text
      || CASE WHEN doc_id % 2 = 0
              THEN ' to be of and that have with' ELSE '' END
      || CASE WHEN doc_id % 3 = 0
              THEN chr(10) || '- bullet item' || chr(10) ||
                   '* second one' ELSE '' END
      || CASE WHEN doc_id % 4 = 0
              THEN chr(10) || 'trailing thought...' ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN ' ## ## ...' ELSE '' END
    END AS u
  FROM documents
), m AS (
  SELECT doc_id,
    len(regexp_extract_all(u, '\S+')) AS n_words,
    length(regexp_replace(u, '\s', '', 'g')) AS word_chars,
    len(list_filter(regexp_extract_all(u, '\S+'),
        w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
    len(regexp_extract_all(u, '#'))
      + len(regexp_extract_all(u, '\.\.\.')) AS symbols,
    length(u) - length(replace(u, chr(10), '')) + 1 AS n_lines,
    len(regexp_extract_all(u,
        '(?m)^[ \t]*[-*' || chr(8226) || ']')) AS bullet_lines,
    len(regexp_extract_all(u, '(?m)\.\.\.[ \t]*$')) AS ellipsis_lines,
    ((CASE WHEN regexp_matches(u, '\bthe\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(u, '\bbe\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(u, '\bto\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(u, '\bof\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(u, '\band\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(u, '\bthat\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(u, '\bhave\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(u, '\bwith\b') THEN 1 ELSE 0 END)
    ) AS n_stop
  FROM d
)
SELECT doc_id, n_words,
  (n_words >= 40 AND n_words <= 100000)::BIGINT AS r_words,
  (3*n_words <= word_chars AND word_chars <= 10*n_words)::BIGINT
    AS r_mean_len,
  (10*symbols <= n_words)::BIGINT AS r_symbol,
  (5*alpha_words >= 4*n_words)::BIGINT AS r_alpha,
  (n_stop >= 2)::BIGINT AS r_stop,
  (10*bullet_lines <= 9*n_lines)::BIGINT AS r_bullet,
  (10*ellipsis_lines <= 3*n_lines)::BIGINT AS r_ellipsis,
  (n_words >= 40 AND n_words <= 100000
   AND 3*n_words <= word_chars AND word_chars <= 10*n_words
   AND 10*symbols <= n_words AND 5*alpha_words >= 4*n_words
   AND n_stop >= 2 AND 10*bullet_lines <= 9*n_lines
   AND 10*ellipsis_lines <= 3*n_lines)::BIGINT AS gopher_pass
FROM m ORDER BY doc_id
"""


def q_docs_domain_stats(sf_dir: str):
    """Per-registered-domain corpus stats (crawl governance): URLs
    derived deterministically from doc_id rotate through plain TLDs AND
    two-level-registry suffixes (co.uk/com.au) with optional subdomain
    prefixes, plus junk non-URL rows (counted, dropped). The oracle
    replays host + registered-domain extraction with the IDENTICAL RE2
    regexes, then the same exact n_docs / distinct-host / min rollup."""
    from ..stages.urls import domain_stats

    docs = _t(sf_dir, "documents", ["doc_id"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype(np.int64)
        suffix = np.select(
            [i % 5 == 0, i % 5 == 1, i % 5 == 2, i % 5 == 3],
            ["com", "co.uk", "org", "com.au"], default="de",
        )
        sub = np.where(i % 2 == 0, "sub" + (i % 3).astype(str) + ".", "")
        url = pd.Series(
            np.where(
                i % 97 == 0,
                "not a url",
                "http://" + sub + "Site" + (i % 7).astype(str) + "."
                + suffix + "/p/" + (i % 10).astype(str),
            ),
            index=df.index,
        )
        return pd.DataFrame({"doc_id": i, "url": url})

    out = domain_stats(
        docs.map_batches(derive, batch_format="pandas")
    ).to_pandas()
    return out.sort_values("domain").reset_index(drop=True)[
        ["domain", "n_docs", "n_hosts", "min_doc"]
    ]


SQL_DOCS_DOMAIN_STATS = r"""
WITH u AS (
  SELECT doc_id,
    CASE WHEN doc_id % 97 = 0 THEN 'not a url'
    ELSE 'http://' ||
      CASE WHEN doc_id % 2 = 0
           THEN 'sub' || CAST(doc_id % 3 AS VARCHAR) || '.'
           ELSE '' END ||
      'Site' || CAST(doc_id % 7 AS VARCHAR) || '.' ||
      CASE doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
           WHEN 2 THEN 'org' WHEN 3 THEN 'com.au' ELSE 'de' END ||
      '/p/' || CAST(doc_id % 10 AS VARCHAR)
    END AS url
  FROM documents
),
h AS (
  SELECT doc_id,
    NULLIF(rtrim(lower(regexp_extract(url,
      '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)),
      '.'), '') AS host
  FROM u
),
d AS (
  SELECT doc_id, host,
    COALESCE(NULLIF(regexp_extract(host,
      '([^.]+\.(?:co\.uk|org\.uk|ac\.uk|gov\.uk|com\.au|net\.au|org\.au|co\.jp|co\.in|co\.kr|com\.br|com\.cn|com\.mx)|[^.]+\.[^.]+)$',
      1), ''), host) AS domain
  FROM h WHERE host IS NOT NULL
)
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
       MIN(doc_id) AS min_doc
FROM d GROUP BY domain ORDER BY domain
"""


def q_docs_compression_ratio(sf_dir: str):
    """Compression-ratio quality signal (rows-only — deflate is not
    SQL-expressible): zlib level-6 size ratio per document, the
    CCNet/RefinedWeb boilerplate/repetition detector. Repetitive docs
    (planted: doc_id % 11 == 0 get their text DOUBLED 8x) compress far
    below the natural-text band; pinned by pytest goldens."""
    from ..stages.text_analysis import compression_ratio_batch

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def plant_and_score(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype(np.int64)
        t = df["text"].fillna("")
        d = pd.DataFrame(
            {"doc_id": i,
             "text": pd.Series(
                 np.where(i % 11 == 0, (t + " ") * 8, t),
                 index=df.index)}
        )
        out = compression_ratio_batch(d)
        return out[["doc_id", "raw_bytes", "zip_bytes", "zlib_ratio"]]

    out = docs.map_batches(
        plant_and_score, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_docs_weighted_sample(sf_dir: str):
    """Weighted sampling without replacement (Efraimidis–Spirakis
    exponential keys, md5-derived uniforms — fully deterministic and
    reshard-stable): 40 documents drawn proportional to n_chars. The
    oracle replays the EXACT rule — same md5, same 48-bit uniform, same
    ln(u)/w key — and takes the same top-40."""
    from ..stages.sampling import weighted_sample

    docs = _t(sf_dir, "documents", ["doc_id", "n_chars"])
    out = weighted_sample(
        docs, k=40, weight_col="n_chars", id_col="doc_id"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "n_chars", "es_key"]
    ]


SQL_DOCS_WEIGHTED_SAMPLE = """
WITH keys AS (
    SELECT doc_id, n_chars,
           ln((CAST(CONCAT('0x',
                 substr(md5(CAST(doc_id AS VARCHAR) || ':graft-wsample'),
                        1, 12)) AS BIGINT) + 1.0)
              / 281474976710656.0) / n_chars AS es_key
    FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars, es_key FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS rn
    FROM keys
) WHERE rn <= 40 ORDER BY doc_id
"""


_MIX_WEIGHTS = {"src0": 2.5, "src1": 0.3, "src2": 2.0}
_MIX_DEFAULT = 1.0


def q_docs_source_mixture(sf_dir: str):
    """Deterministic corpus mixing (per-source epoch weights: src0
    upsampled 2.5×, src1 downsampled to a 30% fraction, src2 exactly
    2×, everything else 1×) — the data-mixing step of a training
    pipeline. The fractional copy uses the shared keyed-md5 rule, so
    the oracle replays it with a range-join + per-source hex
    threshold."""
    from ..stages.sampling import source_mixture

    docs = _t(sf_dir, "documents", ["doc_id", "source"])
    out = source_mixture(
        docs, _MIX_WEIGHTS, default_weight=_MIX_DEFAULT
    ).to_pandas()
    out["epoch"] = out["epoch"].astype(np.int64)
    return (
        out.sort_values(["doc_id", "epoch"]).reset_index(drop=True)[
            ["doc_id", "source", "epoch"]
        ]
    )


def _mixture_sql() -> str:
    """Range-join replay of source_mixture: copy r kept iff
    r < floor(w), or r = floor(w) and the 8-hex md5 prefix is under
    floor(frac(w)·2³²) — thresholds formatted here so both sides use
    the identical integer."""
    max_copies = int(
        max(
            [np.floor(w) + 1 for w in _MIX_WEIGHTS.values()]
            + [np.floor(_MIX_DEFAULT) + 1]
        )
    )

    def thr(w: float) -> str:
        base = int(np.floor(w))
        return format(int(np.floor((w - base) * (1 << 32))), "08x")

    wt_case = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in _MIX_WEIGHTS.items()
    )
    thr_case = " ".join(
        f"WHEN '{s}' THEN '{thr(w)}'" for s, w in _MIX_WEIGHTS.items()
    )
    return f"""
WITH w AS (
  SELECT doc_id, source,
    CASE source {wt_case} ELSE {_MIX_DEFAULT} END AS wt,
    CASE source {thr_case} ELSE '{thr(_MIX_DEFAULT)}' END AS thr
  FROM documents
)
SELECT d.doc_id, d.source, CAST(r.range AS BIGINT) AS epoch
FROM w d JOIN range(0, {max_copies}) r
  ON r.range < CAST(floor(d.wt) AS BIGINT)
  OR (r.range = CAST(floor(d.wt) AS BIGINT)
      AND substr(md5(CAST(d.doc_id AS VARCHAR) || ':graft-mix'), 1, 8)
          < d.thr)
ORDER BY doc_id, epoch
"""


SQL_DOCS_SOURCE_MIXTURE = _mixture_sql()


def q_docs_host_boilerplate(sf_dir: str):
    """Per-host boilerplate removal (the CCNet per-domain paragraph
    dedup recipe): a 3-token span is boilerplate iff it appears in ≥ 3
    DISTINCT documents OF THE SAME source — nav bars and footers repeat
    within a host, body text doesn't. Same engine as span_dedup with
    scope_col="source"; oracle replays the span grouping with marks
    keyed on (source, span)."""
    from ..stages.curation import span_dedup

    ds = _t(sf_dir, "documents", ["doc_id", "text", "source"])
    return span_dedup(ds, window=3, scope_col="source", min_docs=3)


SQL_DOCS_HOST_BOILERPLATE = r"""
WITH split AS (
    SELECT doc_id, source,
           list_filter(string_split_regex(text, '\s+'),
                       w -> w <> '') AS ws
    FROM documents
),
words AS (
    SELECT doc_id, source, unnest(ws) AS w,
           unnest(range(1, len(ws) + 1)) AS ord
    FROM split
),
spans AS (
    SELECT doc_id, source, CAST(floor((ord - 1) / 3) AS BIGINT) AS si,
           string_agg(w, ' ' ORDER BY ord) AS span
    FROM words GROUP BY doc_id, source, si
),
marks AS (
    SELECT source, span, COUNT(DISTINCT doc_id) >= 3 AS dup
    FROM spans GROUP BY source, span
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN m.dup THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_spans,
       CAST(COALESCE(SUM(CASE WHEN NOT m.dup THEN length(s.span) END), 0)
            + GREATEST(COUNT(*)
                       - SUM(CASE WHEN m.dup THEN 1 ELSE 0 END) - 1, 0)
            AS BIGINT) AS kept_chars
FROM spans s JOIN marks m USING (source, span)
GROUP BY s.doc_id
"""


def q_docs_span_dedup(sf_dir: str):
    """Cross-document duplicate-span removal (C4/RefinedWeb line-dedup
    generalized to 3-token spans — the fixture corpus is single-line):
    spans hashed per batch (vectorized shifted concat + numpy md5),
    duplicate marks via a digest-bucketed distinct-doc count, marks
    joined back with bindings_join, per-doc rollup. Oracle: DuckDB
    replays the same span grouping with string_agg + a distinct-doc
    window."""
    from ..stages.curation import span_dedup

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return span_dedup(ds, window=3)


SQL_DOCS_SPAN_DEDUP = r"""
WITH split AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'),
                       w -> w <> '') AS ws
    FROM documents
),
words AS (
    SELECT doc_id, unnest(ws) AS w,
           unnest(range(1, len(ws) + 1)) AS ord
    FROM split
),
spans AS (
    SELECT doc_id, CAST(floor((ord - 1) / 3) AS BIGINT) AS si,
           string_agg(w, ' ' ORDER BY ord) AS span
    FROM words GROUP BY doc_id, si
),
marks AS (
    SELECT span, COUNT(DISTINCT doc_id) >= 2 AS dup
    FROM spans GROUP BY span
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN m.dup THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_spans,
       CAST(COALESCE(SUM(CASE WHEN NOT m.dup THEN length(s.span) END), 0)
            + GREATEST(COUNT(*)
                       - SUM(CASE WHEN m.dup THEN 1 ELSE 0 END) - 1, 0)
            AS BIGINT) AS kept_chars
FROM spans s JOIN marks m USING (span)
GROUP BY s.doc_id
"""


def q_docs_shuffle_shards(sf_dir: str):
    """Reproducible global shuffle + shard assignment
    (stages/sampling.deterministic_shuffle): rank = position in the
    md5(id:salt) total order, shard = rank % 8 — computed with an
    order-preserving bucket histogram (tiny driver frame) + per-bucket
    offset ranking, never a driver sort. Oracle: ROW_NUMBER over the
    same md5 order."""
    from ..stages.sampling import deterministic_shuffle

    ds = _t(sf_dir, "documents", ["doc_id"])
    return deterministic_shuffle(ds, num_shards=8)


SQL_DOCS_SHUFFLE_SHARDS = """
WITH r AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':graft-shuffle'),
                        doc_id
           ) - 1 AS rank
    FROM documents
)
SELECT doc_id, rank, rank % 8 AS shard FROM r
"""


def q_docs_stratified_sample(sf_dir: str):
    """Per-language deterministic sampling (corpus rebalancing): keep
    100% of fr, 40% of en, 0% of everything else, by the keyed-md5
    threshold rule (map-side, growth-stable). Oracle: the same
    substr(md5(...)) < CASE-threshold comparison in SQL."""
    from ..stages.sampling import stratified_sample

    ds = _t(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_sample(
        ds, {"fr": 100.0, "en": 40.0}, group_col="lang"
    )


SQL_DOCS_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':graft-strata'), 1, 4)
      < CASE lang WHEN 'fr' THEN 'zzzz'
                  WHEN 'en' THEN format('{:04x}', CAST(65536 * 0.4 AS INTEGER))
                  ELSE '0000' END
"""


def q_docs_budget_select(sf_dir: str):
    """Token-budget data selection (stages/sampling.budget_select):
    keep documents longest-first until a 25k-char budget is exhausted
    (first overflowing doc kept), computed as a distributed greedy
    prefix — order-preserving score buckets, per-bucket size-sum prefix
    offsets (≤64 rows on the driver), map-side budget prune before the
    shuffle. Oracle: the same rule as one SQL window —
    ``SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id) - n_chars <
    budget``."""
    from ..stages.sampling import budget_select

    ds = _t(sf_dir, "documents", ["doc_id", "n_chars"])
    out = budget_select(
        ds, budget=25_000, score_col="n_chars", size_col="n_chars"
    )
    return out.map_batches(
        lambda df: df[["doc_id", "n_chars"]], batch_format="pandas"
    )


SQL_DOCS_BUDGET_SELECT = """
SELECT doc_id, n_chars FROM (
    SELECT doc_id, n_chars,
           SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id) AS cum
    FROM documents
) WHERE cum - n_chars < 25000
"""


def q_docs_pack_sequences(sf_dir: str):
    """Training-sequence packing E2E: reproducible shuffle+shard
    (md5 order), whitespace token counts joined on via the distributed
    bindings join, then greedy non-straddling packing per shard
    (stages/sampling.pack_sequences, capacity 120 tokens). Oracle: a
    recursive CTE replaying the same greedy walk row by row."""
    from ..shuffle import bindings_join
    from ..stages.sampling import deterministic_shuffle, pack_sequences

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    toks = docs.map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": df["text"].fillna("")
                .str.count(r"\S+").astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    sharded = deterministic_shuffle(docs, num_shards=8)
    joined = bindings_join(sharded, toks, on=["doc_id"]).map_batches(
        lambda df: df.astype("int64"),  # bindings_join widens filled cols
        batch_format="pandas",
    )
    packed = pack_sequences(joined, capacity=120)
    return packed.map_batches(
        lambda df: df.astype(
            {"doc_id": "int64", "shard": "int64",
             "seq_id": "int64", "offset": "int64"}
        ),
        batch_format="pandas",
    )


SQL_DOCS_PACK_SEQUENCES = r"""
WITH RECURSIVE toks AS (
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'),
                           w -> w <> '')) AS n_tokens
    FROM documents
),
sharded AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':graft-shuffle'),
                        doc_id
           ) - 1 AS rank
    FROM documents
),
ordered AS (
    SELECT s.doc_id, s.rank % 8 AS shard, t.n_tokens,
           ROW_NUMBER() OVER (PARTITION BY s.rank % 8
                              ORDER BY s.rank) AS pos
    FROM sharded s JOIN toks t USING (doc_id)
),
pack AS (
    SELECT shard, doc_id, n_tokens, pos,
           CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS "offset",
           n_tokens AS fill
    FROM ordered WHERE pos = 1
    UNION ALL
    SELECT o.shard, o.doc_id, o.n_tokens, o.pos,
           CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > 120
                THEN p.seq_id + 1 ELSE p.seq_id END,
           CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > 120
                THEN 0 ELSE p.fill END,
           CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > 120
                THEN o.n_tokens ELSE p.fill + o.n_tokens END
    FROM pack p JOIN ordered o
      ON o.shard = p.shard AND o.pos = p.pos + 1
)
SELECT doc_id, shard, seq_id, "offset" FROM pack
"""


def q_docs_lm_score(sf_dir: str):
    """Corpus-trained bigram-LM quality scoring (CCNet-style,
    stages/lm.bigram_logprob_scores): two distributed passes, three
    bucket shuffles, add-1 smoothing, per-doc mean log-probability —
    no model table on the driver. Oracle: the same counts/joins/ln in
    SQL; scores FLOOR-truncated at 1e-4 on both sides."""
    from ..stages.lm import bigram_logprob_scores

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = bigram_logprob_scores(ds)
    return out.map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "lm_score": df["lm_score"].astype("float64"),
            }
        ),
        batch_format="pandas",
    )


SQL_DOCS_LM_SCORE = r"""
WITH split AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'),
                       w -> w <> '') AS ws
    FROM documents
),
words AS (
    SELECT doc_id, unnest(ws) AS w,
           unnest(range(1, len(ws) + 1)) AS ord
    FROM split
),
uni AS (SELECT w, COUNT(*) AS c1 FROM words GROUP BY w),
vv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
bi AS (
    SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c2
    FROM words a JOIN words b
      ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
    GROUP BY a.w, b.w
),
docbi AS (
    SELECT a.doc_id, a.w AS w1, b.w AS w2
    FROM words a JOIN words b
      ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
),
lp AS (
    SELECT d.doc_id,
           ln((bi.c2 + 1.0) / (uni.c1 + (SELECT v FROM vv))) AS lp
    FROM docbi d
    JOIN bi ON bi.w1 = d.w1 AND bi.w2 = d.w2
    JOIN uni ON uni.w = d.w1
),
means AS (
    SELECT doc_id, FLOOR(AVG(lp) * 1e4) / 1e4 AS lm_score
    FROM lp GROUP BY doc_id
)
SELECT doc_id, COALESCE(m.lm_score, 0.0) AS lm_score
FROM documents LEFT JOIN means m USING (doc_id)
"""


def q_docs_tfidf(sf_dir: str):
    """Top-3 TF-IDF terms per document (stages/curation.tfidf_topk):
    explode → (doc, term, tf); df via a term-bucketed shuffle; the df
    join runs through bindings_join so the vocabulary never lands on
    the driver; per-doc top-k via the partial-top-k combiner. Ties rank
    (score desc, term asc); scores FLOOR-truncated at 1e-6 on both
    sides."""
    from ..stages.curation import tfidf_topk

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = tfidf_topk(ds, k=3)
    return out.map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "rank": df["rank"].astype("int64"),
                "term": df["term"],
                "score": df["score"].astype("float64"),
            }
        ),
        batch_format="pandas",
    )


SQL_DOCS_TFIDF = r"""
WITH split AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'),
                       w -> w <> '') AS ws
    FROM documents
),
words AS (SELECT doc_id, unnest(ws) AS w FROM split),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY doc_id, w),
df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY w),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
scored AS (
    SELECT tf.doc_id, tf.w AS term,
           FLOOR(tf.tf * ln((SELECT n FROM nn) / df.df) * 1e6) / 1e6
               AS score
    FROM tf JOIN df ON df.w = tf.w
),
ranked AS (
    SELECT doc_id, term, score,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, term ASC) AS rank
    FROM scored
)
SELECT doc_id, rank, term, score FROM ranked WHERE rank <= 3
"""


def q_docs_source_quota(sf_dir: str):
    """Per-source quota sampling (the Common-Crawl per-domain cap):
    keep at most 5 docs per source by smallest md5(doc_id:salt) —
    deterministic and reshard-stable. Map-side partial top-k combiner,
    then one per-source bucket shuffle. Oracle: the same md5 rank as a
    window function."""
    from ..stages.curation import per_source_quota

    ds = _t(sf_dir, "documents", ["doc_id", "source"])
    return per_source_quota(ds, k=5).map_batches(
        lambda df: df[["doc_id", "source"]], batch_format="pandas"
    )


SQL_DOCS_SOURCE_QUOTA = """
SELECT doc_id, source FROM (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':graft-quota'),
                        doc_id
           ) AS rn
    FROM documents
) WHERE rn <= 5
"""


def q_rml_customer_triples(sf_dir: str):
    """Generic RML mapping-spec engine (extract.jsonmap.map_table) over a
    TPC-H tabular table: customer rows → name/nation/segment triples.
    Exercises the spec-driven path (templated subjects, IRI object term
    maps) rather than a hand-rolled converter."""
    from ..extract.jsonmap import map_table

    spec = [
        {"subject": "cust:{c_custkey}", "predicate": VOCAB_PNAME,
         "object": "{c_name}", "object_kind": "literal"},
        {"subject": "cust:{c_custkey}",
         "predicate": "http://graft.example/vocab#inNation",
         "object": "nation:{c_nationkey}", "object_kind": "iri"},
        {"subject": "cust:{c_custkey}",
         "predicate": "http://graft.example/vocab#segment",
         "object": "{c_mktsegment}", "object_kind": "literal"},
    ]
    ds = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey",
                                 "c_mktsegment"])
    tri = map_table(ds, spec)
    return tri.map_batches(
        lambda df: df[["subj", "pred", "obj", "obj_is_iri"]],
        batch_format="pandas",
    )


SQL_RML_CUSTOMER_TRIPLES = f"""
SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS subj,
       '{{0}}' AS pred, c_name AS obj, FALSE AS obj_is_iri FROM customer
UNION ALL
SELECT 'cust:' || CAST(c_custkey AS VARCHAR),
       'http://graft.example/vocab#inNation',
       'nation:' || CAST(c_nationkey AS VARCHAR), TRUE FROM customer
UNION ALL
SELECT 'cust:' || CAST(c_custkey AS VARCHAR),
       'http://graft.example/vocab#segment', c_mktsegment, FALSE
FROM customer
""".replace("{0}", VOCAB_PNAME)


def q_sparql_pred_counts(sf_dir: str):
    """The reference's aggregation conformance query (SPARQL.html:269-283)
    executed through the SPARQL-subset compiler over forged triples.
    Rows-only (input is the synthetic pages corpus, not an sf table)."""
    from ..query.sparql import run_select

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        n = max(64, min(2000, int(float(sf) * 20_000)))
    except ValueError:
        n = 200
    triples = forge_triples(rd.from_arrow(gen_pages_table(n)))
    return run_select(
        triples,
        "SELECT (COUNT(?o) AS ?count) ?p WHERE { ?s ?p ?o } GROUP BY ?p",
    )


def q_forge_pages(sf_dir: str):
    """Flagship KG pipeline over the deterministic synthetic pages corpus
    (scaled by sf: sf0.01 → 600 pages). Rows-only check — the real P/R
    gate is the pytest oracle-parity suite."""
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        n = max(64, int(float(sf) * 60_000))
    except ValueError:
        n = 200
    pages = rd.from_arrow(gen_pages_table(n))
    tri = forge_triples(pages)
    return tri.map_batches(
        lambda df: df[["subj", "pred", "obj", "obj_is_iri", "src_url"]],
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# r4 SPARQL extensions: typed literals / quads / new path forms /
# Dataset-returning SELECT (VERDICT r3 next-round items 1-3, 5)
# ---------------------------------------------------------------------------

VOCAB_LABEL = "http://graft.example/vocab#label"
VOCAB_INNATION = "http://graft.example/vocab#inNation"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"


def _lang_triples(sf_dir: str):
    """documents → typed-literal triples: a label literal carrying the
    document's language tag, and an nChars literal typed xsd:integer on
    even doc_ids (odd ids stay plain) — the LANG()/DATATYPE() fixture."""
    docs = _t(sf_dir, "documents", ["doc_id", "source", "lang", "n_chars"])

    def to_tri(df: pd.DataFrame) -> pd.DataFrame:
        subj = "doc:" + df["doc_id"].astype(str)
        labels = pd.DataFrame(
            {
                "subj": subj,
                "pred": VOCAB_LABEL,
                "obj": df["source"].astype(str),
                "obj_is_iri": False,
                "obj_lang": df["lang"].astype(str),
                "obj_datatype": "",
            }
        )
        typed = pd.DataFrame(
            {
                "subj": subj,
                "pred": VOCAB_NCHARS,
                "obj": df["n_chars"].astype(str),
                "obj_is_iri": False,
                "obj_lang": "",
                "obj_datatype": np.where(
                    df["doc_id"] % 2 == 0, XSD_INTEGER, ""
                ),
            }
        )
        return pd.concat([labels, typed], ignore_index=True)

    return docs.map_batches(to_tri, batch_format="pandas")


def q_sparql_lang_filter(sf_dir: str):
    """FILTER(LANG(?v) = "en") — typed-literal metadata rides from the
    match layer into the filter (reference parity: N3.js preserves
    langs, document.js:702-717)."""
    from ..query.sparql import run_select

    return run_select(
        _lang_triples(sf_dir),
        f'SELECT ?s ?v WHERE {{ ?s <{VOCAB_LABEL}> ?v . '
        'FILTER(LANG(?v) = "en") }',
    )


SQL_SPARQL_LANG_FILTER = """
SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS s, source AS v
FROM documents WHERE lang = 'en'
"""


def q_sparql_datatype_filter(sf_dir: str):
    """FILTER(DATATYPE(?v) = xsd:integer) over the typed nChars
    literals (even doc_ids carry the datatype)."""
    from ..query.sparql import run_select

    return run_select(
        _lang_triples(sf_dir),
        f"SELECT ?s ?v WHERE {{ ?s <{VOCAB_NCHARS}> ?v . "
        f"FILTER(DATATYPE(?v) = <{XSD_INTEGER}>) }}",
    )


SQL_SPARQL_DATATYPE_FILTER = """
SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS s,
       CAST(n_chars AS VARCHAR) AS v
FROM documents WHERE doc_id % 2 = 0
"""


VOCAB_TIER = "http://graft.example/vocab#tier"


def _customer_quads(sf_dir: str):
    """customer → (subj, pred, obj, graph) quads: one NAMED graph per
    market segment (the multi-project-corpus shape of SURVEY §1.3 —
    the reference's store is quads, document.js:736-740). Even custkeys
    additionally carry a ``tier`` quad in the SAME graph, giving
    OPTIONAL-inside-GRAPH a half-populated companion pattern."""
    cust = _t(sf_dir, "customer",
              ["c_custkey", "c_nationkey", "c_mktsegment"])

    def to_quads(df: pd.DataFrame) -> pd.DataFrame:
        base = pd.DataFrame(
            {
                "subj": "cust:" + df["c_custkey"].astype(str),
                "pred": VOCAB_INNATION,
                "obj": "nation:" + df["c_nationkey"].astype(str),
                "graph": "graph:" + df["c_mktsegment"].astype(str),
            }
        )
        even = df[df["c_custkey"] % 2 == 0]
        tiers = pd.DataFrame(
            {
                "subj": "cust:" + even["c_custkey"].astype(str),
                "pred": VOCAB_TIER,
                "obj": "tier:" + (even["c_custkey"] % 3).astype(str),
                "graph": "graph:" + even["c_mktsegment"].astype(str),
            }
        )
        return pd.concat([base, tiers], ignore_index=True)

    return cust.map_batches(to_quads, batch_format="pandas")


def q_sparql_graph_var(sf_dir: str):
    """GRAPH ?g { … }: the graph term binds like any variable, scoped
    to named graphs."""
    from ..query.sparql import run_select

    return run_select(
        _customer_quads(sf_dir),
        f"SELECT ?g ?s ?o WHERE {{ GRAPH ?g {{ ?s <{VOCAB_INNATION}> ?o "
        "} }",
    )


SQL_SPARQL_GRAPH_VAR = """
SELECT 'graph:' || c_mktsegment AS g,
       'cust:' || CAST(c_custkey AS VARCHAR) AS s,
       'nation:' || CAST(c_nationkey AS VARCHAR) AS o
FROM customer
"""


def q_sparql_graph_const(sf_dir: str):
    """GRAPH <iri> { … }: constant named-graph scoping."""
    from ..query.sparql import run_select

    return run_select(
        _customer_quads(sf_dir),
        "SELECT ?s ?o WHERE { GRAPH <graph:BUILDING> { "
        f"?s <{VOCAB_INNATION}> ?o }} }}",
    )


SQL_SPARQL_GRAPH_CONST = """
SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS s,
       'nation:' || CAST(c_nationkey AS VARCHAR) AS o
FROM customer WHERE c_mktsegment = 'BUILDING'
"""


def q_sparql_graph_filter(sf_dir: str):
    """FILTER inside GRAPH ?g (r4 verdict item #2): the filter is
    scoped to the graph group and applies before the group joins
    outward."""
    from ..query.sparql import run_select

    return run_select(
        _customer_quads(sf_dir),
        f"SELECT ?g ?s WHERE {{ GRAPH ?g {{ ?s <{VOCAB_INNATION}> ?o . "
        'FILTER(?o = "nation:3") } }',
    )


SQL_SPARQL_GRAPH_FILTER = """
SELECT 'graph:' || c_mktsegment AS g,
       'cust:' || CAST(c_custkey AS VARCHAR) AS s
FROM customer WHERE c_nationkey = 3
"""


def q_sparql_graph_optional(sf_dir: str):
    """OPTIONAL inside GRAPH ?g (r4 verdict item #2): the optional
    pattern evaluates in the SAME named-graph scope — tier quads exist
    only for even custkeys, so odd customers keep ?t unbound."""
    from ..query.sparql import run_select

    out = run_select(
        _customer_quads(sf_dir),
        f"SELECT ?g ?s ?o ?t WHERE {{ GRAPH ?g {{ "
        f"?s <{VOCAB_INNATION}> ?o . "
        f"OPTIONAL {{ ?s <{VOCAB_TIER}> ?t }} }} }}",
    )
    # normalize unbound (NaN) to empty string for the oracle compare
    out["t"] = out["t"].fillna("")
    return out


SQL_SPARQL_GRAPH_OPTIONAL = """
SELECT 'graph:' || c_mktsegment AS g,
       'cust:' || CAST(c_custkey AS VARCHAR) AS s,
       'nation:' || CAST(c_nationkey AS VARCHAR) AS o,
       CASE WHEN c_custkey % 2 = 0
            THEN 'tier:' || CAST(c_custkey % 3 AS VARCHAR)
            ELSE '' END AS t
FROM customer
"""


def q_graph_harmonic(sf_dir: str):
    """Sampled harmonic centrality (Boldi-Vigna) over the part graph:
    8 md5-chosen seeds, radius 4, |S| BFS traversals fused in ONE
    composite-key bfs_depths execution; contributions scaled by
    lcm(1..4)=12 so the sum is integer-exact on both engines."""
    from ..stages.graph import harmonic_centrality

    return harmonic_centrality(
        _part_graph_edges(sf_dir), num_seeds=8, max_depth=4
    )


SQL_GRAPH_HARMONIC = f"""
WITH RECURSIVE fe AS ({_PART_GRAPH_SQL}),
ev AS (SELECT CAST(s AS VARCHAR) s, CAST(o AS VARCHAR) o FROM fe),
-- DISTINCT, not UNION: inside a WITH RECURSIVE list DuckDB gives a
-- UNION CTE recursive (non-deduplicating) semantics even without a
-- self-reference, which would duplicate seed rows
nodes AS (SELECT DISTINCT node FROM
          (SELECT s AS node FROM ev UNION ALL SELECT o FROM ev)),
sd AS (SELECT node FROM nodes ORDER BY md5(node), node LIMIT 8),
r(seed, node, d) AS (
    SELECT node, node, 0 FROM sd
    UNION
    SELECT r.seed, ev.o, r.d + 1 FROM r JOIN ev ON ev.s = r.node
    WHERE r.d < 4
),
md AS (SELECT seed, node, MIN(d) AS d FROM r GROUP BY seed, node)
SELECT node, CAST(SUM(12 // d) AS BIGINT) AS h_scaled
FROM md WHERE d > 0 GROUP BY node
"""


def q_kg_shacl_values(sf_dir: str):
    """SHACL value-constraint validation (sh:pattern / sh:in /
    sh:class / sh:nodeKind — stages/shacl.shacl_validate_values) over a
    customer-derived KG: segments must match an allowed pattern/set,
    nation values must be typed cls:Nation (only even nation keys
    are), homepages must be IRIs (odd custkeys carry bare strings)."""
    from ..stages.shacl import shacl_validate_values

    cust = _t(sf_dir, "customer",
              ["c_custkey", "c_nationkey", "c_mktsegment"])
    nation = _t(sf_dir, "nation", ["n_nationkey"])

    def cust_triples(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].astype("int64")
        c = "cust:" + k.astype(str)
        home = np.where(
            (k % 2 == 0).to_numpy(),
            "http://ex.com/" + k.astype(str),
            "page-" + k.astype(str),
        )
        return pd.concat(
            [
                pd.DataFrame({"subj": c, "pred": "rdf:type",
                              "obj": "cls:Customer"}),
                pd.DataFrame({"subj": c, "pred": "p:segment",
                              "obj": df["c_mktsegment"].to_numpy()}),
                pd.DataFrame({"subj": c, "pred": "p:nation",
                              "obj": "n:" + df["c_nationkey"].astype(str)}),
                pd.DataFrame({"subj": c, "pred": "p:home", "obj": home}),
            ],
            ignore_index=True,
        )

    def nation_types(df: pd.DataFrame) -> pd.DataFrame:
        even = df[df["n_nationkey"] % 2 == 0]
        return pd.DataFrame(
            {"subj": "n:" + even["n_nationkey"].astype(str),
             "pred": "rdf:type", "obj": "cls:Nation"}
        )

    triples = cust.map_batches(
        cust_triples, batch_format="pandas"
    ).union(nation.map_batches(nation_types, batch_format="pandas"))
    shapes = [
        {"shape_id": "s-seg", "target_class": "cls:Customer",
         "pred": "p:segment",
         "pattern": "(AUTOMOBILE|BUILDING|MACHINERY)",
         "in_set": ["AUTOMOBILE", "BUILDING", "MACHINERY", "HOUSEHOLD"]},
        {"shape_id": "s-nat", "target_class": "cls:Customer",
         "pred": "p:nation", "value_class": "cls:Nation"},
        {"shape_id": "s-iri", "target_class": "cls:Customer",
         "pred": "p:home", "node_kind_iri": True},
    ]
    return shacl_validate_values(triples, shapes)


SQL_KG_SHACL_VALUES = """
SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS subj,
       's-seg' AS shape_id, 'p:segment' AS pred,
       c_mktsegment AS obj, 'pattern' AS violation
FROM customer
WHERE NOT regexp_full_match(c_mktsegment,
                            '(AUTOMOBILE|BUILDING|MACHINERY)')
UNION ALL
SELECT 'cust:' || CAST(c_custkey AS VARCHAR), 's-seg', 'p:segment',
       c_mktsegment, 'in'
FROM customer
WHERE c_mktsegment NOT IN
      ('AUTOMOBILE', 'BUILDING', 'MACHINERY', 'HOUSEHOLD')
UNION ALL
SELECT 'cust:' || CAST(c_custkey AS VARCHAR), 's-nat', 'p:nation',
       'n:' || CAST(c_nationkey AS VARCHAR), 'class'
FROM customer WHERE c_nationkey % 2 = 1
UNION ALL
SELECT 'cust:' || CAST(c_custkey AS VARCHAR), 's-iri', 'p:home',
       'page-' || CAST(c_custkey AS VARCHAR), 'nodeKind'
FROM customer WHERE c_custkey % 2 = 1
"""


def q_kg_entity_resolution(sf_dir: str):
    """E2E entity resolution — the KG-construction core loop: two
    'sources' assert label triples for overlapping entities under
    different spellings (pa:<name> vs pb:<name-with-e-dropped>), fuzzy
    trigram-Jaccard matching (stages/resolve.fuzzy_name_join, exact
    prefix filtering) emits owl:sameAs candidates, and
    stages/canonicalize.sameas_canonicalize merges the identities and
    rewrites the graph to canonical IRIs. The oracle replays the WHOLE
    chain: trigram Jaccard → sameAs edges → recursive closure →
    min-label canon → COALESCE rewrite → DISTINCT."""
    from ..shuffle import bucket_tag, snap_lineage
    from ..stages.canonicalize import sameas_canonicalize
    from ..stages.resolve import fuzzy_name_join

    part = _t(sf_dir, "part", ["p_name"])

    def distinct_names(ds, make):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            out = make(df).drop_duplicates()
            return out.assign(_bucket=bucket_tag(out, out.columns[0], 16))

        return (
            ds.map_batches(tag, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(
                lambda g: g.drop_duplicates(
                    subset=[g.columns[0]]).drop(columns=["_bucket"]),
                batch_format="pandas",
            )
        )

    # each side feeds BOTH the fuzzy join and its triple emitter —
    # snap or Ray replays the whole distinct sub-plan per consumer
    # (CLAUDE.md multi-consumer lesson)
    lnames = snap_lineage(distinct_names(
        part, lambda df: pd.DataFrame(
            {"lid": df["p_name"], "l_name": df["p_name"]})
    ))
    rnames = snap_lineage(distinct_names(
        part, lambda df: pd.DataFrame(
            {"rid": df["p_name"].str.replace("e", "", regex=False)}
        ).assign(r_name=lambda d: d["rid"])
    ))
    matches = fuzzy_name_join(lnames, rnames, threshold=0.375)

    a_triples = lnames.map_batches(
        lambda df: pd.DataFrame(
            {"subj": "pa:" + df["lid"], "pred": "p:label",
             "obj": df["l_name"]}),
        batch_format="pandas",
    )
    b_triples = rnames.map_batches(
        lambda df: pd.DataFrame(
            {"subj": "pb:" + df["rid"], "pred": "p:label",
             "obj": df["r_name"]}),
        batch_format="pandas",
    )
    sameas = matches.map_batches(
        lambda df: pd.DataFrame(
            {"subj": "pb:" + df["rid"].astype(str),
             "pred": "owl:sameAs",
             "obj": "pa:" + df["lid"].astype(str)}),
        batch_format="pandas",
    )
    kg = a_triples.union(b_triples, sameas)
    return sameas_canonicalize(kg, sameas_pred="owl:sameAs")


SQL_KG_ENTITY_RESOLUTION = """
WITH RECURSIVE
ln AS (SELECT DISTINCT p_name nm FROM part),
rn AS (SELECT DISTINCT replace(p_name, 'e', '') nm FROM part),
lg AS (
    SELECT DISTINCT nm, substr(nm, CAST(i AS INT), 3) g
    FROM ln, unnest(generate_series(1, GREATEST(length(nm) - 2, 1))) t(i)
),
rg AS (
    SELECT DISTINCT nm, substr(nm, CAST(i AS INT), 3) g
    FROM rn, unnest(generate_series(1, GREATEST(length(nm) - 2, 1))) t(i)
),
ls AS (SELECT nm, COUNT(*) n FROM lg GROUP BY nm),
rs AS (SELECT nm, COUNT(*) n FROM rg GROUP BY nm),
inter AS (
    SELECT a.nm lnm, b.nm rnm, COUNT(*) c
    FROM lg a JOIN rg b ON a.g = b.g GROUP BY a.nm, b.nm
),
mt AS (
    SELECT i.lnm, i.rnm
    FROM inter i JOIN ls x ON i.lnm = x.nm JOIN rs y ON i.rnm = y.nm
    WHERE FLOOR(CAST(i.c AS DOUBLE) / (x.n + y.n - i.c) * 1e6) / 1e6
          >= 0.375
),
trip AS (
    SELECT 'pa:' || nm AS subj, 'p:label' AS pred, nm AS obj FROM ln
    UNION ALL
    SELECT 'pb:' || nm, 'p:label', nm FROM rn
    UNION ALL
    SELECT 'pb:' || rnm, 'owl:sameAs', 'pa:' || lnm FROM mt
),
e AS (
    SELECT subj AS x, obj AS y FROM trip WHERE pred = 'owl:sameAs'
    UNION
    SELECT obj, subj FROM trip WHERE pred = 'owl:sameAs'
),
rr(x, y) AS (
    SELECT x, y FROM e
    UNION
    SELECT rr.x, e.y FROM rr JOIN e ON rr.y = e.x WHERE e.y <> rr.x
),
canon AS (
    SELECT x AS node, LEAST(x, MIN(y)) AS label FROM rr GROUP BY x
)
SELECT DISTINCT
    COALESCE(cs.label, t.subj) AS subj,
    t.pred,
    COALESCE(co.label, t.obj) AS obj
FROM trip t
LEFT JOIN canon cs ON cs.node = t.subj
LEFT JOIN canon co ON co.node = t.obj
WHERE t.pred <> 'owl:sameAs'
"""


def q_docs_ccnet_buckets(sf_dir: str):
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020):
    corpus-trained bigram-LM scores → per-language head/middle/tail
    NTILE(3) by descending score (stages/sampling.grouped_rank — one
    composite (lang, score-bucket) shuffle, driver sees only the
    langs×buckets histogram)."""
    from ..shuffle import bindings_join
    from ..stages.lm import bigram_logprob_scores
    from ..stages.sampling import grouped_rank

    scores = bigram_logprob_scores(
        _t(sf_dir, "documents", ["doc_id", "text"])
    )
    langs = _t(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        lambda df: df[df["lang"].notna()], batch_format="pandas"
    )
    joined = bindings_join(scores, langs, on=["doc_id"]).map_batches(
        # post-join dtype restore (bindings_join object-fills)
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "lm_score": df["lm_score"].astype("float64"),
                "lang": df["lang"].astype(str),
            }
        ),
        batch_format="pandas",
    )
    out = grouped_rank(
        joined, "lm_score", "lang", id_col="doc_id",
        descending=True, ntiles=3,
    )
    return out.map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "lang": df["lang"],
                "lm_score": df["lm_score"].astype("float64"),
                "rnk": df["rank"].astype("int64"),
                "tile": df["ntile"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


SQL_DOCS_CCNET_BUCKETS = r"""
WITH split AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'),
                       w -> w <> '') AS ws
    FROM documents
),
words AS (
    SELECT doc_id, unnest(ws) AS w,
           unnest(range(1, len(ws) + 1)) AS ord
    FROM split
),
uni AS (SELECT w, COUNT(*) AS c1 FROM words GROUP BY w),
vv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
bi AS (
    SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c2
    FROM words a JOIN words b
      ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
    GROUP BY a.w, b.w
),
docbi AS (
    SELECT a.doc_id, a.w AS w1, b.w AS w2
    FROM words a JOIN words b
      ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
),
lp AS (
    SELECT d.doc_id,
           ln((bi.c2 + 1.0) / (uni.c1 + (SELECT v FROM vv))) AS lp
    FROM docbi d
    JOIN bi ON bi.w1 = d.w1 AND bi.w2 = d.w2
    JOIN uni ON uni.w = d.w1
),
means AS (
    SELECT doc_id, FLOOR(AVG(lp) * 1e4) / 1e4 AS lm_score
    FROM lp GROUP BY doc_id
),
scored AS (
    SELECT d.doc_id, d.lang, COALESCE(m.lm_score, 0.0) AS lm_score
    FROM documents d LEFT JOIN means m USING (doc_id)
    WHERE d.lang IS NOT NULL
)
SELECT doc_id, lang, lm_score,
       ROW_NUMBER() OVER (PARTITION BY lang
                          ORDER BY lm_score DESC, doc_id) AS rnk,
       NTILE(3) OVER (PARTITION BY lang
                      ORDER BY lm_score DESC, doc_id) AS tile
FROM scored
"""


def q_docs_dsir_select(sf_dir: str):
    """DSIR importance-resampling selection (Xie et al. 2023): hashed-
    bigram unigram models for the TARGET (lang='en') vs the RAW corpus,
    integer-quantized log-likelihood-ratio weights, deterministic top-k
    (stages/dsir.dsir_select; the md5 feature rule, ln quantization and
    integer dot are replayed verbatim in SQL)."""
    from ..stages.dsir import dsir_select

    return dsir_select(
        _t(sf_dir, "documents", ["doc_id", "text", "lang"]),
        target_expr="lang == 'en'",
        k=300,
        dim=256,
    )


SQL_DOCS_DSIR_SELECT = r"""
WITH toks AS (
    SELECT doc_id, lang,
           regexp_extract_all(COALESCE(text, ''), '\S+') AS ws,
           CAST(len(regexp_extract_all(COALESCE(text, ''), '\S+'))
                AS BIGINT) AS n
    FROM documents
),
big AS (
    SELECT doc_id, lang,
           ws[CAST(s.i AS INT)] || ' ' || ws[CAST(s.i + 1 AS INT)] AS bg
    FROM toks, unnest(generate_series(1, n - 1)) s(i)
    WHERE n >= 2
),
hb AS (
    SELECT doc_id, lang,
           CAST(CONCAT('0x', substr(md5(bg), 1, 10)) AS BIGINT) % 256 AS f
    FROM big
),
model AS (
    SELECT f,
           SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc,
           COUNT(*) AS rc
    FROM hb GROUP BY f
),
tot AS (SELECT SUM(tc) AS tsum, SUM(rc) AS rsum FROM model),
lq AS (
    SELECT f,
           CAST(FLOOR((ln(tc + 1) - ln(tsum + 256)
                       - ln(rc + 1) + ln(rsum + 256)) * 1e6) AS BIGINT)
               AS q
    FROM model, tot
),
wsum AS (
    SELECT hb.doc_id, SUM(lq.q) AS w
    FROM hb JOIN lq USING (f) GROUP BY hb.doc_id
),
allw AS (
    SELECT d.doc_id, CAST(COALESCE(wsum.w, 0) AS BIGINT) AS w
    FROM documents d LEFT JOIN wsum ON d.doc_id = wsum.doc_id
)
SELECT doc_id, w FROM allw ORDER BY w DESC, doc_id ASC LIMIT 300
"""


VOCAB_PARENTOF = "http://graft.example/vocab#parentOf"
VOCAB_BILLTO = "http://graft.example/vocab#billTo"
VOCAB_PHONE = "http://graft.example/vocab#phone"


def q_kg_owl_entailment(sf_dir: str):
    """OWL-RL property-axiom closure (prp-inv + prp-trp) over the part
    childOf hierarchy: childOf is declared transitive with inverse
    parentOf, so the result is the recursive closure plus its full
    inverse image plus the axiom triples (stages/owl.owl_entail —
    composite-keyed single-execution closure)."""
    from ..stages.owl import OWL_INVERSE_OF, OWL_TRANSITIVE, RDF_TYPE, owl_entail

    onto = pd.DataFrame(
        [
            (VOCAB_CHILDOF, OWL_INVERSE_OF, VOCAB_PARENTOF),
            (VOCAB_CHILDOF, RDF_TYPE, OWL_TRANSITIVE),
        ],
        columns=["subj", "pred", "obj"],
    )

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        child = df[df["p_partkey"] > 1]
        return pd.DataFrame(
            {
                "subj": "part:" + child["p_partkey"].astype(str),
                "pred": VOCAB_CHILDOF,
                "obj": "part:" + (child["p_partkey"] // 2).astype(str),
            }
        )

    triples = (
        _t(sf_dir, "part", ["p_partkey"])
        .map_batches(edges, batch_format="pandas")
        .union(rd.from_pandas(onto))
    )
    return owl_entail(triples)


SQL_KG_OWL_ENTAILMENT = """
WITH RECURSIVE e AS (
    SELECT 'part:' || CAST(p_partkey AS VARCHAR) AS s,
           'part:' || CAST(p_partkey // 2 AS VARCHAR) AS o
    FROM part WHERE p_partkey > 1
), r(s, o) AS (
    SELECT s, o FROM e
    UNION
    SELECT r.s, e.o FROM r JOIN e ON r.o = e.s
)
SELECT s AS subj, 'http://graft.example/vocab#childOf' AS pred,
       o AS obj FROM r
UNION
SELECT o, 'http://graft.example/vocab#parentOf', s FROM r
UNION
SELECT 'http://graft.example/vocab#childOf',
       'http://www.w3.org/2002/07/owl#inverseOf',
       'http://graft.example/vocab#parentOf'
UNION
SELECT 'http://graft.example/vocab#childOf',
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
       'http://www.w3.org/2002/07/owl#TransitiveProperty'
"""


def q_kg_functional_sameas(sf_dir: str):
    """owl:sameAs inference from property axioms: billTo is FUNCTIONAL
    (two alias spellings of the bill-to customer per order co-refer)
    and phone is INVERSE-FUNCTIONAL (customers sharing a phone value
    co-refer, chained per group, not all-paired — stages/owl
    .functional_sameas)."""
    from ..stages.owl import (
        OWL_FUNCTIONAL, OWL_INV_FUNCTIONAL, RDF_TYPE, functional_sameas,
    )

    onto = pd.DataFrame(
        [
            (VOCAB_BILLTO, RDF_TYPE, OWL_FUNCTIONAL),
            (VOCAB_PHONE, RDF_TYPE, OWL_INV_FUNCTIONAL),
        ],
        columns=["subj", "pred", "obj"],
    )

    def order_aliases(df: pd.DataFrame) -> pd.DataFrame:
        subj = "order:" + df["o_orderkey"].astype(str)
        ck = df["o_custkey"].astype(str)
        return pd.concat(
            [
                pd.DataFrame({"subj": subj, "pred": VOCAB_BILLTO,
                              "obj": "cust:" + ck}),
                pd.DataFrame({"subj": subj, "pred": VOCAB_BILLTO,
                              "obj": "c/" + ck}),
            ],
            ignore_index=True,
        )

    def cust_phones(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": "cust:" + df["c_custkey"].astype(str),
                "pred": VOCAB_PHONE,
                "obj": "phone:" + df["c_nationkey"].astype(str),
            }
        )

    triples = (
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        .map_batches(order_aliases, batch_format="pandas")
        .union(
            _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
                cust_phones, batch_format="pandas"
            ),
            rd.from_pandas(onto),
        )
    )
    return functional_sameas(triples)


SQL_KG_FUNCTIONAL_SAMEAS = """
WITH fp AS (
    SELECT DISTINCT 'c/' || CAST(o_custkey AS VARCHAR) AS subj,
                    'cust:' || CAST(o_custkey AS VARCHAR) AS obj
    FROM orders
), iv AS (
    SELECT DISTINCT 'phone:' || CAST(c_nationkey AS VARCHAR) AS k,
                    'cust:' || CAST(c_custkey AS VARCHAR) AS v
    FROM customer
), lagd AS (
    SELECT k, lag(v) OVER (PARTITION BY k ORDER BY v) AS pv, v FROM iv
)
SELECT subj, 'http://www.w3.org/2002/07/owl#sameAs' AS pred, obj FROM fp
UNION
SELECT pv, 'http://www.w3.org/2002/07/owl#sameAs', v
FROM lagd WHERE pv IS NOT NULL
"""


def q_sparql_graph_minus(sf_dir: str):
    """MINUS inside GRAPH ?g (r5): the anti-join is scoped to the named
    graph — tier quads exist only for even custkeys (in the same graph),
    so exactly the odd customers survive."""
    from ..query.sparql import run_select

    return run_select(
        _customer_quads(sf_dir),
        f"SELECT ?g ?s ?o WHERE {{ GRAPH ?g {{ "
        f"?s <{VOCAB_INNATION}> ?o . "
        f"MINUS {{ ?s <{VOCAB_TIER}> ?t }} }} }}",
    )


SQL_SPARQL_GRAPH_MINUS = """
SELECT 'graph:' || c_mktsegment AS g,
       'cust:' || CAST(c_custkey AS VARCHAR) AS s,
       'nation:' || CAST(c_nationkey AS VARCHAR) AS o
FROM customer WHERE c_custkey % 2 = 1
"""


def q_sparql_zeroone_path(sf_dir: str):
    """Zero-or-one path ``childOf?``: single hops ∪ reflexive pairs over
    the nodes incident to childOf edges (set semantics)."""
    from ..query.sparql import run_select

    return run_select(
        _part_triples(sf_dir),
        f"SELECT ?s ?o WHERE {{ ?s <{VOCAB_CHILDOF}>? ?o }}",
    )


SQL_SPARQL_ZEROONE_PATH = """
WITH e AS (
    SELECT p_partkey AS s, p_partkey // 2 AS o FROM part WHERE p_partkey > 1
), nodes AS (
    SELECT s AS k FROM e UNION SELECT o FROM e
)
SELECT 'part:' || CAST(s AS VARCHAR) AS s,
       'part:' || CAST(o AS VARCHAR) AS o FROM e
UNION
SELECT 'part:' || CAST(k AS VARCHAR), 'part:' || CAST(k AS VARCHAR)
FROM nodes
"""


def q_sparql_neg_path(sf_dir: str):
    """Negated property set ``!(childOf)``: one hop over any OTHER
    predicate — here exactly the pname label edges."""
    from ..query.sparql import run_select

    return run_select(
        _part_triples(sf_dir),
        f"SELECT ?s ?o WHERE {{ ?s !(<{VOCAB_CHILDOF}>) ?o }}",
    )


SQL_SPARQL_NEG_PATH = """
SELECT 'part:' || CAST(p_partkey AS VARCHAR) AS s, p_name AS o FROM part
"""


def q_sparql_optional_path(sf_dir: str):
    """OPTIONAL { ?s childOf+ ?a }: a property path inside an OPTIONAL
    group (left join against the closure; roots keep an unbound ?a,
    serialized 'none' on both sides for the hash compare)."""
    from ..query.sparql import run_select

    out = run_select(
        _part_triples(sf_dir),
        f"SELECT ?s ?a WHERE {{ ?s <{VOCAB_PNAME}> ?n . "
        f"OPTIONAL {{ ?s <{VOCAB_CHILDOF}>+ ?a }} }}",
    )
    out = out.copy()
    out["a"] = out["a"].fillna("none")
    return out


SQL_SPARQL_OPTIONAL_PATH = """
WITH RECURSIVE e AS (
    SELECT p_partkey AS s, p_partkey // 2 AS o FROM part WHERE p_partkey > 1
), r(s, o) AS (
    SELECT s, o FROM e
    UNION
    SELECT r.s, e.o FROM r JOIN e ON r.o = e.s
)
SELECT 'part:' || CAST(p.p_partkey AS VARCHAR) AS s,
       COALESCE('part:' || CAST(r.o AS VARCHAR), 'none') AS a
FROM part p LEFT JOIN r ON r.s = p.p_partkey
"""


def q_sparql_grouped_path(sf_dir: str):
    """Grouped sequence path ``(childOf/childOf)+``: the closure of the
    COMPOSED two-hop relation — ancestors at even distance (kv_join hop
    composition feeding closure_of_edges_ds)."""
    from ..query.sparql import run_select

    return run_select(
        _part_triples(sf_dir),
        f"SELECT ?s ?o WHERE {{ ?s (<{VOCAB_CHILDOF}>/<{VOCAB_CHILDOF}>)+"
        " ?o }",
    )


SQL_SPARQL_GROUPED_PATH = """
WITH RECURSIVE e AS (
    SELECT p_partkey AS s, p_partkey // 2 AS o FROM part WHERE p_partkey > 1
), e2 AS (
    SELECT a.s, b.o FROM e a JOIN e b ON a.o = b.s
), r(s, o) AS (
    SELECT s, o FROM e2
    UNION
    SELECT r.s, e2.o FROM r JOIN e2 ON r.o = e2.s
)
SELECT 'part:' || CAST(s AS VARCHAR) AS s,
       'part:' || CAST(o AS VARCHAR) AS o
FROM r
"""


def q_sparql_neg_inverse(sf_dir: str):
    """Negated property set with an INVERSE member ``!(^childOf)``
    (r4 verdict item #6): a reverse hop over any predicate not in the
    inverse set — here the pname reversals only."""
    from ..query.sparql import run_select

    return run_select(
        _part_triples(sf_dir),
        f"SELECT ?s ?o WHERE {{ ?s !(^<{VOCAB_CHILDOF}>) ?o }}",
    )


SQL_SPARQL_NEG_INVERSE = """
SELECT p_name AS s, 'part:' || CAST(p_partkey AS VARCHAR) AS o
FROM part
"""


def q_sparql_lang_alt_path(sf_dir: str):
    """LANG() over a variable bound by an ALTERNATION path (r4 verdict
    item #6): literal metadata rides through single-hop path forms."""
    from ..query.sparql import run_select

    return run_select(
        _lang_triples(sf_dir),
        f"SELECT ?s ?v WHERE {{ ?s (<{VOCAB_LABEL}>|<{VOCAB_NCHARS}>) "
        '?v . FILTER(LANG(?v) = "en") }',
    )


SQL_SPARQL_LANG_ALT_PATH = """
SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS s, source AS v
FROM documents WHERE lang = 'en'
"""


def q_sparql_select_expr(sf_dir: str):
    """SELECT expression projections — (STRLEN(?n) AS ?len) and
    (CONCAT(…) AS ?tag) — through the BIND-rewrite pre-pass (these were
    silently dropped before r4's fix; the oracle pins the rewritten
    semantics)."""
    from ..query.sparql import run_select

    out = run_select(
        _part_triples(sf_dir),
        f"SELECT ?s (STRLEN(?n) AS ?len) (CONCAT(?s, \"#\", ?n) AS ?tag) "
        f"WHERE {{ ?s <{VOCAB_PNAME}> ?n }}",
    )
    out["len"] = out["len"].astype(np.int64)
    return out.sort_values("s").reset_index(drop=True)[["s", "len", "tag"]]


SQL_SPARQL_SELECT_EXPR = """
SELECT 'part:' || CAST(p_partkey AS VARCHAR) AS s,
       CAST(length(p_name) AS BIGINT) AS len,
       'part:' || CAST(p_partkey AS VARCHAR) || '#' || p_name AS tag
FROM part ORDER BY s
"""


def q_sparql_agg_expr(sf_dir: str):
    """Aggregates over EXPRESSIONS — (SUM(STRLEN(?n)) AS ?total) — via
    the pre-grouping BIND rewrite (SPARQL evaluation order)."""
    from ..query.sparql import run_select

    out = run_select(
        _part_triples(sf_dir),
        f"SELECT (SUM(STRLEN(?n)) AS ?total) (COUNT(?n) AS ?c) "
        f"WHERE {{ ?s <{VOCAB_PNAME}> ?n }}",
    )
    out["total"] = out["total"].astype(np.int64)
    out["c"] = out["c"].astype(np.int64)
    return out[["total", "c"]]


SQL_SPARQL_AGG_EXPR = """
SELECT CAST(SUM(length(p_name)) AS BIGINT) AS total,
       CAST(COUNT(*) AS BIGINT) AS c
FROM part
"""


def q_sparql_orderby_agg_expr(sf_dir: str):
    """ORDER BY over an aggregate-alias EXPRESSION — DESC(?c * 2) —
    evaluated POST-grouping (r5: the former loud refusal is now a
    post-aggregation bind; with LIMIT the ordering is load-bearing for
    the hash, not just presentation)."""
    from ..query.sparql import run_select

    out = run_select(
        _part_triples(sf_dir),
        f"SELECT ?o (COUNT(?s) AS ?c) "
        f"WHERE {{ ?s <{VOCAB_CHILDOF}> ?o }} "
        f"GROUP BY ?o ORDER BY DESC(?c * 2) ?o LIMIT 20",
    )
    out["c"] = out["c"].astype(np.int64)
    return out[["o", "c"]]


SQL_SPARQL_ORDERBY_AGG_EXPR = """
WITH e AS (
    SELECT 'part:' || CAST(p_partkey AS VARCHAR) AS s,
           'part:' || CAST(p_partkey // 2 AS VARCHAR) AS o
    FROM part WHERE p_partkey > 1
)
SELECT o, CAST(COUNT(*) AS BIGINT) AS c
FROM e GROUP BY o
ORDER BY COUNT(*) * 2 DESC, o
LIMIT 20
"""


def q_sparql_select_dataset(sf_dir: str):
    """Dataset-returning SELECT (collect=False): the closure-sized
    binding set stays distributed — no ``to_pandas`` inside the
    operator (r3 verdict item #1); the driver materializes only for
    the compare."""
    from ..query.sparql import run_select

    return run_select(
        _part_triples(sf_dir),
        f"SELECT ?s ?o WHERE {{ ?s <{VOCAB_CHILDOF}>+ ?o }}",
        collect=False,
    )


SQL_SPARQL_SELECT_DATASET = """
WITH RECURSIVE e AS (
    SELECT p_partkey AS s, p_partkey // 2 AS o FROM part WHERE p_partkey > 1
), r(s, o) AS (
    SELECT s, o FROM e
    UNION
    SELECT r.s, e.o FROM r JOIN e ON r.o = e.s
)
SELECT 'part:' || CAST(s AS VARCHAR) AS s,
       'part:' || CAST(o AS VARCHAR) AS o
FROM r
"""


def q_sparql_group_agg_dataset(sf_dir: str):
    """Dataset-returning GROUP BY aggregate (collect=False) over a
    HIGH-CARDINALITY key — one group per part subject, so the result is
    corpus-sized and must stay distributed (r4 verdict item #1: the
    last driver-bound query family). HAVING exercises the
    post-aggregate filter stage on the Dataset path."""
    from ..query.sparql import run_select

    return run_select(
        _part_triples(sf_dir),
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?s "
        "HAVING (?n > 1)",
        collect=False,
    )


def q_sparql_orderby_dataset(sf_dir: str):
    """Dataset-returning ORDER BY + LIMIT (collect=False): the sorted
    result stays distributed (full Dataset.sort + top-k) — set equality
    with the oracle's ORDER BY/LIMIT proves the GLOBAL ordering was
    right (a wrong sort returns a different top-40 set). Closes the
    last collect=False refusal short of OFFSET."""
    from ..query.sparql import run_select

    ds = run_select(
        _part_triples(sf_dir),
        f"SELECT ?s ?o WHERE {{ ?s <{VOCAB_PNAME}> ?o }} "
        "ORDER BY DESC(?o) ?s LIMIT 40",
        collect=False,
    )
    out = ds.to_pandas()  # presentation edge only — 40 rows
    return out.sort_values(["s", "o"]).reset_index(drop=True)


SQL_SPARQL_ORDERBY_DATASET = """
SELECT s, o FROM (
    SELECT 'part:' || CAST(p_partkey AS VARCHAR) AS s, p_name AS o
    FROM part
    ORDER BY p_name DESC, s LIMIT 40
) ORDER BY s, o
"""


# every part subject carries a pname triple, plus a childOf edge when
# p_partkey > 1 — so COUNT(?o) per subject is 2 iff p_partkey > 1, and
# HAVING (?n > 1) keeps exactly those
SQL_SPARQL_GROUP_AGG_DATASET = """
SELECT 'part:' || CAST(p_partkey AS VARCHAR) AS s,
       CAST(2 AS BIGINT) AS n
FROM part
WHERE p_partkey > 1
"""


def q_docs_top_terms(sf_dir: str):
    """Exact corpus-wide heavy hitters: top-20 whitespace terms via the
    mergeable count-combiner → term-bucket shuffle (stages/sketches)."""
    from ..stages.sketches import corpus_top_terms

    return corpus_top_terms(_t(sf_dir, "documents", ["text"]), k=20)


SQL_DOCS_TOP_TERMS = r"""
WITH words AS (
    SELECT unnest(regexp_extract_all(COALESCE(text, ''), '\S+')) AS term
    FROM documents
),
counts AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS count
    FROM words GROUP BY term
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY count DESC, term) AS BIGINT)
           AS rank,
       term, count
FROM counts
ORDER BY count DESC, term
LIMIT 20
"""


def q_events_distinct_kmv(sf_dir: str):
    """KMV approximate-distinct sketch over event ids (k=256 smallest
    md5 values; the oracle replays the ESTIMATOR exactly, not a
    tolerance band — stages/sketches.approx_distinct_kmv)."""
    from ..stages.sketches import approx_distinct_kmv

    return approx_distinct_kmv(
        _t(sf_dir, "events", ["event_id"]), "event_id", k=256
    )


SQL_EVENTS_DISTINCT_KMV = r"""
WITH h AS (
    SELECT DISTINCT md5(CAST(event_id AS VARCHAR)) AS hx
    FROM events WHERE event_id IS NOT NULL
),
r AS (
    SELECT hx, ROW_NUMBER() OVER (ORDER BY hx) AS rn,
           COUNT(*) OVER () AS n
    FROM h
)
SELECT CAST(256 AS BIGINT) AS k,
       CAST(LEAST(n, 256) AS BIGINT) AS n_hashes,
       CAST(CASE WHEN n < 256 THEN n
                 ELSE FLOOR(255 / (CAST(CONCAT('0x', substr(hx, 1, 10))
                                        AS BIGINT) / POWER(16, 10)))
            END AS BIGINT) AS est_distinct
FROM r
WHERE rn = LEAST(n, 256)
"""


def q_docs_inverted_index(sf_dir: str):
    """Inverted index (term → df + capped ascending posting list) over
    the documents corpus; postings capped at 100 ids (deterministic
    smallest-first, counted in metrics — stages/index)."""
    from ..stages.index import inverted_index

    return inverted_index(
        _t(sf_dir, "documents", ["doc_id", "text"]), postings_cap=100
    )


SQL_DOCS_INVERTED_INDEX = r"""
WITH pairs AS (
    SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id,
               unnest(regexp_extract_all(COALESCE(text, ''), '\S+'))
                   AS term
        FROM documents
    )
),
ranked AS (
    SELECT term, doc_id,
           ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY term) AS df
    FROM pairs
)
SELECT term, CAST(df AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS postings
FROM ranked
WHERE rn <= 100
GROUP BY term, df
"""


def q_docs_bm25(sf_dir: str):
    """Okapi BM25 top-10 for the 2-term query (join, window) — two
    terms so the float sum is order-independent (IEEE addition is
    commutative; three-plus terms would need an ordered SQL SUM).
    Lucene-style non-negative idf; scores FLOOR-truncated at 1e-6
    (stages/index.bm25_topk)."""
    from ..stages.index import bm25_topk

    out = bm25_topk(
        _t(sf_dir, "documents", ["doc_id", "text"]),
        ["join", "window"], k=10,
    )
    return out.rename(columns={"id": "doc_id"})


SQL_DOCS_BM25 = r"""
WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
toks AS (
    SELECT doc_id,
           unnest(regexp_extract_all(COALESCE(text, ''), '\S+')) AS term
    FROM documents
),
dl AS (
    SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl
    FROM toks GROUP BY doc_id
),
avgdl AS (SELECT SUM(dl) / (SELECT n FROM n) AS a FROM dl),
q(term) AS (VALUES ('join'), ('window')),
df AS (
    SELECT q.term,
           CAST(COUNT(DISTINCT toks.doc_id) AS DOUBLE) AS df
    FROM q LEFT JOIN toks ON toks.term = q.term
    GROUP BY q.term
),
tf AS (
    SELECT toks.doc_id, toks.term, CAST(COUNT(*) AS DOUBLE) AS tf
    FROM toks JOIN q ON toks.term = q.term
    GROUP BY toks.doc_id, toks.term
),
s AS (
    SELECT tf.doc_id,
           SUM(ln(((SELECT n FROM n) - df.df + 0.5) / (df.df + 0.5) + 1)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75
                                 + 0.75 * dl.dl / (SELECT a FROM avgdl))))
               AS raw
    FROM tf
    JOIN df ON tf.term = df.term
    JOIN dl ON dl.doc_id = tf.doc_id
    GROUP BY tf.doc_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY FLOOR(raw * 1e6) / 1e6 DESC,
                               doc_id) AS BIGINT) AS rank,
       doc_id,
       FLOOR(raw * 1e6) / 1e6 AS score
FROM s
WHERE FLOOR(raw * 1e6) / 1e6 > 0
ORDER BY FLOOR(raw * 1e6) / 1e6 DESC, doc_id
LIMIT 10
"""


def q_kg_snapshot_delta(sf_dir: str):
    """Incremental-maintenance delta between two KG snapshots (RML doc
    triples over two overlapping document subsets): one composite-hash
    bucket shuffle, both directions in one pass (stages/delta)."""
    from ..stages.delta import kg_delta

    docs = _t(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])

    def to_triples(df: pd.DataFrame) -> pd.DataFrame:
        subj = "doc:" + df["doc_id"].astype(str)
        return pd.concat(
            [
                pd.DataFrame({"subj": subj, "pred": VOCAB_LANG,
                              "obj": df["lang"]}),
                pd.DataFrame({"subj": subj, "pred": VOCAB_SOURCE,
                              "obj": df["source"]}),
                pd.DataFrame({"subj": subj, "pred": VOCAB_NCHARS,
                              "obj": df["n_chars"].astype(str)}),
            ],
            ignore_index=True,
        )

    def subset(mod: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return to_triples(df[df["doc_id"] % mod != 0])

        return fn

    old = docs.map_batches(subset(3), batch_format="pandas")
    new = docs.map_batches(subset(5), batch_format="pandas")
    return kg_delta(old, new)


SQL_KG_SNAPSHOT_DELTA = f"""
WITH trip AS (
    SELECT doc_id, 'doc:' || CAST(doc_id AS VARCHAR) AS subj,
           '{VOCAB_LANG}' AS pred, lang AS obj FROM documents
    UNION ALL
    SELECT doc_id, 'doc:' || CAST(doc_id AS VARCHAR), '{VOCAB_SOURCE}',
           source FROM documents
    UNION ALL
    SELECT doc_id, 'doc:' || CAST(doc_id AS VARCHAR), '{VOCAB_NCHARS}',
           CAST(n_chars AS VARCHAR) FROM documents
),
old AS (SELECT subj, pred, obj FROM trip WHERE doc_id % 3 <> 0),
new AS (SELECT subj, pred, obj FROM trip WHERE doc_id % 5 <> 0),
adds AS (SELECT * FROM new EXCEPT SELECT * FROM old),
dels AS (SELECT * FROM old EXCEPT SELECT * FROM new)
SELECT 'add' AS op, subj, pred, obj FROM adds
UNION ALL
SELECT 'del' AS op, subj, pred, obj FROM dels
"""


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3 shape (shipping-priority revenue): customer ⋈ orders ⋈
    lineitem with segment/date filters, per-order revenue, top 10.

    Scale shape: every filter applies at the pruned read; lineitem
    revenue is PRE-AGGREGATED per order inside map_batches before the
    shuffle join (the combiner move — the join ships one row per order,
    not per lineitem); the orders⋈customer step is a semi join (customer
    is only a filter); final top-10 via per-block partial top-k."""
    from ..shuffle import bindings_join, bucket_tag

    CUT = np.datetime64("1998-03-15")

    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda df: df.loc[df["c_mktsegment"] == "BUILDING",
                          ["c_custkey"]].rename(
            columns={"c_custkey": "o_custkey"}
        ),
        batch_format="pandas",
    )
    orders = _t(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda df: df.loc[df["o_orderdate"].to_numpy() < CUT],
        batch_format="pandas",
    )
    orders_b = bindings_join(orders, cust, on=["o_custkey"], how="semi")

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[df["l_shipdate"].to_numpy() > CUT]
        rev = df["l_extendedprice"].to_numpy() * (
            1.0 - df["l_discount"].to_numpy()
        )
        g = pd.DataFrame(
            {"o_orderkey": df["l_orderkey"].to_numpy(), "rev": rev}
        ).groupby("o_orderkey", as_index=False)["rev"].sum()
        return g

    line = _t(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(line_partial, batch_format="pandas")

    # the semi join widened o_orderkey to object — restore before the
    # next bucket shuffle or its buckets miss (shuffle.py dtype caveat)
    joined = bindings_join(line, orders_b.map_batches(
        lambda df: df[["o_orderkey", "o_orderdate"]].assign(
            o_orderkey=df["o_orderkey"].astype("int64")
        ),
        batch_format="pandas",
    ), on=["o_orderkey"])

    def regroup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["o_orderkey"] = df["o_orderkey"].astype("int64")
        df["rev"] = df["rev"].astype(np.float64)
        out = df.groupby(
            ["o_orderkey", "o_orderdate"], as_index=False
        )["rev"].sum()
        return out.assign(_bucket=bucket_tag(out, "o_orderkey", 32))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(
            ["o_orderkey", "o_orderdate"], as_index=False
        )["rev"].sum()
        out["revenue"] = np.round(out["rev"].to_numpy(), 2)
        out["o_orderdate"] = pd.to_datetime(
            out["o_orderdate"]
        ).dt.strftime("%Y-%m-%d")
        # per-bucket partial top-10 — the driver sees ≤ 10 rows/bucket
        return out.sort_values(
            ["revenue", "o_orderkey"], ascending=[False, True]
        ).head(10)[["o_orderkey", "o_orderdate", "revenue"]]

    parts = (
        joined.map_batches(regroup, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    return (
        parts.sort_values(["revenue", "o_orderkey"],
                          ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey AS o_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5 shape (local-supplier revenue per nation): 6-table join
    with the customer-nation = supplier-nation condition.

    Scale shape: region/nation (constant-sized) and supplier (the
    smallest TPC-H table) broadcast once via closure capture; the two
    BIG joins (orders⋈customer, lineitem⋈orders) run as bindings_join
    bucket shuffles with per-batch pre-projection; the final per-nation
    aggregate is k-sized."""
    from ..shuffle import bindings_join

    LO = np.datetime64("1996-01-01")
    HI = np.datetime64("1997-01-01")

    nat = _t(sf_dir, "nation",
             ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _t(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rk = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    region_nations = nat[nat["n_regionkey"].isin(rk)]
    nation_name = dict(zip(region_nations["n_nationkey"],
                           region_nations["n_name"]))
    sup = _t(sf_dir, "supplier",
             ["s_suppkey", "s_nationkey"]).to_pandas()
    sup_nation = dict(zip(sup["s_suppkey"], sup["s_nationkey"]))

    cust = _t(sf_dir, "customer",
              ["c_custkey", "c_nationkey"]).map_batches(
        lambda df: df.loc[
            df["c_nationkey"].isin(nation_name),
            ["c_custkey", "c_nationkey"],
        ].rename(columns={"c_custkey": "o_custkey"}),
        batch_format="pandas",
    )
    orders = _t(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda df: df.loc[
            (df["o_orderdate"].to_numpy() >= LO)
            & (df["o_orderdate"].to_numpy() < HI),
            ["o_orderkey", "o_custkey"],
        ],
        batch_format="pandas",
    )
    ord_cust = bindings_join(orders, cust, on=["o_custkey"]).map_batches(
        lambda df: pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].astype("int64"),
                "c_nationkey": df["c_nationkey"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )

    def line_rows(df: pd.DataFrame) -> pd.DataFrame:
        sn = df["l_suppkey"].map(sup_nation)
        rev = df["l_extendedprice"].to_numpy() * (
            1.0 - df["l_discount"].to_numpy()
        )
        return pd.DataFrame(
            {
                "o_orderkey": df["l_orderkey"].to_numpy(),
                "s_nationkey": sn.to_numpy(),
                "rev": rev,
            }
        )

    line = _t(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_rows, batch_format="pandas")

    joined = bindings_join(line, ord_cust, on=["o_orderkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[
            df["s_nationkey"].astype("int64").to_numpy()
            == df["c_nationkey"].astype("int64").to_numpy()
        ]
        g = pd.DataFrame(
            {
                "n_name": df["c_nationkey"].astype("int64").map(
                    nation_name
                ),
                "rev": df["rev"].astype(np.float64).to_numpy(),
            }
        ).groupby("n_name", as_index=False)["rev"].sum()
        return g

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("n_name", as_index=False)["rev"].sum()
    out["revenue"] = np.round(out["rev"], 2)
    return (
        out.sort_values("revenue", ascending=False)[["n_name", "revenue"]]
        .reset_index(drop=True)
    )


SQL_TPCH_Q5 = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC
"""


def q_docs_source_topk(sf_dir: str):
    """Top-3 longest documents per source (score = n_chars, ties by
    doc_id): map-side k-per-group combiner, one group-bucket reduce
    (stages/stats.group_topk)."""
    from ..stages.stats import group_topk

    return group_topk(
        _t(sf_dir, "documents", ["doc_id", "source", "n_chars"]),
        key="source", score_col="n_chars", k=3, id_col="doc_id",
    )


SQL_DOCS_SOURCE_TOPK = """
SELECT doc_id, source, n_chars FROM (
    SELECT doc_id, source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM documents
) WHERE rn <= 3
"""


def q_docs_zscore(sf_dir: str):
    """Z-score standardization of n_chars (population σ, exact Σx/Σx²
    moment formula replayed by the oracle; stages/stats)."""
    from ..stages.stats import zscore_standardize

    return zscore_standardize(
        _t(sf_dir, "documents", ["doc_id", "n_chars"]), "n_chars"
    )


SQL_DOCS_ZSCORE = """
WITH m AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           SUM(CAST(n_chars AS DOUBLE)) AS s,
           SUM(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS ss
    FROM documents
)
SELECT d.doc_id, d.n_chars,
       FLOOR((CAST(d.n_chars AS DOUBLE) - m.s / m.n)
             / SQRT(m.ss / m.n - (m.s / m.n) * (m.s / m.n)) * 1e6)
           / 1e6 AS n_chars_z
FROM documents d, m
"""


def q_parts_fuzzy_match(sf_dir: str):
    """Fuzzy entity-name join (trigram Jaccard ≥ 0.375, exact via
    prefix filtering — stages/resolve.fuzzy_name_join): distinct part
    names vs deterministically perturbed copies (every 'e' dropped),
    the dirty-duplicate entity-resolution shape."""
    from ..stages.resolve import fuzzy_name_join

    part = _t(sf_dir, "part", ["p_name"])

    def lnames(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["p_name"]].drop_duplicates()
        return pd.DataFrame({"lid": d["p_name"], "l_name": d["p_name"]})

    def rnames(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].str.replace("e", "", regex=False)
        d = nm.drop_duplicates()
        return pd.DataFrame({"rid": d, "r_name": d})

    def distinct(ds, idc):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            from ..shuffle import bucket_tag

            return df.assign(_bucket=bucket_tag(df, idc, 16))

        return (
            ds.map_batches(tag, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(
                lambda g: g.drop_duplicates(subset=[idc]).drop(
                    columns=["_bucket"]
                ),
                batch_format="pandas",
            )
        )

    left = distinct(
        part.map_batches(lnames, batch_format="pandas"), "lid"
    )
    right = distinct(
        part.map_batches(rnames, batch_format="pandas"), "rid"
    )
    return fuzzy_name_join(left, right, threshold=0.375)


SQL_PARTS_FUZZY_MATCH = """
WITH ln AS (SELECT DISTINCT p_name nm FROM part),
rn AS (SELECT DISTINCT replace(p_name, 'e', '') nm FROM part),
lg AS (
    SELECT DISTINCT nm, substr(nm, CAST(i AS INT), 3) g
    FROM ln, unnest(generate_series(1, GREATEST(length(nm) - 2, 1))) t(i)
),
rg AS (
    SELECT DISTINCT nm, substr(nm, CAST(i AS INT), 3) g
    FROM rn, unnest(generate_series(1, GREATEST(length(nm) - 2, 1))) t(i)
),
ls AS (SELECT nm, COUNT(*) n FROM lg GROUP BY nm),
rs AS (SELECT nm, COUNT(*) n FROM rg GROUP BY nm),
inter AS (
    SELECT a.nm lnm, b.nm rnm, COUNT(*) c
    FROM lg a JOIN rg b ON a.g = b.g GROUP BY a.nm, b.nm
)
SELECT i.lnm AS lid, i.rnm AS rid,
       FLOOR(CAST(i.c AS DOUBLE) / (x.n + y.n - i.c) * 1e6) / 1e6 AS sim
FROM inter i JOIN ls x ON i.lnm = x.nm JOIN rs y ON i.rnm = y.nm
WHERE FLOOR(CAST(i.c AS DOUBLE) / (x.n + y.n - i.c) * 1e6) / 1e6 >= 0.375
"""


def q_events_intervals(sf_dir: str):
    """Valid-time interval coalescing: each event opens a 30-minute
    interval; overlapping/touching intervals merge per user
    (stages/asof.interval_coalesce — vectorized gaps-and-islands)."""
    from ..stages.asof import interval_coalesce
    from ..stages.windows import US

    ev = _t(sf_dir, "events", ["user_id", "ts"])

    def to_iv(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "start_us": us,
                "end_us": us + 1800 * US,
            }
        )

    return interval_coalesce(
        ev.map_batches(to_iv, batch_format="pandas"), key="user_id"
    )


SQL_EVENTS_INTERVALS = """
WITH iv AS (
    SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS s,
           CAST(epoch_us(ts) AS BIGINT) + 1800000000 AS e
    FROM events
),
ord AS (
    SELECT user_id, s, e,
           MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
    FROM iv
),
isl AS (
    SELECT user_id, s, e,
           SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS iid
    FROM ord
)
SELECT user_id, MIN(s) AS start_us, MAX(e) AS end_us
FROM isl GROUP BY user_id, iid
"""


def q_docs_chunks(sf_dir: str):
    """Sliding-window token chunking (size 32, stride 16) — the RAG
    preprocessing step (stages/text_analysis.chunk_documents)."""
    from ..stages.text_analysis import chunk_documents

    return chunk_documents(
        _t(sf_dir, "documents", ["doc_id", "text"]), size=32, stride=16
    )


SQL_DOCS_CHUNKS = r"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\S+') AS tl
    FROM documents
),
idx AS (
    SELECT doc_id, tl, CAST(len(tl) AS BIGINT) AS n
    FROM toks WHERE len(tl) > 0
)
SELECT doc_id, CAST(s.j AS BIGINT) AS chunk_id,
       array_to_string(tl[CAST(s.j * 16 + 1 AS INT)
                          : CAST(s.j * 16 + 32 AS INT)], ' ')
           AS chunk_text,
       LEAST(32, n - s.j * 16) AS n_tokens
FROM idx, unnest(generate_series(0,
        CAST(CEIL(n * 1.0 / 16) AS BIGINT) - 1)) s(j)
"""


def q_docs_source_mode(sf_dir: str):
    """Most common language per source (categorical group summary,
    ties by value asc — stages/profile.group_mode)."""
    from ..stages.profile import group_mode

    return group_mode(
        _t(sf_dir, "documents", ["source", "lang"]), "source", "lang"
    )


SQL_DOCS_SOURCE_MODE = """
SELECT source, lang AS mode, CAST(cnt AS BIGINT) AS n FROM (
    SELECT source, lang, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY COUNT(*) DESC, lang) AS rn
    FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
    GROUP BY source, lang
) WHERE rn = 1
"""


def q_events_distinct_users(sf_dir: str):
    """Exact per-event-type distinct-user counts
    (stages/profile.group_distinct_count) — one (group,value)-bucket
    shuffle with drop_duplicates combiners."""
    from ..stages.profile import group_distinct_count

    return group_distinct_count(
        _t(sf_dir, "events", ["event_type", "user_id"]),
        "event_type", "user_id",
    )


SQL_EVENTS_DISTINCT_USERS = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
"""


def q_docs_pmi(sf_dir: str):
    """Windowed co-occurrence PMI over the documents corpus (window 3,
    min_count 5) — collocation mining; counts flow through term/pair
    bucket shuffles, never the driver (stages/cooccur)."""
    from ..stages.cooccur import cooccurrence_pmi

    return cooccurrence_pmi(
        _t(sf_dir, "documents", ["doc_id", "text"]),
        window=3, min_count=5,
    )


SQL_DOCS_PMI = r"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\S+') AS tl
    FROM documents
),
w AS (
    SELECT doc_id, generate_subscripts(tl, 1) AS i, unnest(tl) AS w
    FROM toks
),
uni AS (SELECT w, COUNT(*) AS c1 FROM w GROUP BY w),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM w),
pr AS (
    SELECT LEAST(a.w, b.w) AS x, GREATEST(a.w, b.w) AS y
    FROM w a JOIN w b
      ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND 3
),
pc AS (SELECT x, y, COUNT(*) AS c_xy FROM pr GROUP BY x, y),
p AS (SELECT CAST(SUM(c_xy) AS DOUBLE) AS p FROM pc)
SELECT pc.x, pc.y, CAST(pc.c_xy AS BIGINT) AS c_xy,
       FLOOR((LN(pc.c_xy / p.p) - LN(ux.c1 / n.n) - LN(uy.c1 / n.n))
             * 1e4) / 1e4 AS pmi
FROM pc
CROSS JOIN p
CROSS JOIN n
JOIN uni ux ON pc.x = ux.w
JOIN uni uy ON pc.y = uy.w
WHERE pc.c_xy >= 5
"""


def q_docs_textrank(sf_dir: str):
    """TextRank corpus keywords (stages/cooccur.textrank_keywords):
    weighted PageRank over the ±3-window word co-occurrence graph
    (pairs ≥ 5), top-20 by (rank desc, word asc). Oracle: the PMI
    pair CTE feeding the unrolled weighted-PageRank rounds."""
    from ..stages.cooccur import textrank_keywords

    return textrank_keywords(
        _t(sf_dir, "documents", ["doc_id", "text"]),
        window=3, min_count=5, num_iters=2, k=20)


def _textrank_sql(window: int = 3, min_count: int = 5,
                  num_iters: int = 2, k: int = 20) -> str:
    ctes = [
        r"""WITH toks AS (
    SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\S+') AS tl
    FROM documents
),
w AS (
    SELECT doc_id, generate_subscripts(tl, 1) AS i, unnest(tl) AS w
    FROM toks
),
pr AS (
    SELECT LEAST(a.w, b.w) AS x, GREATEST(a.w, b.w) AS y
    FROM w a JOIN w b
      ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND """
        + str(window) + """
),
pc AS MATERIALIZED (
    SELECT x, y, CAST(COUNT(*) AS DOUBLE) AS w FROM pr
    GROUP BY x, y HAVING COUNT(*) >= """ + str(min_count) + """
),
pe AS MATERIALIZED (
    SELECT x AS s, y AS o, w FROM pc
    UNION ALL SELECT y, x, w FROM pc
),
nodes AS MATERIALIZED (SELECT DISTINCT s AS node FROM pe),
deg AS MATERIALIZED (SELECT s AS node, SUM(w) AS d FROM pe GROUP BY s),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
t0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),""",
    ]
    last = _pr_rounds_w(ctes, "t", "pe", "nodes", "deg", "nn", "t0",
                        num_iters)
    ctes[-1] = ctes[-1].rstrip(",")
    return (
        "\n".join(ctes)
        + f"\nSELECT node AS word, ROUND(r, 8) AS rank FROM {last} "
        f"ORDER BY rank DESC, word LIMIT {k}"
    )


SQL_DOCS_TEXTRANK = _textrank_sql(3, 5, 2, 20)


def q_lineitem_corr(sf_dir: str):
    """Pearson correlation of quantity vs extended price over the full
    lineitem table — one moment pass, six driver scalars
    (stages/stats.pearson_corr)."""
    from ..stages.stats import pearson_corr

    r = pearson_corr(
        _t(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"]),
        "l_quantity", "l_extendedprice",
    )
    # FLOOR at 1e-4, not 1e-6: the six moments are order-sensitive float
    # sums (unlike the quantized projection), so parity needs headroom
    # above cross-engine ulp noise (same rationale as lm.py's 1e-4)
    return pd.DataFrame({"corr": [np.floor(r * 1e4) / 1e4]})


SQL_LINEITEM_CORR = """
WITH m AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           SUM(CAST(l_quantity AS DOUBLE)) AS sx,
           SUM(CAST(l_extendedprice AS DOUBLE)) AS sy,
           SUM(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE))
               AS sxx,
           SUM(CAST(l_extendedprice AS DOUBLE)
               * CAST(l_extendedprice AS DOUBLE)) AS syy,
           SUM(CAST(l_quantity AS DOUBLE)
               * CAST(l_extendedprice AS DOUBLE)) AS sxy
    FROM lineitem
)
SELECT FLOOR(
    (sxy / n - (sx / n) * (sy / n))
    / SQRT((sxx / n - (sx / n) * (sx / n))
           * (syy / n - (sy / n) * (sy / n))) * 1e4) / 1e4 AS corr
FROM m
"""


def q_docs_quality_ntile(sf_dir: str):
    """Exact global rank + NTILE(4) quartile of documents by n_chars
    (quality-curriculum bucketing) — order-preserving score-bucket
    histogram, no global sort (stages/sampling.global_rank)."""
    from ..stages.sampling import global_rank

    return global_rank(
        _t(sf_dir, "documents", ["doc_id", "n_chars"]),
        score_col="n_chars", descending=True, ntiles=4,
    )


SQL_DOCS_QUALITY_NTILE = """
SELECT doc_id, n_chars,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
       CAST(NTILE(4) OVER w AS BIGINT) AS ntile
FROM documents
WINDOW w AS (ORDER BY n_chars DESC, doc_id)
"""


def q_docs_logreg_score(sf_dir: str):
    """Trainable quality classifier: full-batch logistic regression on
    feature-hashed text, label = (lang == 'en'), then map-side sigmoid
    scoring (stages/classify.logreg_train/score). Rows-only — the GD
    iterations aren't SQL-expressible; exactness is pinned by the
    sequential numpy replay in tests/test_classify.py."""
    from ..stages.classify import logreg_score, logreg_train

    docs = _t(sf_dir, "documents", ["doc_id", "lang", "text"])
    labeled = docs.map_batches(
        lambda df: df.assign(
            y=(df["lang"] == "en").astype("int64")
        )[["doc_id", "text", "y"]],
        batch_format="pandas",
    ).materialize()
    w = logreg_train(labeled, "y", dim=32, iters=10, lr=0.5)
    out = logreg_score(labeled, w)
    return out.map_batches(
        lambda df: df.assign(prob=np.floor(df["prob"] * 1e6) / 1e6),
        batch_format="pandas",
    )


def q_kg_transe(sf_dir: str):
    """One distributed TransE training epoch over supplier→nation
    triples (stages/transe.transe_epoch): md5-deterministic init,
    corrupt-tail negatives from negative_sample, integer L1
    subgradients accumulated through two entity-keyed shuffles.
    Rows-only — the epoch isn't SQL-expressible; exactness is pinned
    by the sequential hashlib/numpy replay in tests/test_transe.py."""
    from ..stages.transe import (
        distinct_entities, init_embeddings, transe_epoch)

    sup = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def to_triples(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": "sup:" + df["s_suppkey"].astype(str),
                "pred": "ex:basedIn",
                "obj": "nat:" + df["s_nationkey"].astype(str),
            }
        )

    trips = sup.map_batches(to_triples, batch_format="pandas") \
        .materialize()
    e0 = init_embeddings(
        distinct_entities(trips), dim=8, salt="transe-e")
    r0 = init_embeddings(
        rd.from_pandas(pd.DataFrame({"pred": ["ex:basedIn"]})),
        dim=8, name_col="pred", salt="transe-r", normalize=False,
    ).to_pandas()
    e1, _ = transe_epoch(trips, e0, r0, lr=0.01, margin=1.0)

    # long scalar form (ent, j, x) — list columns are unsortable in
    # the contract harness's canon(); floor to 1e-6 for float parity
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        V = np.floor(np.stack(
            [np.asarray(v, np.float64) for v in df["embedding"]]
        ) * 1e6)
        n, d = V.shape
        return pd.DataFrame({
            "ent": np.repeat(df["ent"].to_numpy(dtype=object), d),
            "j": np.tile(np.arange(d, dtype=np.int64), n),
            "x": V.reshape(-1),
        })

    return e1.map_batches(explode, batch_format="pandas")


def q_graph_walks(sf_dir: str):
    """Deterministic DeepWalk-style random walks over the part graph
    (stages/walks.random_walks): md5-derived neighbor choice over
    sorted neighbor ranks, one co-bucketed shuffle per step — vs a
    recursive-CTE oracle replaying the identical md5 choice rule.
    Starts are p_partkey % 97 == 0 (sf-scaled start count)."""
    from ..stages.walks import random_walks

    part = _t(sf_dir, "part", ["p_partkey"])
    starts = part.map_batches(
        lambda df: pd.DataFrame(
            {"node": df.loc[(df["p_partkey"] % 97 == 0)
                            & (df["p_partkey"] >= 1),
                            "p_partkey"].to_numpy()}),
        batch_format="pandas",
    )
    return random_walks(
        _part_graph_edges(sf_dir), walk_len=6, walks_per_node=2,
        starts=starts,
    )


SQL_GRAPH_WALKS = r"""
WITH RECURSIVE e AS (
    SELECT DISTINCT s, o FROM (
        SELECT p_partkey AS s, p_partkey // 2 AS o
        FROM part WHERE p_partkey >= 1
        UNION ALL
        SELECT p_partkey, p_partkey - 1
        FROM part WHERE p_partkey >= 1
    )
),
adj AS (
    SELECT s, o,
           ROW_NUMBER() OVER (PARTITION BY s ORDER BY o) - 1 AS idx,
           COUNT(*) OVER (PARTITION BY s) AS deg
    FROM e
),
wid AS (
    SELECT CAST(p_partkey AS VARCHAR) || '#'
               || CAST(w AS VARCHAR) AS walk_id,
           p_partkey AS n
    FROM part, UNNEST(generate_series(0, 1)) t(w)
    WHERE p_partkey % 97 = 0 AND p_partkey >= 1
),
walks(walk_id, step, node) AS (
    SELECT walk_id, CAST(0 AS BIGINT) AS step, n AS node FROM wid
    UNION ALL
    SELECT w.walk_id, w.step + 1, a.o
    FROM walks w JOIN adj a ON a.s = w.node
     AND a.idx = CAST(CONCAT('0x', substr(md5('graft-walk|'
            || w.walk_id || '|' || CAST(w.step AS VARCHAR)), 1, 10))
            AS BIGINT) % a.deg
    WHERE w.step < 6
)
SELECT walk_id, step, node FROM walks
"""


def q_graph_walk_pairs(sf_dir: str):
    """DeepWalk skip-gram training pairs over the part-graph walks
    (stages/walks.skipgram_pairs): windowed (center, context) counts,
    walk-bucket self-merge + one pair-keyed reduce — vs the oracle's
    walk self-join + GROUP BY on the identical recursive walks."""
    from ..stages.walks import random_walks, skipgram_pairs

    part = _t(sf_dir, "part", ["p_partkey"])
    starts = part.map_batches(
        lambda df: pd.DataFrame(
            {"node": df.loc[(df["p_partkey"] % 97 == 0)
                            & (df["p_partkey"] >= 1),
                            "p_partkey"].to_numpy()}),
        batch_format="pandas",
    )
    walks = random_walks(
        _part_graph_edges(sf_dir), walk_len=6, walks_per_node=2,
        starts=starts,
    )
    return skipgram_pairs(walks, window=2)


SQL_GRAPH_WALK_PAIRS = (
    SQL_GRAPH_WALKS.rsplit("SELECT walk_id, step, node FROM walks", 1)[0]
    + """
SELECT a.node AS center, b.node AS context,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM walks a
JOIN walks b ON a.walk_id = b.walk_id AND a.step <> b.step
            AND ABS(a.step - b.step) <= 2
GROUP BY a.node, b.node
"""
)


def q_graph_wl(sf_dir: str):
    """Weisfeiler–Leman signatures (2 rounds) over the labeled part
    graph — k →half k//2, k →prev k−1 (stages/wl.wl_signatures:
    pagerank-shaped scatter/gather, md5 of own label + sorted contrib
    multiset) — vs a 2×-unrolled string_agg/md5 SQL replay."""
    from ..stages.wl import wl_signatures

    part = _t(sf_dir, "part", ["p_partkey"])

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        k = df.loc[df["p_partkey"] >= 1, "p_partkey"]
        return pd.concat([
            pd.DataFrame({"s": k, "p": "half", "o": k // 2}),
            pd.DataFrame({"s": k, "p": "prev", "o": k - 1}),
        ], ignore_index=True)

    return wl_signatures(
        part.map_batches(edges, batch_format="pandas"), rounds=2)


SQL_GRAPH_WL = r"""
WITH e AS (
    SELECT CAST(s AS VARCHAR) AS s, p, CAST(o AS VARCHAR) AS o FROM (
        SELECT p_partkey AS s, 'half' AS p, p_partkey // 2 AS o
        FROM part WHERE p_partkey >= 1
        UNION ALL
        SELECT p_partkey, 'prev', p_partkey - 1
        FROM part WHERE p_partkey >= 1
    )
),
n AS (
    SELECT DISTINCT node FROM (
        SELECT s AS node FROM e UNION SELECT o FROM e
    )
),
l0 AS (SELECT node, '' AS lab FROM n),
c1 AS (
    SELECT e.s AS node, e.p || '|' || l.lab AS contrib
    FROM e JOIN l0 l ON l.node = e.o
),
l1 AS (
    SELECT nn.node,
           md5(l.lab || '|' || COALESCE(
               string_agg(c.contrib, '|' ORDER BY c.contrib), ''))
               AS lab
    FROM n nn
    JOIN l0 l ON l.node = nn.node
    LEFT JOIN c1 c ON c.node = nn.node
    GROUP BY nn.node, l.lab
),
c2 AS (
    SELECT e.s AS node, e.p || '|' || l.lab AS contrib
    FROM e JOIN l1 l ON l.node = e.o
),
l2 AS (
    SELECT nn.node,
           md5(l.lab || '|' || COALESCE(
               string_agg(c.contrib, '|' ORDER BY c.contrib), ''))
               AS lab
    FROM n nn
    JOIN l1 l ON l.node = nn.node
    LEFT JOIN c2 c ON c.node = nn.node
    GROUP BY nn.node, l.lab
)
SELECT node, lab FROM l2
"""


def q_sparql_update(sf_dir: str):
    """SPARQL 1.1 Update (DELETE/INSERT WHERE) over the supplier KG:
    relocate every supplier based in nation 3 to a new predicate
    (query/sparql.run_update — WHERE evaluates distributed, templates
    instantiate per batch, ONE composite-keyed shuffle applies
    (store − deletes) ∪ inserts with set semantics) — vs an
    EXCEPT/UNION set-ops oracle."""
    from ..query.sparql import run_update

    sup = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    trips = sup.map_batches(
        lambda df: pd.DataFrame({
            "subj": "sup:" + df["s_suppkey"].astype(str),
            "pred": "ex:basedIn",
            "obj": "nat:" + df["s_nationkey"].astype(str),
        }),
        batch_format="pandas",
    )
    q = ('DELETE { ?s ex:basedIn ?o } '
         'INSERT { ?s ex:locatedIn ?o } '
         'WHERE { ?s ex:basedIn ?o . FILTER(?o = "nat:3") }')
    return run_update(trips, q)


SQL_SPARQL_UPDATE = """
WITH trip AS (
    SELECT 'sup:' || CAST(s_suppkey AS VARCHAR) AS subj,
           'ex:basedIn' AS pred,
           'nat:' || CAST(s_nationkey AS VARCHAR) AS obj
    FROM supplier
),
matched AS (SELECT subj, obj FROM trip WHERE obj = 'nat:3')
SELECT subj, pred, obj FROM (
    SELECT subj, pred, obj FROM trip
    EXCEPT
    SELECT subj, 'ex:basedIn', obj FROM matched
    UNION
    SELECT subj, 'ex:locatedIn', obj FROM matched
)
"""


def q_graph_scc(sf_dir: str):
    """Strongly connected components of the modular doubling graph —
    nodes 0..126, edges r → 2r mod 127 (cycles of length 7: ord(2 mod
    127) = 7) plus 13 feeder tails 127+i → i (singleton SCCs) — via
    the coloring/FW-BW algorithm (stages/scc). The residue edge set is
    identical at every sf ≥ 0.001, so the query is sf-stable; oracle =
    brute-force mutual reachability (127-node closure is tiny)."""
    from ..stages.scc import strongly_connected_components

    part = _t(sf_dir, "part", ["p_partkey"])

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        r = (df["p_partkey"] % 127).astype("int64")
        tails = 127 + (df["p_partkey"] % 13).astype("int64")
        return pd.concat([
            pd.DataFrame({"s": r, "o": (2 * r) % 127}),
            pd.DataFrame({"s": tails, "o": r}),
        ], ignore_index=True).drop_duplicates()

    out = strongly_connected_components(
        part.map_batches(edges, batch_format="pandas"))
    return out.map_batches(
        lambda df: pd.DataFrame({
            "node": df["node"].astype("int64"),
            "scc_id": df["scc_id"].astype("int64")}),
        batch_format="pandas",
    )


SQL_GRAPH_SCC = r"""
WITH RECURSIVE e AS (
    SELECT DISTINCT s, o FROM (
        SELECT p_partkey % 127 AS s, (2 * (p_partkey % 127)) % 127 AS o
        FROM part
        UNION ALL
        SELECT 127 + p_partkey % 13, p_partkey % 127 FROM part
    )
),
n AS (
    SELECT DISTINCT node FROM (
        SELECT s AS node FROM e UNION SELECT o FROM e
    )
),
reach(a, b) AS (
    SELECT DISTINCT s, o FROM e
    UNION
    SELECT r.a, e.o FROM reach r JOIN e ON e.s = r.b
)
SELECT nn.node,
       CAST(COALESCE(MIN(r1.b) FILTER (WHERE r2.a IS NOT NULL),
                     nn.node) AS BIGINT) AS scc_id
FROM n nn
LEFT JOIN reach r1 ON r1.a = nn.node
LEFT JOIN reach r2 ON r2.a = r1.b AND r2.b = nn.node
GROUP BY nn.node
"""


def q_kg_transe_eval(sf_dir: str):
    """Filtered link-prediction ranks (TransE eval protocol) over
    supplier→nation triples on the md5-deterministic INIT embeddings
    (unnormalized, so the oracle replays every float exactly): for
    each test triple, rank of the true tail among all entities by
    ‖h + r − e‖₁, excluding known tails (stages/transe.
    transe_rank_eval — entity table streams, test-side broadcast).
    Distance gaps (≥1e-3) dwarf cross-engine float-sum noise
    (≤1e-15), so strict-< rank counts match DuckDB exactly."""
    from ..stages.transe import (
        distinct_entities, init_embeddings, transe_rank_eval)

    sup = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def to_triples(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": "sup:" + df["s_suppkey"].astype(str),
                "pred": "ex:basedIn",
                "obj": "nat:" + df["s_nationkey"].astype(str),
            }
        )

    trips = sup.map_batches(to_triples, batch_format="pandas") \
        .materialize()
    test = sup.map_batches(
        lambda df: to_triples(df[df["s_suppkey"] % 7 == 0]),
        batch_format="pandas",
    )
    e0 = init_embeddings(
        distinct_entities(trips), dim=8, salt="te", normalize=False)
    r0 = init_embeddings(
        rd.from_pandas(pd.DataFrame({"pred": ["ex:basedIn"]})),
        dim=8, name_col="pred", salt="tr", normalize=False,
    ).to_pandas()
    return transe_rank_eval(test, e0, r0, known_triples=trips)


SQL_KG_TRANSE_EVAL = r"""
WITH trip AS (
    SELECT 'sup:' || CAST(s_suppkey AS VARCHAR) AS subj,
           'ex:basedIn' AS pred,
           'nat:' || CAST(s_nationkey AS VARCHAR) AS obj
    FROM supplier
),
test AS (
    SELECT 'sup:' || CAST(s_suppkey AS VARCHAR) AS subj,
           'ex:basedIn' AS pred,
           'nat:' || CAST(s_nationkey AS VARCHAR) AS obj
    FROM supplier WHERE s_suppkey % 7 = 0
),
ents AS (
    SELECT DISTINCT e FROM (
        SELECT subj AS e FROM trip UNION SELECT obj FROM trip
    )
),
dims AS (SELECT UNNEST(generate_series(0, 7)) AS j),
evec AS (
    SELECT e, j,
           ((CAST(CONCAT('0x', substr(md5('te:' || e || ':'
                 || CAST(j AS VARCHAR)), 1, 10)) AS BIGINT) + 0.5)
            / 1099511627776.0 * 2.0 - 1.0) * (6.0 / sqrt(8.0)) AS x
    FROM ents, dims
),
rvec AS (
    SELECT j,
           ((CAST(CONCAT('0x', substr(md5('tr:ex:basedIn:'
                 || CAST(j AS VARCHAR)), 1, 10)) AS BIGINT) + 0.5)
            / 1099511627776.0 * 2.0 - 1.0) * (6.0 / sqrt(8.0)) AS x
    FROM dims
),
dist AS (
    SELECT t.subj, t.pred, t.obj, cv.e AS cand,
           SUM(ABS(hv.x + rv.x - cv.x)) AS d
    FROM test t
    JOIN evec hv ON hv.e = t.subj
    JOIN rvec rv ON rv.j = hv.j
    JOIN evec cv ON cv.j = hv.j
    GROUP BY t.subj, t.pred, t.obj, cv.e
),
dt AS (SELECT subj, pred, obj, d AS dtrue FROM dist WHERE cand = obj)
SELECT d.subj, d.pred, d.obj,
       CAST(1 + COUNT(*) FILTER (
           WHERE d.d < x.dtrue AND d.cand <> d.obj
                 AND k.subj IS NULL) AS BIGINT) AS rank
FROM dist d
JOIN dt x ON x.subj = d.subj AND x.pred = d.pred AND x.obj = d.obj
LEFT JOIN trip k ON k.subj = d.subj AND k.pred = d.pred
                AND k.obj = d.cand
GROUP BY d.subj, d.pred, d.obj
"""


def q_kg_negatives(sf_dir: str):
    """KG-embedding training negatives over supplier→nation triples:
    corrupt-tail sampling from the md5-ranked global entity set
    (stages/sampling.negative_sample) — deterministic, growth-stable,
    rank table joined through a shuffle, never broadcast."""
    from ..stages.sampling import negative_sample

    sup = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def to_triples(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": "sup:" + df["s_suppkey"].astype(str),
                "pred": "ex:basedIn",
                "obj": "nat:" + df["s_nationkey"].astype(str),
            }
        )

    return negative_sample(
        sup.map_batches(to_triples, batch_format="pandas"), k=2
    )


SQL_KG_NEGATIVES = r"""
WITH trip AS (
    SELECT 'sup:' || CAST(s_suppkey AS VARCHAR) AS subj,
           'ex:basedIn' AS pred,
           'nat:' || CAST(s_nationkey AS VARCHAR) AS obj
    FROM supplier
),
ents AS (
    SELECT DISTINCT e FROM (
        SELECT subj AS e FROM trip UNION SELECT obj FROM trip
    )
),
ranked AS (
    SELECT e,
           ROW_NUMBER() OVER (ORDER BY md5(e || ':graft-negrank'), e)
               - 1 AS rank
    FROM ents
),
n AS (SELECT COUNT(*) AS c FROM ents),
pairs AS (
    SELECT t.subj, t.pred, j,
           CAST(CONCAT('0x', substr(md5(t.subj || '|' || t.pred || '|'
                || t.obj || '|' || CAST(j AS VARCHAR)), 1, 10))
                AS BIGINT) % n.c AS idx
    FROM trip t, unnest(generate_series(0, 1)) s(j), n
)
SELECT p.subj, p.pred, r.e AS neg_obj, CAST(p.j AS BIGINT) AS neg_id
FROM pairs p JOIN ranked r ON p.idx = r.rank
"""


def q_kg_char_sets(sf_dir: str):
    """Characteristic sets of an events-derived KG (per-subject sorted
    predicate-set signatures + counts — Neumann/Moerkotte schema
    statistic; stages/profile.characteristic_sets). Predicates are
    conditional on the data so the signature space is non-trivial."""
    from ..stages.profile import characteristic_sets

    ev = _t(sf_dir, "events",
            ["event_id", "event_type", "value", "props"])

    def to_triples(df: pd.DataFrame) -> pd.DataFrame:
        subj = "ev:" + df["event_id"].astype(str)
        parts = [pd.DataFrame({"subj": subj, "pred": "p:type",
                               "obj": df["event_type"]})]
        hi = df["value"].to_numpy() > 50.0
        if hi.any():
            parts.append(pd.DataFrame(
                {"subj": subj[hi], "pred": "p:highvalue",
                 "obj": df.loc[hi, "value"].astype(str)}))
        pu = df["event_type"].isin(["purchase", "signup"])
        if pu.to_numpy().any():
            parts.append(pd.DataFrame(
                {"subj": subj[pu], "pred": "p:conversion",
                 "obj": df.loc[pu, "event_type"]}))
        lp = df["props"].fillna("").str.len() > 8
        if lp.to_numpy().any():
            parts.append(pd.DataFrame(
                {"subj": subj[lp], "pred": "p:props",
                 "obj": df.loc[lp, "props"]}))
        return pd.concat(parts, ignore_index=True)

    return characteristic_sets(
        ev.map_batches(to_triples, batch_format="pandas")
    )


def q_kg_sameas_canonical(sf_dir: str):
    """owl:sameAs entity canonicalization over a customer-derived KG:
    alias entities a:<k> (k%3==0) assert sameAs c:<k>, second-level
    aliases b:<k> (k%6==0) assert sameAs a:<k> (3-node transitive
    chains), plus data triples whose subjects AND objects both need
    rewriting (p:knows edges point at c:<k+1>). The oracle replays the
    whole op: recursive-CTE reachability closure → min-label canon →
    COALESCE rewrite → DISTINCT."""
    from ..stages.canonicalize import sameas_canonicalize

    cust = _t(sf_dir, "customer",
              ["c_custkey", "c_nationkey", "c_mktsegment"])

    def to_triples(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].astype("int64")
        c = "c:" + k.astype(str)
        parts = [pd.DataFrame(
            {"subj": c, "pred": "p:nation",
             "obj": "n:" + df["c_nationkey"].astype(str)})]
        m7 = (k % 7 == 0).to_numpy()
        if m7.any():
            parts.append(pd.DataFrame(
                {"subj": c[m7], "pred": "p:knows",
                 "obj": "c:" + (k[m7] + 1).astype(str)}))
        m3 = (k % 3 == 0).to_numpy()
        if m3.any():
            a = "a:" + k[m3].astype(str)
            parts.append(pd.DataFrame(
                {"subj": a, "pred": "p:segment",
                 "obj": df.loc[m3, "c_mktsegment"].to_numpy()}))
            parts.append(pd.DataFrame(
                {"subj": a, "pred": "owl:sameAs",
                 "obj": c[m3].to_numpy()}))
        m6 = (k % 6 == 0).to_numpy()
        if m6.any():
            parts.append(pd.DataFrame(
                {"subj": "b:" + k[m6].astype(str),
                 "pred": "owl:sameAs",
                 "obj": "a:" + k[m6].astype(str)}))
        return pd.concat(parts, ignore_index=True)

    triples = cust.map_batches(to_triples, batch_format="pandas")
    out = sameas_canonicalize(
        triples, sameas_pred="owl:sameAs"
    ).to_pandas()
    return out.sort_values(["subj", "pred", "obj"]).reset_index(
        drop=True
    )[["subj", "pred", "obj"]]


_SHACL_SHAPES = [
    {"shape_id": "sh_lines", "target_class": "s:Order",
     "pred": "p:line", "min_count": 2, "max_count": 6},
    {"shape_id": "sh_priority", "target_class": "s:Order",
     "pred": "p:priority", "min_count": 1, "max_count": 1},
    {"shape_id": "sh_bigspend", "target_class": "s:Order",
     "pred": "p:bigspend", "min_count": 1},
]


def q_kg_shacl_validate(sf_dir: str):
    """SHACL cardinality validation over an orders/lineitem-derived KG:
    sh_lines (2 <= lineitems <= 6 - TPC-H orders carry 1..7, so BOTH
    violation kinds fire), sh_priority (exactly one - always satisfied,
    the no-violation path), sh_bigspend (minCount 1 where the triple is
    only emitted for totalprice > 150k - the ZERO-count outer-join
    path). Oracle recomputes each shape's violations directly."""
    from ..stages.shacl import shacl_validate

    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_orderpriority", "o_totalprice"])
    line = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def order_triples(df: pd.DataFrame) -> pd.DataFrame:
        o = "o:" + df["o_orderkey"].astype(str)
        parts = [
            pd.DataFrame({"subj": o, "pred": "rdf:type",
                          "obj": "s:Order"}),
            pd.DataFrame({"subj": o, "pred": "p:priority",
                          "obj": df["o_orderpriority"]}),
        ]
        hi = (df["o_totalprice"].to_numpy() > 150000.0)
        if hi.any():
            parts.append(pd.DataFrame(
                {"subj": o[hi], "pred": "p:bigspend",
                 "obj": "x:flag"}))
        return pd.concat(parts, ignore_index=True)

    def line_triples(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": "o:" + df["l_orderkey"].astype(str),
                "pred": "p:line",
                "obj": "li:" + df["l_orderkey"].astype(str) + ":"
                       + df["l_linenumber"].astype(str),
            }
        )

    triples = orders.map_batches(
        order_triples, batch_format="pandas"
    ).union(line.map_batches(line_triples, batch_format="pandas"))
    out = shacl_validate(triples, _SHACL_SHAPES).to_pandas()
    return out.sort_values(
        ["subj", "shape_id"]
    ).reset_index(drop=True)[
        ["subj", "shape_id", "pred", "n_values", "violation"]
    ]


SQL_KG_SHACL_VALIDATE = """
WITH lc AS (
    SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_orderkey
),
v_lines AS (
    SELECT 'o:' || CAST(o.o_orderkey AS VARCHAR) AS subj,
           'sh_lines' AS shape_id, 'p:line' AS pred,
           COALESCE(lc.n, 0) AS n_values,
           CASE WHEN COALESCE(lc.n, 0) < 2 THEN 'minCount'
                ELSE 'maxCount' END AS violation
    FROM orders o LEFT JOIN lc ON lc.k = o.o_orderkey
    WHERE COALESCE(lc.n, 0) < 2 OR COALESCE(lc.n, 0) > 6
),
v_bigspend AS (
    SELECT 'o:' || CAST(o_orderkey AS VARCHAR) AS subj,
           'sh_bigspend' AS shape_id, 'p:bigspend' AS pred,
           CAST(0 AS BIGINT) AS n_values, 'minCount' AS violation
    FROM orders WHERE o_totalprice <= 150000.0
)
SELECT * FROM v_lines
UNION ALL
SELECT * FROM v_bigspend
ORDER BY subj, shape_id
"""


def _shacl_kg(sf_dir: str, updated: bool = False):
    """The orders/lineitem KG of q_kg_shacl_validate; ``updated=True``
    applies a deterministic snapshot edit (orders %13 lose all lines
    past the first → new minCount violations; orders %17 gain 3 extra
    lines → some cross maxCount 6)."""
    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_orderpriority", "o_totalprice"])
    line = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def order_triples(df: pd.DataFrame, _upd=updated) -> pd.DataFrame:
        o = "o:" + df["o_orderkey"].astype(str)
        parts = [
            pd.DataFrame({"subj": o, "pred": "rdf:type",
                          "obj": "s:Order"}),
            pd.DataFrame({"subj": o, "pred": "p:priority",
                          "obj": df["o_orderpriority"]}),
        ]
        hi = (df["o_totalprice"].to_numpy() > 150000.0)
        if hi.any():
            parts.append(pd.DataFrame(
                {"subj": o[hi], "pred": "p:bigspend",
                 "obj": "x:flag"}))
        if _upd:
            # extra lines come from the ORDERS side (each order appears
            # in exactly one batch) — emitting them per lineitem batch
            # would duplicate the triples for orders spanning blocks
            x = df.loc[df["o_orderkey"] % 17 == 0, "o_orderkey"]
            if len(x):
                xs = np.repeat(x.to_numpy(np.int64), 3)
                xi = np.tile(np.arange(1, 4), len(x))
                parts.append(pd.DataFrame(
                    {
                        "subj": "o:" + pd.Series(xs).astype(str),
                        "pred": "p:line",
                        "obj": "li:" + pd.Series(xs).astype(str)
                               + ":x" + pd.Series(xi).astype(str),
                    }
                ))
        return pd.concat(parts, ignore_index=True)

    def line_triples(df: pd.DataFrame, _upd=updated) -> pd.DataFrame:
        k = df["l_orderkey"].astype(np.int64)
        n = df["l_linenumber"].astype(np.int64)
        if _upd:
            keep = ~((k % 13 == 0) & (n > 1))
            k, n = k[keep], n[keep]
        return pd.DataFrame(
            {
                "subj": "o:" + k.astype(str),
                "pred": "p:line",
                "obj": "li:" + k.astype(str) + ":" + n.astype(str),
            }
        )

    return orders.map_batches(
        order_triples, batch_format="pandas"
    ).union(line.map_batches(line_triples, batch_format="pandas"))


def q_kg_shacl_incremental(sf_dir: str):
    """Incremental SHACL revalidation: the base KG's violations plus a
    snapshot delta (orders %13 lose lines, %17 gain them) revalidated
    via kg_delta → affected subjects → semi-scoped validate → anti
    merge — O(delta) work. The ORACLE is a FULL revalidation of the new
    snapshot: incremental ≡ full is the contract."""
    from ..stages.delta import kg_delta
    from ..stages.shacl import shacl_validate, shacl_validate_incremental

    base = _shacl_kg(sf_dir, updated=False)
    new = _shacl_kg(sf_dir, updated=True)
    prev = shacl_validate(base, _SHACL_SHAPES)
    delta = kg_delta(base, new)
    affected = delta.map_batches(
        lambda df: df[["subj"]].drop_duplicates(),
        batch_format="pandas",
    )
    out = shacl_validate_incremental(
        new, _SHACL_SHAPES, affected, prev
    ).to_pandas()
    return out.sort_values(
        ["subj", "shape_id"]
    ).reset_index(drop=True)[
        ["subj", "shape_id", "pred", "n_values", "violation"]
    ]


SQL_KG_SHACL_INCREMENTAL = """
WITH kept AS (
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE NOT (l_orderkey % 13 = 0 AND l_linenumber > 1)
),
lc AS (
    SELECT k, CAST(SUM(n) AS BIGINT) AS n FROM (
        SELECT l_orderkey AS k, COUNT(*) AS n
        FROM kept GROUP BY l_orderkey
        UNION ALL
        -- extras are emitted from the ORDERS side (incl. orders with
        -- no lineitem rows at all)
        SELECT o_orderkey, 3 FROM orders WHERE o_orderkey % 17 = 0
    ) GROUP BY k
),
v_lines AS (
    SELECT 'o:' || CAST(o.o_orderkey AS VARCHAR) AS subj,
           'sh_lines' AS shape_id, 'p:line' AS pred,
           COALESCE(lc.n, 0) AS n_values,
           CASE WHEN COALESCE(lc.n, 0) < 2 THEN 'minCount'
                ELSE 'maxCount' END AS violation
    FROM orders o LEFT JOIN lc ON lc.k = o.o_orderkey
    WHERE COALESCE(lc.n, 0) < 2 OR COALESCE(lc.n, 0) > 6
),
v_bigspend AS (
    SELECT 'o:' || CAST(o_orderkey AS VARCHAR) AS subj,
           'sh_bigspend' AS shape_id, 'p:bigspend' AS pred,
           CAST(0 AS BIGINT) AS n_values, 'minCount' AS violation
    FROM orders WHERE o_totalprice <= 150000.0
)
SELECT * FROM v_lines
UNION ALL
SELECT * FROM v_bigspend
ORDER BY subj, shape_id
"""


SQL_KG_SAMEAS_CANONICAL = """
WITH RECURSIVE trip AS (
    SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS subj,
           'p:nation' AS pred,
           'n:' || CAST(c_nationkey AS VARCHAR) AS obj
    FROM customer
    UNION ALL
    SELECT 'c:' || CAST(c_custkey AS VARCHAR), 'p:knows',
           'c:' || CAST(c_custkey + 1 AS VARCHAR)
    FROM customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT 'a:' || CAST(c_custkey AS VARCHAR), 'p:segment',
           c_mktsegment
    FROM customer WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT 'a:' || CAST(c_custkey AS VARCHAR), 'owl:sameAs',
           'c:' || CAST(c_custkey AS VARCHAR)
    FROM customer WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT 'b:' || CAST(c_custkey AS VARCHAR), 'owl:sameAs',
           'a:' || CAST(c_custkey AS VARCHAR)
    FROM customer WHERE c_custkey % 6 = 0
),
e AS (
    SELECT subj AS x, obj AS y FROM trip WHERE pred = 'owl:sameAs'
    UNION
    SELECT obj, subj FROM trip WHERE pred = 'owl:sameAs'
),
rr(x, y) AS (
    SELECT x, y FROM e
    UNION
    SELECT rr.x, e.y FROM rr JOIN e ON rr.y = e.x WHERE e.y <> rr.x
),
canon AS (
    SELECT x AS node, LEAST(x, MIN(y)) AS label FROM rr GROUP BY x
)
SELECT DISTINCT
    COALESCE(cs.label, t.subj) AS subj,
    t.pred,
    COALESCE(co.label, t.obj) AS obj
FROM trip t
LEFT JOIN canon cs ON cs.node = t.subj
LEFT JOIN canon co ON co.node = t.obj
WHERE t.pred <> 'owl:sameAs'
ORDER BY subj, pred, obj
"""


def q_kg_predicate_profile(sf_dir: str):
    """Predicate cardinality profile over an events-derived KG with all
    four functionality combinations: p:type (functional — one type per
    event — but many events per type object), p:uniq (functional AND
    inverse-functional — a 1:1 identifier edge), p:did (inverse-
    functional only — a user did many events, each event done once),
    p:tag (neither — multi-valued both ways: each event carries 1-2
    tags drawn from a small set)."""
    from ..stages.profile import predicate_profile

    ev = _t(sf_dir, "events", ["event_id", "user_id", "event_type"])

    def to_triples(df: pd.DataFrame) -> pd.DataFrame:
        e = "ev:" + df["event_id"].astype(str)
        u = "u:" + df["user_id"].astype(str)
        i = df["event_id"].astype(np.int64)
        parts = [
            pd.DataFrame({"subj": e, "pred": "p:type",
                          "obj": df["event_type"]}),
            pd.DataFrame({"subj": e, "pred": "p:uniq",
                          "obj": "x:" + i.astype(str)}),
            pd.DataFrame({"subj": u, "pred": "p:did", "obj": e}),
            pd.DataFrame({"subj": e, "pred": "p:tag",
                          "obj": "t:" + (i % 5).astype(str)}),
        ]
        m2 = (i % 2 == 0).to_numpy()
        if m2.any():
            parts.append(pd.DataFrame(
                {"subj": e[m2], "pred": "p:tag",
                 "obj": "t:" + ((i[m2] + 1) % 5).astype(str)}))
        return pd.concat(parts, ignore_index=True)

    out = predicate_profile(
        ev.map_batches(to_triples, batch_format="pandas")
    ).to_pandas()
    return out.sort_values("pred").reset_index(drop=True)


SQL_KG_PREDICATE_PROFILE = """
WITH trip AS (
    SELECT 'ev:' || CAST(event_id AS VARCHAR) AS subj,
           'p:type' AS pred, event_type AS obj FROM events
    UNION ALL
    SELECT 'ev:' || CAST(event_id AS VARCHAR), 'p:uniq',
           'x:' || CAST(event_id AS VARCHAR) FROM events
    UNION ALL
    SELECT 'u:' || CAST(user_id AS VARCHAR), 'p:did',
           'ev:' || CAST(event_id AS VARCHAR) FROM events
    UNION ALL
    SELECT 'ev:' || CAST(event_id AS VARCHAR), 'p:tag',
           't:' || CAST(event_id % 5 AS VARCHAR) FROM events
    UNION ALL
    SELECT 'ev:' || CAST(event_id AS VARCHAR), 'p:tag',
           't:' || CAST((event_id + 1) % 5 AS VARCHAR)
    FROM events WHERE event_id % 2 = 0
),
sc AS (
    SELECT pred, subj, CAST(COUNT(*) AS BIGINT) AS n
    FROM trip GROUP BY pred, subj
),
oc AS (
    SELECT pred, obj, CAST(COUNT(*) AS BIGINT) AS n
    FROM trip GROUP BY pred, obj
),
s AS (
    SELECT pred, CAST(SUM(n) AS BIGINT) AS n_triples,
           CAST(COUNT(*) AS BIGINT) AS n_subjects,
           CAST(MAX(n) AS BIGINT) AS max_subj_card
    FROM sc GROUP BY pred
),
o AS (
    SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_objects,
           CAST(MAX(n) AS BIGINT) AS max_obj_card
    FROM oc GROUP BY pred
)
SELECT s.pred, s.n_triples, s.n_subjects, o.n_objects,
       s.max_subj_card, o.max_obj_card,
       CAST(CASE WHEN s.max_subj_card = 1 THEN 1 ELSE 0 END AS BIGINT)
           AS functional,
       CAST(CASE WHEN o.max_obj_card = 1 THEN 1 ELSE 0 END AS BIGINT)
           AS inverse_functional
FROM s JOIN o ON o.pred = s.pred
ORDER BY s.pred
"""


SQL_KG_CHAR_SETS = """
WITH trip AS (
    SELECT 'ev:' || CAST(event_id AS VARCHAR) AS s, 'p:type' AS p
    FROM events
    UNION ALL
    SELECT 'ev:' || CAST(event_id AS VARCHAR), 'p:highvalue'
    FROM events WHERE value > 50
    UNION ALL
    SELECT 'ev:' || CAST(event_id AS VARCHAR), 'p:conversion'
    FROM events WHERE event_type IN ('purchase', 'signup')
    UNION ALL
    SELECT 'ev:' || CAST(event_id AS VARCHAR), 'p:props'
    FROM events WHERE length(COALESCE(props, '')) > 8
),
sig AS (
    SELECT s, string_agg(DISTINCT p, '|' ORDER BY p) AS cs
    FROM trip GROUP BY s
)
SELECT cs, CAST(COUNT(*) AS BIGINT) AS n_subjects FROM sig GROUP BY cs
"""


def q_docs_nb_scores(sf_dir: str):
    """Multinomial Naive Bayes source classifier: train on (source,
    text), score every doc under every source label (stages/classify).
    The oracle replays the FULL smoothed per-term formula; the engine
    uses the factored form — agreement is the algebra check."""
    from ..stages.classify import nb_scores

    return nb_scores(
        _t(sf_dir, "documents", ["doc_id", "source", "text"])
    )


_NB_CTE = r"""
WITH words AS (
    SELECT doc_id, source,
           unnest(regexp_extract_all(COALESCE(text, ''), '\S+')) AS w
    FROM documents
),
c_lw AS (
    SELECT source AS label, w, CAST(COUNT(*) AS DOUBLE) AS c
    FROM words GROUP BY source, w
),
tot AS (
    SELECT source AS label, CAST(COUNT(*) AS DOUBLE) AS toks
    FROM words GROUP BY source
),
nd AS (
    SELECT source AS label, CAST(COUNT(*) AS DOUBLE) AS n
    FROM documents GROUP BY source
),
v AS (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v FROM words),
dt AS (
    SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS cnt
    FROM words GROUP BY doc_id, w
),
base AS (
    SELECT d.doc_id, nd.label,
           LN(nd.n / (SELECT SUM(n) FROM nd)) AS prior
    FROM documents d CROSS JOIN nd
),
contrib AS (
    SELECT dt.doc_id, t.label,
           SUM(dt.cnt * LN((COALESCE(m.c, 0) + 1)
                           / (t.toks + (SELECT v FROM v)))) AS s
    FROM dt
    CROSS JOIN tot t
    LEFT JOIN c_lw m ON m.label = t.label AND m.w = dt.w
    GROUP BY dt.doc_id, t.label
)
"""

SQL_DOCS_NB_SCORES = _NB_CTE + """
SELECT b.doc_id, b.label,
       FLOOR((b.prior + COALESCE(c.s, 0)) * 1e4) / 1e4 AS nb_score
FROM base b
LEFT JOIN contrib c ON b.doc_id = c.doc_id AND b.label = c.label
"""


def q_docs_nb_predict(sf_dir: str):
    """Argmax label per document over the NB score matrix, ties broken
    by label ascending (stages/classify.nb_predict)."""
    from ..stages.classify import nb_predict, nb_scores

    return nb_predict(
        nb_scores(_t(sf_dir, "documents", ["doc_id", "source", "text"]))
    )


SQL_DOCS_NB_PREDICT = _NB_CTE.rstrip() + """
, ranked AS (
    SELECT b.doc_id, b.label,
           FLOOR((b.prior + COALESCE(c.s, 0)) * 1e4) / 1e4 AS sc
    FROM base b
    LEFT JOIN contrib c ON b.doc_id = c.doc_id AND b.label = c.label
)
SELECT doc_id, label AS pred FROM (
    SELECT doc_id, label,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY sc DESC, label ASC) AS rn
    FROM ranked
) WHERE rn = 1
"""


def q_rdfs_entailment(sf_dir: str):
    """RDFS forward-chaining closure (rules rdfs2/3/5/7/9/11) over a
    supplier/nation instance graph plus a small ontology — the
    small-ontology broadcast pattern (stages/rdfs.rdfs_entail)."""
    from ..stages.rdfs import (
        RDF_TYPE, RDFS_DOMAIN, RDFS_RANGE, RDFS_SUBCLASS, RDFS_SUBPROP,
        rdfs_entail,
    )

    onto = pd.DataFrame(
        [
            ("cls:Nation", RDFS_SUBCLASS, "cls:GeoRegion"),
            ("cls:GeoRegion", RDFS_SUBCLASS, "cls:Entity"),
            ("cls:Supplier", RDFS_SUBCLASS, "cls:Agent"),
            ("cls:Place", RDFS_SUBCLASS, "cls:Entity"),
            ("ex:basedIn", RDFS_SUBPROP, "ex:locatedIn"),
            ("ex:locatedIn", RDFS_SUBPROP, "ex:relatedTo"),
            ("ex:basedIn", RDFS_DOMAIN, "cls:Supplier"),
            ("ex:locatedIn", RDFS_RANGE, "cls:Place"),
        ],
        columns=["subj", "pred", "obj"],
    )

    def sup_triples(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": "sup:" + df["s_suppkey"].astype(str),
                "pred": "ex:basedIn",
                "obj": "nat:" + df["s_nationkey"].astype(str),
            }
        )

    def nat_types(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": "nat:" + df["n_nationkey"].astype(str),
                "pred": RDF_TYPE,
                "obj": "cls:Nation",
            }
        )

    triples = (
        _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        .map_batches(sup_triples, batch_format="pandas")
        .union(
            _t(sf_dir, "nation", ["n_nationkey"]).map_batches(
                nat_types, batch_format="pandas"
            ),
            rd.from_pandas(onto),
        )
    )
    return rdfs_entail(triples)


SQL_RDFS_ENTAILMENT = """
WITH RECURSIVE
scedge(c, d) AS (
    SELECT * FROM (VALUES
        ('cls:Nation', 'cls:GeoRegion'),
        ('cls:GeoRegion', 'cls:Entity'),
        ('cls:Supplier', 'cls:Agent'),
        ('cls:Place', 'cls:Entity')) t(c, d)
),
spedge(p, q) AS (
    SELECT * FROM (VALUES
        ('ex:basedIn', 'ex:locatedIn'),
        ('ex:locatedIn', 'ex:relatedTo')) t(p, q)
),
dom(p, c) AS (SELECT 'ex:basedIn', 'cls:Supplier'),
rng(p, c) AS (SELECT 'ex:locatedIn', 'cls:Place'),
subc(c, d) AS (
    SELECT c, d FROM scedge
    UNION
    SELECT s.c, e.d FROM subc s JOIN scedge e ON s.d = e.c
),
subp(p, q) AS (
    SELECT p, q FROM spedge
    UNION
    SELECT s.p, e.q FROM subp s JOIN spedge e ON s.q = e.p
),
inst(s, p, o) AS (
    SELECT 'sup:' || CAST(s_suppkey AS VARCHAR), 'ex:basedIn',
           'nat:' || CAST(s_nationkey AS VARCHAR) FROM supplier
    UNION ALL
    SELECT 'nat:' || CAST(n_nationkey AS VARCHAR),
           'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
           'cls:Nation' FROM nation
),
schema_trip(s, p, o) AS (
    SELECT c, 'http://www.w3.org/2000/01/rdf-schema#subClassOf', d
    FROM subc
    UNION ALL
    SELECT p, 'http://www.w3.org/2000/01/rdf-schema#subPropertyOf', q
    FROM subp
    UNION ALL
    SELECT p, 'http://www.w3.org/2000/01/rdf-schema#domain', c FROM dom
    UNION ALL
    SELECT p, 'http://www.w3.org/2000/01/rdf-schema#range', c FROM rng
),
lifted(s, p, o) AS (
    SELECT s, p, o FROM inst
    UNION ALL
    SELECT i.s, sp.q, i.o FROM inst i JOIN subp sp ON i.p = sp.p
),
typ0(s, p, o) AS (
    SELECT s, p, o FROM lifted
    WHERE p = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
    UNION ALL
    SELECT l.s, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', d.c
    FROM lifted l JOIN dom d ON l.p = d.p
    UNION ALL
    SELECT l.o, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', r.c
    FROM lifted l JOIN rng r ON l.p = r.p
),
typ(s, p, o) AS (
    SELECT s, p, o FROM typ0
    UNION ALL
    SELECT t.s, t.p, sc.d FROM typ0 t JOIN subc sc ON t.o = sc.c
)
SELECT DISTINCT s AS subj, p AS pred, o AS obj FROM (
    SELECT * FROM lifted
    UNION ALL SELECT * FROM typ
    UNION ALL SELECT * FROM schema_trip
)
"""


def q_docs_profile(sf_dir: str):
    """Column profiling of the documents table (row/null/exact-distinct
    per column) — one melt + (column, value) bucket shuffle
    (stages/profile.profile_columns). Float columns excluded by design
    (string-form distinct; see module docstring)."""
    from ..stages.profile import profile_columns

    return profile_columns(
        _t(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"]),
        columns=["doc_id", "lang", "source", "n_chars"],
    )


SQL_DOCS_PROFILE = """
SELECT 'doc_id' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct
FROM documents
UNION ALL
SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang), COUNT(DISTINCT lang)
FROM documents
UNION ALL
SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
       COUNT(DISTINCT n_chars)
FROM documents
UNION ALL
SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
       COUNT(DISTINCT source)
FROM documents
"""


def q_docs_hash_embed(sf_dir: str):
    """Feature-hashing text vectors (dim=32, signed, L2-normalized) in
    long form — the md5 dim/sign rule is replayed exactly by the oracle
    (stages/vectorize.feature_hash_embed)."""
    from ..stages.vectorize import feature_hash_embed

    return feature_hash_embed(
        _t(sf_dir, "documents", ["doc_id", "text"]), dim=32
    )


SQL_DOCS_HASH_EMBED = r"""
WITH terms AS (
    SELECT doc_id,
           unnest(regexp_extract_all(COALESCE(text, ''), '\S+')) AS term
    FROM documents
),
h AS (
    SELECT doc_id,
           CAST(CONCAT('0x', substr(md5(term), 1, 10)) AS BIGINT) % 32
               AS dim_idx,
           CASE WHEN CAST(CONCAT('0x', substr(md5('sgn:' || term), 1, 10))
                          AS BIGINT) % 2 = 0
                THEN 1.0 ELSE -1.0 END AS sgn
    FROM terms
),
v AS (
    SELECT doc_id, dim_idx, SUM(sgn) AS val
    FROM h GROUP BY doc_id, dim_idx
),
nz AS (SELECT * FROM v WHERE val <> 0),
nrm AS (SELECT doc_id, SQRT(SUM(val * val)) AS n FROM nz GROUP BY doc_id)
SELECT nz.doc_id, CAST(nz.dim_idx AS BIGINT) AS dim_idx,
       FLOOR(nz.val / nrm.n * 1e6) / 1e6 AS val
FROM nz JOIN nrm ON nz.doc_id = nrm.doc_id
"""


def q_docs_bpe_merges(sf_dir: str):
    """Distributed BPE vocab learning (20 merges) over the documents
    corpus — rows-only: the merge-application regex needs lookbehind,
    which DuckDB's RE2 lacks, so the oracle is the independent
    sequential replay pinned in tests/test_bpe.py."""
    from ..stages.bpe import bpe_learn

    return bpe_learn(
        _t(sf_dir, "documents", ["text"]), num_merges=20, num_buckets=16
    )


def q_docs_bpe_tokens(sf_dir: str):
    """Learn 20 merges, tokenize the corpus with them → per-doc word /
    BPE-token counts (rows-only; roundtrip + count invariants pinned in
    tests/test_bpe.py)."""
    from ..stages.bpe import bpe_learn, bpe_tokenize

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe_learn(docs, num_merges=20, num_buckets=16)
    out = bpe_tokenize(docs, merges)
    return out.map_batches(
        lambda d: d[["doc_id", "n_words", "n_bpe_tokens"]],
        batch_format="pandas",
    )


def q_warc_ingest(sf_dir: str):
    """WARC source parity (ISO 28500, sources/warc.py): the documents
    table is serialized to .warc.gz shards (one gzip member per record,
    deterministic bytes — url/ts/body all pure functions of the row),
    read back through the from-scratch WARC parser, and summarized as
    (url, n_bytes, ts_s). The oracle replays the url / utf-8-byte-length
    / timestamp rules over documents directly in SQL — matching values
    prove the serializer/parser pair is lossless over the corpus."""
    import tempfile

    import pyarrow.compute as pc

    from ..sources.warc import read_warc, write_warc

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        n = batch.num_rows
        return pa.table(
            {
                "url": pc.binary_join_element_wise(
                    pa.array(["http://corpus.local/"] * n),
                    ids.cast(pa.string()),
                    "",
                ),
                "warc_ts": pc.multiply(ids, 1_000_000).cast(
                    pa.timestamp("us")
                ),
                "html": batch["text"].cast(pa.binary()),
                "text": pa.array([""] * n, pa.string()),
                "lang": pa.array([""] * n, pa.string()),
            }
        )

    arc_dir = tempfile.mkdtemp(prefix="graft_warc_")
    write_warc(docs.map_batches(to_pages, batch_format="pyarrow"), arc_dir)

    def summarize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"],
                "n_bytes": pc.binary_length(batch["html"]).cast(pa.int64()),
                "ts_s": pc.divide(
                    batch["warc_ts"].cast(pa.int64()), 1_000_000
                ),
            }
        )

    out = (
        read_warc(arc_dir)
        .map_batches(summarize, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("url").reset_index(drop=True)


SQL_WARC_INGEST = """
SELECT 'http://corpus.local/' || doc_id AS url,
       octet_length(encode(text)) AS n_bytes,
       doc_id AS ts_s
FROM documents
ORDER BY url
"""


def q_docs_dup_substrings(sf_dir: str):
    """Exact duplicated-substring dedup (Lee et al. 2021, stride-1
    k-gram form — stages/curation.dup_kgram_stats): per-doc counts of
    duplicated 8-token windows plus the merged-span rollup. Every rule
    (raw \\S+ tokens, corpus-wide occurrence >= 2, touching-merge with
    fixed k) is replayed verbatim by the SQL oracle's lag() window."""
    from ..stages.curation import dup_kgram_stats

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = dup_kgram_stats(docs, k=8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_DOCS_DUP_SUBSTRINGS = r"""
WITH tok AS (
    SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents
),
g2 AS (
    SELECT doc_id,
           unnest(generate_series(1, len(w) - 7)) AS i1,
           w
    FROM tok WHERE len(w) >= 8
),
grams AS (
    SELECT doc_id, i1 - 1 AS i,
           array_to_string(w[i1:i1 + 7], ' ') AS g
    FROM g2
),
cnt AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
dup AS (
    SELECT doc_id, i FROM grams JOIN cnt USING (g) WHERE c >= 2
),
lagd AS (
    SELECT doc_id, i,
           lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS pi
    FROM dup
),
spans AS (
    SELECT doc_id,
           count(*) AS n_dup_grams,
           sum(CASE WHEN pi IS NULL OR i - pi > 8 THEN 1 ELSE 0 END)
               AS n_dup_spans,
           sum(CASE WHEN pi IS NULL THEN 8 ELSE least(i - pi, 8) END)
               AS n_dup_tokens
    FROM lagd GROUP BY doc_id
),
tot AS (SELECT doc_id, greatest(len(w) - 7, 0) AS n_grams FROM tok)
SELECT t.doc_id,
       CAST(t.n_grams AS BIGINT) AS n_grams,
       CAST(s.n_dup_grams AS BIGINT) AS n_dup_grams,
       CAST(s.n_dup_spans AS BIGINT) AS n_dup_spans,
       CAST(s.n_dup_tokens AS BIGINT) AS n_dup_tokens
FROM spans s JOIN tot t ON s.doc_id = t.doc_id
ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# Ordering contract (VERDICT r4 next-round item 8): the driver artifact
# records only the FIRST 50 registry entries, so ordering is a rotation
# policy — every query gets a driver artifact at least every two rounds.
# Round-5 top 50 prioritizes queries with NO driver artifact in any
# round (every r5 addition, including the closing-session tranche:
# graph-scoped MINUS, OWL entailment, functional sameAs, DSIR, CCNet
# buckets, entity resolution E2E, warm PageRank, SHACL value
# constraints), then r3-last-artifact entries fill the remaining
# slots; CORRECTNESS_r04-green entries sit past position 50. ALL
# registry entries (len(QUERIES) of them — never a hand count) are
# verified locally by tools/check_contract.py regardless of position.
QUERIES = {
    "graph_clustering": q_graph_clustering,
    "graph_assortativity": q_graph_assortativity,
    "web_anchor_topk": q_web_anchor_topk,
    "web_host_pagerank": q_web_host_pagerank,
    "web_redirects": q_web_redirects,
    "web_host_pagerank_weighted": q_web_host_pagerank_weighted,
    "graph_modularity": q_graph_modularity,
    "events_hll_by_type": q_events_hll_by_type,
    "graph_diameter": q_graph_diameter,
    "events_funnel": q_events_funnel,
    "events_funnel_latency": q_events_funnel_latency,
    "events_retention": q_events_retention,
    "events_transitions": q_events_transitions,
    "graph_component_sizes": q_graph_component_sizes,
    "parts_copurchase": q_parts_copurchase,
    "web_frontier": q_web_frontier,
    "graph_truss": q_graph_truss,
    "graph_neighbor_agg": q_graph_neighbor_agg,
    "docs_textrank": q_docs_textrank,
    "docs_host_boilerplate": q_docs_host_boilerplate,
    "events_type_cms": q_events_type_cms,
    "web_host_graph": q_web_host_graph,
    "web_page_links": q_web_page_links,
    "kg_transe": q_kg_transe,
    "kg_transe_eval": q_kg_transe_eval,
    "graph_walks": q_graph_walks,
    "graph_walk_pairs": q_graph_walk_pairs,
    "graph_wl": q_graph_wl,
    "sparql_update": q_sparql_update,
    "sparql_orderby_agg_expr": q_sparql_orderby_agg_expr,
    "events_lag": q_events_lag,
    "graph_scc": q_graph_scc,
    "docs_bloom_decontam": q_docs_bloom_decontam,
    "docs_robots_filter": q_docs_robots_filter,
    "events_distinct_hll": q_events_distinct_hll,
    "warc_ingest": q_warc_ingest,
    "docs_dup_substrings": q_docs_dup_substrings,
    "docs_incremental_neardup": q_docs_incremental_neardup,
    "docs_gopher_rules": q_docs_gopher_rules,
    "docs_jsonl_roundtrip": q_docs_jsonl_roundtrip,
    "kg_sameas_canonical": q_kg_sameas_canonical,
    "kg_shacl_validate": q_kg_shacl_validate,
    "kg_shacl_incremental": q_kg_shacl_incremental,
    "docs_domain_stats": q_docs_domain_stats,
    "kg_predicate_profile": q_kg_predicate_profile,
    "docs_ngram_overlap": q_docs_ngram_overlap,
    "docs_compression_ratio": q_docs_compression_ratio,
    "docs_weighted_sample": q_docs_weighted_sample,
    "docs_dedup_survivors": q_docs_dedup_survivors,
    "ann_topk_multi": q_ann_topk_multi,
    "graph_ppr": q_graph_ppr,
    "graph_label_prop": q_graph_label_prop,
    "nation_full_outer": q_nation_full_outer,
    "sparql_graph_filter": q_sparql_graph_filter,
    "sparql_graph_optional": q_sparql_graph_optional,
    "sparql_graph_minus": q_sparql_graph_minus,
    "kg_owl_entailment": q_kg_owl_entailment,
    "kg_functional_sameas": q_kg_functional_sameas,
    "docs_dsir_select": q_docs_dsir_select,
    "docs_ccnet_buckets": q_docs_ccnet_buckets,
    "kg_entity_resolution": q_kg_entity_resolution,
    "graph_pagerank_warm": q_graph_pagerank_warm,
    "kg_shacl_values": q_kg_shacl_values,
    "graph_harmonic": q_graph_harmonic,
    "sparql_group_agg_dataset": q_sparql_group_agg_dataset,
    "sparql_orderby_dataset": q_sparql_orderby_dataset,
    "sparql_neg_inverse": q_sparql_neg_inverse,
    "sparql_lang_alt_path": q_sparql_lang_alt_path,
    "sparql_describe": q_sparql_describe,
    "sparql_grouped_path": q_sparql_grouped_path,
    "sparql_zeroone_path": q_sparql_zeroone_path,
    "sparql_neg_path": q_sparql_neg_path,
    "sparql_optional_path": q_sparql_optional_path,
    "sparql_graph_const": q_sparql_graph_const,
    "lineitem_price_quantiles": q_lineitem_price_quantiles,
    "media_image_neardup": q_media_image_neardup,
    "media_audio_neardup": q_media_audio_neardup,
    "docs_langid": q_docs_langid,
    "docs_simhash": q_docs_simhash,
    "docs_fingerprint": q_docs_fingerprint,
    "docs_bpe_merges": q_docs_bpe_merges,
    "docs_bpe_tokens": q_docs_bpe_tokens,
    "ann_ivf": q_ann_ivf,
    "ann_quantized": q_ann_quantized,
    "embeddings_kmeans": q_embeddings_kmeans,
    "docs_logreg_score": q_docs_logreg_score,
    "sparql_pred_counts": q_sparql_pred_counts,
    "forge_pages": q_forge_pages,
    "graph_degree_hist": q_graph_degree_hist,
    "graph_pagerank": q_graph_pagerank,
    "graph_triangles": q_graph_triangles,
    "graph_components": q_graph_components,
    "sparql_filter_orderby": q_sparql_filter_orderby,
    "sparql_path_bgp": q_sparql_path_bgp,
    "sparql_union_distinct": q_sparql_union_distinct,
    "sparql_group_agg": q_sparql_group_agg,
    "sparql_string_filter": q_sparql_string_filter,
    "sparql_seq_path": q_sparql_seq_path,
    "sparql_having": q_sparql_having,
    "sparql_subselect": q_sparql_subselect,
    "sparql_expr_filter": q_sparql_expr_filter,
    "sparql_not_exists": q_sparql_not_exists,
    "sparql_values_bind": q_sparql_values_bind,
    "sparql_count_distinct": q_sparql_count_distinct,
    "sparql_construct": q_sparql_construct,
    "media_image_features": q_media_image_features,
    "media_audio_features": q_media_audio_features,
    "docs_quality_filter": q_docs_quality_filter,
    "docs_repetition": q_docs_repetition,
    "docs_decontaminate": q_docs_decontaminate,
    "docs_source_quota": q_docs_source_quota,
    "docs_tfidf": q_docs_tfidf,
    "docs_lm_score": q_docs_lm_score,
    "events_asof_click": q_events_asof_click,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "docs_minhash_dedup": q_docs_minhash_dedup,
    "docs_ngram_jaccard": q_docs_ngram_jaccard,
    "embedding_neardup": q_embedding_neardup,
    "docs_span_dedup": q_docs_span_dedup,
    "docs_url_dedup": q_docs_url_dedup,
    "docs_source_mixture": q_docs_source_mixture,
    "docs_normalize": q_docs_normalize,
    "docs_pii_scrub": q_docs_pii_scrub,
    "docs_top_terms": q_docs_top_terms,
    "events_distinct_kmv": q_events_distinct_kmv,
    "docs_inverted_index": q_docs_inverted_index,
    "docs_bm25": q_docs_bm25,
    "kg_snapshot_delta": q_kg_snapshot_delta,
    "docs_hash_embed": q_docs_hash_embed,
    "rdfs_entailment": q_rdfs_entailment,
    "docs_profile": q_docs_profile,
    "parts_fuzzy_match": q_parts_fuzzy_match,
    "docs_source_topk": q_docs_source_topk,
    "docs_zscore": q_docs_zscore,
    "kg_char_sets": q_kg_char_sets,
    "kg_negatives": q_kg_negatives,
    "docs_chunks": q_docs_chunks,
    "events_intervals": q_events_intervals,
    "docs_quality_ntile": q_docs_quality_ntile,
    "lineitem_corr": q_lineitem_corr,
    "docs_pmi": q_docs_pmi,
    "events_distinct_users": q_events_distinct_users,
    "docs_source_mode": q_docs_source_mode,
    "docs_nb_scores": q_docs_nb_scores,
    "docs_nb_predict": q_docs_nb_predict,
    "embeddings_project": q_embeddings_project,
    "sparql_bind_builtins": q_sparql_bind_builtins,
    "sparql_lang_filter": q_sparql_lang_filter,
    "sparql_datatype_filter": q_sparql_datatype_filter,
    "sparql_graph_var": q_sparql_graph_var,
    "sparql_select_dataset": q_sparql_select_dataset,
    "sparql_select_expr": q_sparql_select_expr,
    "sparql_agg_expr": q_sparql_agg_expr,
    "docs_budget_select": q_docs_budget_select,
    "docs_stratified_sample": q_docs_stratified_sample,
    "embeddings_centroids": q_embeddings_centroids,
    "events_running": q_events_running,
    "events_trailing": q_events_trailing,
    "graph_bfs": q_graph_bfs,
    "graph_hits": q_graph_hits,
    "graph_sssp": q_graph_sssp,
    "graph_temporal_reach": q_graph_temporal_reach,
    "graph_jaccard": q_graph_jaccard,
    "graph_kcore": q_graph_kcore,
    "rml_documents_triples": q_rml_documents_triples,
    "triples_pred_counts": q_triples_pred_counts,
    "revenue_filter": q_revenue_filter,
    "count_by_event_type": q_count_by_event_type,
    "lineitem_agg": q_lineitem_agg,
    "part_hierarchy_closure": q_part_hierarchy_closure,
    "docs_exact_dedup": q_docs_exact_dedup,
    "doc_token_stats": q_doc_token_stats,
    "doc_char_classes": q_doc_char_classes,
    "ann_topk": q_ann_topk,
    "docs_hash_split": q_docs_hash_split,
    "docs_length_quantiles": q_docs_length_quantiles,
    "docs_shuffle_shards": q_docs_shuffle_shards,
    "customer_order_counts": q_customer_order_counts,
    "top_parts_by_qty": q_top_parts_by_qty,
    "orders_limit": q_orders_limit,
    "distinct_flags": q_distinct_flags,
    "union_names": q_union_names,
    "events_hourly": q_events_hourly,
    "user_sessions": q_user_sessions,
    "events_session_join": q_events_session_join,
    "events_sliding": q_events_sliding,
    "docs_pack_sequences": q_docs_pack_sequences,
    "rml_customer_triples": q_rml_customer_triples,
}

ORACLES = {
    "graph_clustering": SQL_GRAPH_CLUSTERING,
    "graph_assortativity": SQL_GRAPH_ASSORTATIVITY,
    "web_anchor_topk": SQL_WEB_ANCHOR_TOPK,
    "web_host_pagerank": SQL_WEB_HOST_PAGERANK,
    "web_redirects": SQL_WEB_REDIRECTS,
    "docs_host_boilerplate": SQL_DOCS_HOST_BOILERPLATE,
    "web_host_pagerank_weighted": SQL_WEB_HOST_PAGERANK_WEIGHTED,
    "graph_modularity": SQL_GRAPH_MODULARITY,
    "events_hll_by_type": SQL_EVENTS_HLL_BY_TYPE,
    "graph_diameter": SQL_GRAPH_DIAMETER,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "events_funnel_latency": SQL_EVENTS_FUNNEL_LATENCY,
    "events_retention": SQL_EVENTS_RETENTION,
    "events_transitions": SQL_EVENTS_TRANSITIONS,
    "graph_component_sizes": SQL_GRAPH_COMPONENT_SIZES,
    "parts_copurchase": SQL_PARTS_COPURCHASE,
    "web_frontier": SQL_WEB_FRONTIER,
    "graph_truss": SQL_GRAPH_TRUSS,
    "graph_neighbor_agg": SQL_GRAPH_NEIGHBOR_AGG,
    "docs_textrank": SQL_DOCS_TEXTRANK,
    "docs_span_dedup": SQL_DOCS_SPAN_DEDUP,
    "docs_url_dedup": SQL_DOCS_URL_DEDUP,
    "docs_source_mixture": SQL_DOCS_SOURCE_MIXTURE,
    "docs_normalize": SQL_DOCS_NORMALIZE,
    "docs_gopher_rules": SQL_DOCS_GOPHER_RULES,
    "docs_jsonl_roundtrip": SQL_DOCS_JSONL_ROUNDTRIP,
    "kg_sameas_canonical": SQL_KG_SAMEAS_CANONICAL,
    "kg_shacl_validate": SQL_KG_SHACL_VALIDATE,
    "kg_shacl_incremental": SQL_KG_SHACL_INCREMENTAL,
    "docs_domain_stats": SQL_DOCS_DOMAIN_STATS,
    "kg_predicate_profile": SQL_KG_PREDICATE_PROFILE,
    "docs_ngram_overlap": SQL_DOCS_NGRAM_OVERLAP,
    "docs_weighted_sample": SQL_DOCS_WEIGHTED_SAMPLE,
    "docs_dedup_survivors": SQL_DOCS_DEDUP_SURVIVORS,
    "ann_topk_multi": SQL_ANN_TOPK_MULTI,
    "graph_ppr": SQL_GRAPH_PPR,
    "graph_label_prop": SQL_GRAPH_LABEL_PROP,
    "nation_full_outer": SQL_NATION_FULL_OUTER,
    "docs_pii_scrub": SQL_DOCS_PII_SCRUB,
    "docs_top_terms": SQL_DOCS_TOP_TERMS,
    "events_distinct_kmv": SQL_EVENTS_DISTINCT_KMV,
    "docs_inverted_index": SQL_DOCS_INVERTED_INDEX,
    "docs_bm25": SQL_DOCS_BM25,
    "kg_snapshot_delta": SQL_KG_SNAPSHOT_DELTA,
    "docs_hash_embed": SQL_DOCS_HASH_EMBED,
    "rdfs_entailment": SQL_RDFS_ENTAILMENT,
    "docs_profile": SQL_DOCS_PROFILE,
    "parts_fuzzy_match": SQL_PARTS_FUZZY_MATCH,
    "docs_source_topk": SQL_DOCS_SOURCE_TOPK,
    "docs_zscore": SQL_DOCS_ZSCORE,
    "kg_char_sets": SQL_KG_CHAR_SETS,
    "kg_negatives": SQL_KG_NEGATIVES,
    "kg_transe_eval": SQL_KG_TRANSE_EVAL,
    "graph_walks": SQL_GRAPH_WALKS,
    "graph_walk_pairs": SQL_GRAPH_WALK_PAIRS,
    "graph_wl": SQL_GRAPH_WL,
    "sparql_update": SQL_SPARQL_UPDATE,
    "sparql_orderby_agg_expr": SQL_SPARQL_ORDERBY_AGG_EXPR,
    "events_lag": SQL_EVENTS_LAG,
    "graph_scc": SQL_GRAPH_SCC,
    "docs_bloom_decontam": SQL_DOCS_BLOOM_DECONTAM,
    "docs_robots_filter": SQL_DOCS_ROBOTS_FILTER,
    "events_distinct_hll": SQL_EVENTS_DISTINCT_HLL,
    "events_type_cms": SQL_EVENTS_TYPE_CMS,
    "web_host_graph": SQL_WEB_HOST_GRAPH,
    "docs_chunks": SQL_DOCS_CHUNKS,
    "events_intervals": SQL_EVENTS_INTERVALS,
    "docs_quality_ntile": SQL_DOCS_QUALITY_NTILE,
    "lineitem_corr": SQL_LINEITEM_CORR,
    "docs_pmi": SQL_DOCS_PMI,
    "events_distinct_users": SQL_EVENTS_DISTINCT_USERS,
    "docs_source_mode": SQL_DOCS_SOURCE_MODE,
    "docs_nb_scores": SQL_DOCS_NB_SCORES,
    "docs_nb_predict": SQL_DOCS_NB_PREDICT,
    "embeddings_project": SQL_EMBEDDINGS_PROJECT,
    "sparql_bind_builtins": SQL_SPARQL_BIND_BUILTINS,
    "docs_budget_select": SQL_DOCS_BUDGET_SELECT,
    "docs_stratified_sample": SQL_DOCS_STRATIFIED_SAMPLE,
    "sparql_describe": SQL_SPARQL_DESCRIBE,
    "sparql_lang_filter": SQL_SPARQL_LANG_FILTER,
    "sparql_datatype_filter": SQL_SPARQL_DATATYPE_FILTER,
    "sparql_graph_var": SQL_SPARQL_GRAPH_VAR,
    "sparql_graph_filter": SQL_SPARQL_GRAPH_FILTER,
    "sparql_graph_optional": SQL_SPARQL_GRAPH_OPTIONAL,
    "sparql_graph_minus": SQL_SPARQL_GRAPH_MINUS,
    "kg_owl_entailment": SQL_KG_OWL_ENTAILMENT,
    "kg_functional_sameas": SQL_KG_FUNCTIONAL_SAMEAS,
    "docs_dsir_select": SQL_DOCS_DSIR_SELECT,
    "docs_ccnet_buckets": SQL_DOCS_CCNET_BUCKETS,
    "kg_entity_resolution": SQL_KG_ENTITY_RESOLUTION,
    "graph_pagerank_warm": SQL_GRAPH_PAGERANK_WARM,
    "kg_shacl_values": SQL_KG_SHACL_VALUES,
    "graph_harmonic": SQL_GRAPH_HARMONIC,
    "sparql_graph_const": SQL_SPARQL_GRAPH_CONST,
    "sparql_zeroone_path": SQL_SPARQL_ZEROONE_PATH,
    "sparql_neg_path": SQL_SPARQL_NEG_PATH,
    "sparql_optional_path": SQL_SPARQL_OPTIONAL_PATH,
    "sparql_grouped_path": SQL_SPARQL_GROUPED_PATH,
    "sparql_select_dataset": SQL_SPARQL_SELECT_DATASET,
    "sparql_group_agg_dataset": SQL_SPARQL_GROUP_AGG_DATASET,
    "sparql_orderby_dataset": SQL_SPARQL_ORDERBY_DATASET,
    "sparql_neg_inverse": SQL_SPARQL_NEG_INVERSE,
    "sparql_lang_alt_path": SQL_SPARQL_LANG_ALT_PATH,
    "sparql_select_expr": SQL_SPARQL_SELECT_EXPR,
    "sparql_agg_expr": SQL_SPARQL_AGG_EXPR,
    "count_by_event_type": SQL_COUNT_BY_EVENT_TYPE,
    "tpch_q3": SQL_TPCH_Q3,
    "tpch_q5": SQL_TPCH_Q5,
    "lineitem_agg": SQL_LINEITEM_AGG,
    "top_parts_by_qty": SQL_TOP_PARTS_BY_QTY,
    "customer_order_counts": SQL_CUSTOMER_ORDER_COUNTS,
    "orders_limit": SQL_ORDERS_LIMIT,
    "distinct_flags": SQL_DISTINCT_FLAGS,
    "union_names": SQL_UNION_NAMES,
    "revenue_filter": SQL_REVENUE_FILTER,
    "events_hourly": SQL_EVENTS_HOURLY,
    "user_sessions": SQL_USER_SESSIONS,
    "events_sliding": SQL_EVENTS_SLIDING,
    "events_running": SQL_EVENTS_RUNNING,
    "events_trailing": SQL_EVENTS_TRAILING,
    "events_asof_click": SQL_EVENTS_ASOF_CLICK,
    "events_session_join": SQL_EVENTS_SESSION_JOIN,
    "part_hierarchy_closure": SQL_PART_HIERARCHY_CLOSURE,
    "graph_pagerank": SQL_GRAPH_PAGERANK,
    "graph_triangles": SQL_GRAPH_TRIANGLES,
    "graph_degree_hist": SQL_GRAPH_DEGREE_HIST,
    "graph_components": SQL_GRAPH_COMPONENTS,
    "graph_bfs": SQL_GRAPH_BFS,
    "graph_hits": SQL_GRAPH_HITS,
    "graph_sssp": SQL_GRAPH_SSSP,
    "graph_temporal_reach": SQL_GRAPH_TEMPORAL_REACH,
    "graph_jaccard": SQL_GRAPH_JACCARD,
    "graph_kcore": SQL_GRAPH_KCORE,
    "rml_documents_triples": SQL_RML_DOCUMENTS_TRIPLES,
    "triples_pred_counts": SQL_TRIPLES_PRED_COUNTS,
    "docs_exact_dedup": SQL_DOCS_EXACT_DEDUP,
    "doc_token_stats": SQL_DOC_TOKEN_STATS,
    "doc_char_classes": SQL_DOC_CHAR_CLASSES,
    "ann_topk": SQL_ANN_TOPK,
    "embeddings_centroids": SQL_EMBEDDINGS_CENTROIDS,
    "sparql_filter_orderby": SQL_SPARQL_FILTER_ORDERBY,
    "sparql_path_bgp": SQL_SPARQL_PATH_BGP,
    "sparql_union_distinct": SQL_SPARQL_UNION_DISTINCT,
    "sparql_group_agg": SQL_SPARQL_GROUP_AGG,
    "sparql_string_filter": SQL_SPARQL_STRING_FILTER,
    "sparql_seq_path": SQL_SPARQL_SEQ_PATH,
    "sparql_having": SQL_SPARQL_HAVING,
    "sparql_subselect": SQL_SPARQL_SUBSELECT,
    "sparql_expr_filter": SQL_SPARQL_EXPR_FILTER,
    "sparql_not_exists": SQL_SPARQL_NOT_EXISTS,
    "sparql_values_bind": SQL_SPARQL_VALUES_BIND,
    "sparql_count_distinct": SQL_SPARQL_COUNT_DISTINCT,
    "sparql_construct": SQL_SPARQL_CONSTRUCT,
    "docs_quality_filter": SQL_DOCS_QUALITY_FILTER,
    "docs_hash_split": SQL_DOCS_HASH_SPLIT,
    "docs_length_quantiles": SQL_DOCS_LENGTH_QUANTILES,
    "lineitem_price_quantiles": SQL_LINEITEM_PRICE_QUANTILES,
    "docs_repetition": SQL_DOCS_REPETITION,
    "docs_decontaminate": SQL_DOCS_DECONTAMINATE,
    "docs_source_quota": SQL_DOCS_SOURCE_QUOTA,
    "docs_tfidf": SQL_DOCS_TFIDF,
    "docs_shuffle_shards": SQL_DOCS_SHUFFLE_SHARDS,
    "docs_pack_sequences": SQL_DOCS_PACK_SEQUENCES,
    "docs_lm_score": SQL_DOCS_LM_SCORE,
    "rml_customer_triples": SQL_RML_CUSTOMER_TRIPLES,
    "docs_ngram_jaccard": SQL_DOCS_NGRAM_JACCARD,
    "docs_minhash_dedup": SQL_DOCS_MINHASH_DEDUP,
    "warc_ingest": SQL_WARC_INGEST,
    "docs_dup_substrings": SQL_DOCS_DUP_SUBSTRINGS,
    "docs_incremental_neardup": SQL_DOCS_INCREMENTAL_NEARDUP,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
    # docs_langid / docs_simhash / ann_ivf / sparql_pred_counts /
    # forge_pages: genuinely non-SQL ops → rows-only checks
}
