"""Windowed-aggregation tests (stages/windows): tumbling, sliding,
session semantics on a hand-computable event log."""

import pandas as pd
import pytest

from graphforge_ray.stages.windows import (
    session_window,
    sliding_window,
    tumbling_window,
)

US = 1_000_000
H = 3600 * US


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data as rd

    rows = [
        # user 1: two events in hour 0, one in hour 2 (session gap)
        {"user_id": 1, "ts": pd.Timestamp(10 * US * 60, unit="us"), "value": 1.0},
        {"user_id": 1, "ts": pd.Timestamp(20 * US * 60, unit="us"), "value": 2.0},
        {"user_id": 1, "ts": pd.Timestamp(2 * H + 5 * US * 60, unit="us"), "value": 4.0},
        # user 2: single event
        {"user_id": 2, "ts": pd.Timestamp(30 * US * 60, unit="us"), "value": 8.0},
    ]
    return rd.from_pandas(pd.DataFrame(rows))


def test_tumbling(events_ds):
    out = tumbling_window(events_ds, size_us=H).to_pandas()
    key = out.set_index(["user_id", "window_start_us"])
    assert key.loc[(1, 0), "n"] == 2 and key.loc[(1, 0), "sum_value"] == 3.0
    assert key.loc[(1, 2 * H), "n"] == 1
    assert key.loc[(2, 0), "sum_value"] == 8.0


def test_sliding_fanout(events_ds):
    out = sliding_window(events_ds, size_us=H, slide_us=H // 2).to_pandas()
    key = out.set_index(["user_id", "window_start_us"])
    # window [-30min, 30min) and [0, 60min) both contain the min-10 and
    # min-20 events (each event fans out to 2 windows)
    assert key.loc[(1, -H // 2), "n"] == 2
    assert key.loc[(1, 0), "n"] == 2
    # window starting 00:00 for user2 contains the 30-min event
    assert key.loc[(2, 0), "n"] == 1 and key.loc[(2, H // 2), "n"] == 1


def test_sessions(events_ds):
    out = session_window(events_ds, gap_us=30 * 60 * US).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_start_us")
    assert len(u1) == 2                       # hour-0 pair, hour-2 single
    first = u1.iloc[0]
    assert first["n"] == 2 and first["sum_value"] == 3.0
    assert first["session_start_us"] == 10 * 60 * US
    assert first["session_end_us"] == 20 * 60 * US
    assert len(out[out["user_id"] == 2]) == 1


def test_window_params_validated(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from graphforge_ray.stages.windows import (
        session_window,
        sliding_window,
        tumbling_window,
    )

    ev = rd.from_pandas(pd.DataFrame(
        {"user_id": [1], "ts": [pd.Timestamp("2024-01-01")], "value": [1.0]}
    ))
    for bad in (
        lambda: tumbling_window(ev, size_us=0),
        lambda: sliding_window(ev, size_us=0, slide_us=10),
        lambda: sliding_window(ev, size_us=10, slide_us=-1),
        lambda: session_window(ev, gap_us=0),
    ):
        with pytest.raises(ValueError, match="positive"):
            bad()


def test_running_window_cumulative(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.windows import running_window

    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [7, 7, 7, 9, 9, 7],
            "ts": pd.to_datetime(
                [
                    "2026-01-01 10:00",
                    "2026-01-01 09:00",
                    "2026-01-01 11:00",
                    "2026-01-01 09:30",
                    "2026-01-01 09:10",
                    "2026-01-01 09:00",  # tie with event 2 → id order
                ]
            ),
            "value": [10.0, 1.0, 100.0, 5.0, 2.0, 0.5],
        }
    )
    out = (
        running_window(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # user 7 order: (09:00, id2), (09:00, id6), (10:00, id1), (11:00, id3)
    assert out.loc[2, "running_n"] == 1 and out.loc[2, "running_sum"] == 1.0
    assert out.loc[6, "running_n"] == 2 and out.loc[6, "running_sum"] == 1.5
    assert out.loc[1, "running_n"] == 3 and out.loc[1, "running_sum"] == 11.5
    assert out.loc[3, "running_n"] == 4 and out.loc[3, "running_sum"] == 111.5
    # user 9 order: id5 then id4
    assert out.loc[5, "running_n"] == 1 and out.loc[5, "running_sum"] == 2.0
    assert out.loc[4, "running_n"] == 2 and out.loc[4, "running_sum"] == 7.0
    assert str(out["running_n"].dtype) == "int64"


def test_trailing_window_range_frame(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.windows import US, trailing_window

    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [7, 7, 7, 7, 9, 7],
            "ts": pd.to_datetime(
                [
                    "2026-01-01 10:00",
                    "2026-01-01 10:30",
                    "2026-01-01 11:00",
                    "2026-01-01 12:30",
                    "2026-01-01 10:00",
                    "2026-01-01 11:00",  # tie with event 3 (peer)
                ]
            ),
            "value": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
        }
    )
    out = (
        trailing_window(
            rd.from_pandas(df).repartition(3), trail_us=3600 * US
        )
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # user 7 @10:00 → itself
    assert out.loc[1, "trail_n"] == 1 and out.loc[1, "trail_sum"] == 1.0
    # @10:30 → 10:00 + 10:30
    assert out.loc[2, "trail_n"] == 2 and out.loc[2, "trail_sum"] == 3.0
    # @11:00 → [10:00, 11:00] incl BOTH 11:00 peers (RANGE semantics)
    assert out.loc[3, "trail_n"] == 4 and out.loc[3, "trail_sum"] == 39.0
    assert out.loc[6, "trail_n"] == 4 and out.loc[6, "trail_sum"] == 39.0
    # @12:30 → only itself (11:00 < 11:30 cutoff)
    assert out.loc[4, "trail_n"] == 1 and out.loc[4, "trail_sum"] == 8.0
    # user 9 isolated
    assert out.loc[5, "trail_n"] == 1 and out.loc[5, "trail_sum"] == 16.0


def test_lag_window_matches_pandas(ray_session):
    import numpy as np
    import ray.data as rd

    from graphforge_ray.stages.windows import lag_window

    df = pd.DataFrame({
        "event_id": range(8),
        "user_id": ["u1", "u2", "u1", "u1", "u2", "u3", "u2", "u1"],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:00:30",
            "2024-01-01 00:01:00", "2024-01-01 00:01:00",
            "2024-01-01 00:05:00", "2024-01-01 00:00:10",
            "2024-01-01 00:06:00", "2024-01-01 01:00:00",
        ]),
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
    })
    got = lag_window(rd.from_pandas(df).repartition(3)).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    want = df.sort_values(["user_id", "ts", "event_id"])
    grp = want.groupby("user_id", sort=False)
    want = want.assign(
        lag_value=grp["value"].shift(1),
        lead_value=grp["value"].shift(-1),
        prev_ts=grp["ts"].shift(1),
    ).sort_values("event_id", ignore_index=True)
    gap = ((want["ts"] - want["prev_ts"]).dt.total_seconds() * 1e6)
    gap = gap.fillna(-1).astype(np.int64)
    assert np.allclose(got["lag_value"].fillna(-9),
                       want["lag_value"].fillna(-9))
    assert np.allclose(got["lead_value"].fillna(-9),
                       want["lead_value"].fillna(-9))
    assert got["gap_us"].tolist() == gap.tolist()
    with pytest.raises(ValueError, match="positive"):
        lag_window(rd.from_pandas(df), periods=0)


def test_funnel_counts_first_touch(ray_session):
    import ray.data as rd

    import numpy as np

    from graphforge_ray.stages.windows import funnel_counts

    t0 = pd.Timestamp("2024-01-01")

    def ev(u, typ, mins):
        return {"user_id": u, "event_type": typ,
                "ts": t0 + pd.Timedelta(minutes=mins)}

    rows = [
        # u1 completes in order
        ev(1, "view", 0), ev(1, "click", 5), ev(1, "purchase", 9),
        # u2 clicks BEFORE viewing — click must not count (first-touch
        # view at 10; no click after it)
        ev(2, "click", 1), ev(2, "view", 10),
        # u3 views + clicks, purchase precedes the click → 2 steps only
        ev(3, "purchase", 0), ev(3, "view", 2), ev(3, "click", 4),
        # u4 never views
        ev(4, "click", 1), ev(4, "purchase", 2),
        # noise types ignored
        ev(1, "error", 3), ev(2, "signup", 3),
    ]
    out = funnel_counts(
        rd.from_pandas(pd.DataFrame(rows)).repartition(3),
        steps=["view", "click", "purchase"],
    )
    got = dict(zip(out["event_type"], out["n_users"]))
    assert got == {"view": 3, "click": 2, "purchase": 1}
    assert list(out["step"]) == [1, 2, 3]
    assert out["n_users"].dtype == np.int64


def test_funnel_counts_validation(ray_session):
    import ray.data as rd

    import pytest as _pytest

    from graphforge_ray.stages.windows import funnel_counts

    ds = rd.from_pandas(pd.DataFrame(
        {"user_id": [1], "event_type": ["view"],
         "ts": [pd.Timestamp("2024-01-01")]}))
    with _pytest.raises(ValueError, match="non-empty"):
        funnel_counts(ds, steps=[])
    with _pytest.raises(ValueError, match="distinct"):
        funnel_counts(ds, steps=["view", "view"])


def test_retention_cohorts_matrix(ray_session):
    import ray.data as rd

    import numpy as np

    from graphforge_ray.stages.windows import retention_cohorts

    def ev(u, day, hour=1):
        return {"user_id": u,
                "ts": pd.Timestamp("2024-01-01")
                + pd.Timedelta(days=day, hours=hour)}

    rows = [
        ev(1, 0), ev(1, 0, 5), ev(1, 2),      # cohort d0: active 0, 2
        ev(2, 0), ev(2, 1),                   # cohort d0: active 0, 1
        ev(3, 1), ev(3, 3),                   # cohort d1: active 0, 2
    ]
    out = (
        retention_cohorts(rd.from_pandas(pd.DataFrame(rows))
                          .repartition(2))
        .to_pandas()
        .sort_values(["cohort_date", "day_offset"], ignore_index=True)
    )
    want = pd.DataFrame({
        "cohort_date": ["2024-01-01"] * 3 + ["2024-01-02"] * 2,
        "day_offset": np.array([0, 1, 2, 0, 2], dtype=np.int64),
        "n_users": np.array([2, 1, 1, 1, 1], dtype=np.int64),
    })
    pd.testing.assert_frame_equal(out, want)


def test_transition_counts_ordered_pairs(ray_session):
    import numpy as np
    import ray.data as rd

    from graphforge_ray.stages.windows import transition_counts

    t0 = pd.Timestamp("2024-01-01")
    rows = [
        # u1: a -> b -> a  (pairs: ab, ba)
        {"user_id": 1, "event_type": "a", "ts": t0, "event_id": 1},
        {"user_id": 1, "event_type": "b",
         "ts": t0 + pd.Timedelta(minutes=1), "event_id": 2},
        {"user_id": 1, "event_type": "a",
         "ts": t0 + pd.Timedelta(minutes=2), "event_id": 3},
        # u2: same-ts tie broken by event_id: b (id 4) then a (id 5)
        {"user_id": 2, "event_type": "b", "ts": t0, "event_id": 4},
        {"user_id": 2, "event_type": "a", "ts": t0, "event_id": 5},
        # u3: single event -> no pair
        {"user_id": 3, "event_type": "a", "ts": t0, "event_id": 6},
    ]
    out = transition_counts(
        rd.from_pandas(pd.DataFrame(rows)).repartition(3))
    got = {(r["prev_type"], r["next_type"]): r["n"]
           for _, r in out.iterrows()}
    assert got == {("a", "b"): 1, ("b", "a"): 2}
    assert out["n"].dtype == np.int64


def test_funnel_latency_gaps(ray_session):
    import numpy as np
    import ray.data as rd

    from graphforge_ray.stages.windows import funnel_latency

    t0 = pd.Timestamp("2024-01-01")

    def ev(u, typ, mins):
        return {"user_id": u, "event_type": typ,
                "ts": t0 + pd.Timedelta(minutes=mins)}

    rows = [
        # u1: view@0 click@5 purchase@9 → gaps 5min, 4min
        ev(1, "view", 0), ev(1, "click", 5), ev(1, "purchase", 9),
        # u2: view@0 click@15, no purchase → only first gap (15min)
        ev(2, "view", 0), ev(2, "click", 15),
        # u3: click precedes view → converts nothing
        ev(3, "click", 0), ev(3, "view", 1),
    ]
    out = funnel_latency(
        rd.from_pandas(pd.DataFrame(rows)).repartition(2),
        steps=["view", "click", "purchase"],
    )
    r2 = out[out["step"] == 2].iloc[0]
    r3 = out[out["step"] == 3].iloc[0]
    assert (r2["from_type"], r2["to_type"]) == ("view", "click")
    assert r2["n_users"] == 2
    assert r2["mean_gap_us"] == 10 * 60 * 1_000_000  # mean(5, 15) min
    assert r3["n_users"] == 1
    assert r3["mean_gap_us"] == 4 * 60 * 1_000_000
    assert out["mean_gap_us"].dtype == np.int64


def test_funnel_latency_no_converters(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.windows import funnel_latency

    rows = [{"user_id": 1, "event_type": "click",
             "ts": pd.Timestamp("2024-01-01")}]
    out = funnel_latency(rd.from_pandas(pd.DataFrame(rows)),
                         steps=["view", "click"])
    assert list(out["n_users"]) == [0]
    assert list(out["mean_gap_us"]) == [0]
