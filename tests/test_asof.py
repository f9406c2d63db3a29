"""Distributed as-of join vs a brute-force per-row oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphforge_ray.stages.asof import asof_join


def _oracle(l, r, by, on, direction):
    rows = []
    for _, lr in l.iterrows():
        cand = r[r[by] == lr[by]]
        if direction == "backward":
            cand = cand[cand[on] <= lr[on]].sort_values(on)
        else:
            cand = cand[cand[on] >= lr[on]].sort_values(on, ascending=False)
        rows.append(cand.iloc[-1] if len(cand) else None)
    return rows


def test_asof_backward_and_forward():
    rng = np.random.default_rng(5)
    l = pd.DataFrame(
        {
            "u": rng.integers(0, 6, 60),
            "ts": rng.integers(0, 1000, 60).astype("int64"),
            "ev": [f"e{i}" for i in range(60)],
        }
    )
    r = pd.DataFrame(
        {
            "u": rng.integers(0, 6, 40),
            "ts": rng.integers(0, 1000, 40).astype("int64"),
            "px": rng.normal(size=40).round(3),
        }
    ).drop_duplicates(["u", "ts"])
    for direction in ("backward", "forward"):
        out = (
            asof_join(
                rd.from_pandas(l).repartition(4),
                rd.from_pandas(r).repartition(3),
                by="u", on="ts", direction=direction,
            )
            .to_pandas()
            .sort_values("ev")
            .reset_index(drop=True)
        )
        exp = _oracle(l, r, "u", "ts", direction)
        l_sorted = l.sort_values("ev").reset_index(drop=True)
        out = out.set_index("ev")
        for i, lr in l_sorted.iterrows():
            got = out.loc[lr["ev"]]
            want = exp[l.index[l["ev"] == lr["ev"]][0]]
            if want is None:
                assert pd.isna(got["px_r"]), (direction, lr["ev"])
            else:
                assert got["ts_r"] == want["ts"], (direction, lr["ev"])
                assert got["px_r"] == want["px"], (direction, lr["ev"])


def test_asof_no_right_rows_for_key():
    l = pd.DataFrame({"u": [1, 2], "ts": [10, 10], "ev": ["a", "b"]})
    r = pd.DataFrame({"u": [1], "ts": [5], "px": [1.0]})
    out = (
        asof_join(rd.from_pandas(l), rd.from_pandas(r), by="u", on="ts")
        .to_pandas()
        .set_index("ev")
    )
    assert out.loc["a", "px_r"] == 1.0
    assert pd.isna(out.loc["b", "px_r"])  # key 2 unmatched, left kept


def test_asof_timestamps_and_schema():
    l = pd.DataFrame(
        {
            "u": [1, 1],
            "ts": pd.to_datetime([100, 200], unit="s"),
            "n": np.array([7, 8], dtype="int64"),
        }
    )
    r = pd.DataFrame(
        {"u": [1], "ts": pd.to_datetime([150], unit="s"), "m": [3]}
    )
    out = (
        asof_join(rd.from_pandas(l), rd.from_pandas(r), by="u", on="ts")
        .to_pandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # unmatched row keeps a typed null (NaT), not an object NaN
    assert pd.isna(out.loc[0, "ts_r"])
    assert out.loc[1, "ts_r"] == pd.Timestamp("1970-01-01 00:02:30")
    assert out["n"].tolist() == [7, 8]  # left ints survive


def test_asof_rejects_bad_args():
    l = rd.from_pandas(pd.DataFrame({"u": [1], "ts": [1]}))
    r = rd.from_pandas(pd.DataFrame({"u": [1], "ts": [1]}))
    with pytest.raises(ValueError, match="direction"):
        asof_join(l, r, by="u", on="ts", direction="sideways")
    with pytest.raises(ValueError, match="missing"):
        asof_join(l, r, by="nope", on="ts")


# ---------------------------------------------------------------------------
# interval (range) join
# ---------------------------------------------------------------------------

def test_interval_join_inner_and_left():
    from graphforge_ray.stages.asof import interval_join

    pts = pd.DataFrame(
        {"u": [1, 1, 1, 2, 3], "ts": [5, 15, 99, 7, 1],
         "ev": ["a", "b", "c", "d", "e"]}
    )
    iv = pd.DataFrame(
        {"u": [1, 1, 2], "start": [0, 10, 0], "end": [9, 20, 50],
         "sid": [100, 101, 200]}
    )
    inner = (
        interval_join(
            rd.from_pandas(pts).repartition(2),
            rd.from_pandas(iv).repartition(2),
            by="u", on="ts",
        )
        .to_pandas().set_index("ev")
    )
    assert inner.loc["a", "sid_r"] == 100
    assert inner.loc["b", "sid_r"] == 101
    assert inner.loc["d", "sid_r"] == 200
    assert "c" not in inner.index and "e" not in inner.index

    left = (
        interval_join(
            rd.from_pandas(pts), rd.from_pandas(iv),
            by="u", on="ts", how="left_outer",
        )
        .to_pandas().set_index("ev")
    )
    assert len(left) == 5
    assert pd.isna(left.loc["c", "sid_r"]) and pd.isna(left.loc["e", "sid_r"])
    assert left.loc["a", "sid_r"] == 100


def test_interval_join_boundaries_inclusive():
    from graphforge_ray.stages.asof import interval_join

    pts = pd.DataFrame({"u": [1, 1], "ts": [10, 20], "ev": ["lo", "hi"]})
    iv = pd.DataFrame({"u": [1], "start": [10], "end": [20], "sid": [7]})
    out = (
        interval_join(rd.from_pandas(pts), rd.from_pandas(iv),
                      by="u", on="ts")
        .to_pandas()
    )
    assert sorted(out["ev"]) == ["hi", "lo"]  # both endpoints contained


def test_interval_join_overlap_raises():
    from graphforge_ray.stages.asof import interval_join

    pts = pd.DataFrame({"u": [1], "ts": [5], "ev": ["a"]})
    iv = pd.DataFrame(
        {"u": [1, 1], "start": [0, 5], "end": [9, 20], "sid": [1, 2]}
    )
    with pytest.raises(Exception, match="overlap"):
        interval_join(
            rd.from_pandas(pts), rd.from_pandas(iv), by="u", on="ts"
        ).to_pandas()


def test_interval_coalesce_islands(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.asof import interval_coalesce

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "b", "b"],
            "start_us": [0, 5, 20, 22, 0, 100],
            "end_us": [10, 15, 25, 30, 50, 200],
        }
    )
    out = (
        interval_coalesce(rd.from_pandas(df).repartition(3), key="k")
        .to_pandas()
        .sort_values(["k", "start_us"])
        .reset_index(drop=True)
    )
    got = list(map(tuple, out[["k", "start_us", "end_us"]].to_numpy()))
    assert got == [("a", 0, 15), ("a", 20, 30), ("b", 0, 50),
                   ("b", 100, 200)]


def test_interval_coalesce_touching_and_contained(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.asof import interval_coalesce

    df = pd.DataFrame(
        {
            "k": ["x", "x", "x"],
            "start_us": [0, 10, 2],
            "end_us": [10, 20, 8],  # touching at 10; [2,8] contained
        }
    )
    out = interval_coalesce(rd.from_pandas(df), key="k").to_pandas()
    assert list(map(tuple, out[["start_us", "end_us"]].to_numpy())) == [
        (0, 20)
    ]
