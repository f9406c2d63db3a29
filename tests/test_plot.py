"""prepare_plot_data parity tests (reference queryManager.js:7-58)."""

import pandas as pd

from graphforge_ray.query.plot import prepare_plot_data


def test_two_numeric_columns():
    df = pd.DataFrame({"p": ["a", "b"], "count": [3, "7.5"]})
    out = prepare_plot_data(df)
    assert out == {
        "x": ["a", "b"], "y": [3.0, 7.5],
        "xLabel": "p", "yLabel": "count", "title": "Top p by count",
    }


def test_wrong_column_count_is_none():
    assert prepare_plot_data(pd.DataFrame({"a": [1]})) is None
    assert prepare_plot_data(pd.DataFrame({"a": [1], "b": [2], "c": [3]})) is None
    assert prepare_plot_data(pd.DataFrame({"a": [], "b": []})) is None


def test_non_numeric_rows_skipped_not_fatal():
    # reference quirk: `return null` inside forEach only skips the row
    df = pd.DataFrame({"p": ["a", "b", "c"], "n": ["1", "oops", "3"]})
    out = prepare_plot_data(df)
    assert out["x"] == ["a", "c"] and out["y"] == [1.0, 3.0]


def test_all_non_numeric_is_none():
    df = pd.DataFrame({"p": ["a"], "n": ["x"]})
    assert prepare_plot_data(df) is None


def test_parsefloat_prefix_semantics():
    df = pd.DataFrame({"p": ["a"], "n": ["12.5px"]})
    assert prepare_plot_data(df)["y"] == [12.5]
