"""Top-k chart preparation — parity with ``preparePlotData``
(/root/reference/docs/scripts/queryManager.js:7-58), the reference's only
numeric post-processing (SURVEY P13 / O2).

Faithful semantics, quirks included:

* exactly two columns required, else ``None`` (queryManager.js:20-23);
* column names become xLabel/yLabel; title = ``Top {x} by {y}`` (:56);
* the second column is coerced with ``parseFloat``; a non-numeric row is
  SKIPPED, not fatal — the reference's ``return null`` inside ``forEach``
  only exits the callback (queryManager.js:30-42), so partial data still
  plots. ``None`` is returned only when nothing numeric remains.
"""

from __future__ import annotations

import math

import pandas as pd

__all__ = ["prepare_plot_data"]


def _parse_float(value) -> float:
    """JS parseFloat: leading-prefix numeric parse, NaN on failure."""
    if isinstance(value, (int, float)):
        return float(value)
    s = str(value).strip()
    # longest numeric prefix (parseFloat semantics)
    for end in range(len(s), 0, -1):
        try:
            out = float(s[:end])
            # exclude strings like 'inf'/'nan' prefixes JS wouldn't accept?
            # JS parseFloat accepts 'Infinity' but not 'inf'; keep simple:
            return out
        except ValueError:
            continue
    return math.nan


def prepare_plot_data(bindings: pd.DataFrame) -> dict | None:
    """Bindings table → ``{x, y, xLabel, yLabel, title}`` or ``None``."""
    if bindings is None or len(bindings) == 0:
        return None
    if len(bindings.columns) != 2:
        return None
    x_label, y_label = map(str, bindings.columns)
    xs, ys = [], []
    for xv, yv in zip(bindings.iloc[:, 0], bindings.iloc[:, 1]):
        y = _parse_float(yv)
        if math.isnan(y):
            continue  # reference skips the row (forEach early return)
        xs.append(str(xv))
        ys.append(y)
    if not xs or not ys:
        return None
    return {
        "x": xs,
        "y": ys,
        "xLabel": x_label,
        "yLabel": y_label,
        "title": f"Top {x_label} by {y_label}",
    }
