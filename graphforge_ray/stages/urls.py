"""URL canonicalization + URL-level dedup (webtext curation).

Crawl-scale corpora (C4/CCNet-style pipelines) dedup documents by URL
before any content pass — the same page is fetched many times with
tracking parameters, fragments, default ports and case-varied hosts.
The rule chain here is deliberately SQL-replayable: every step is one
RE2-compatible regex (or a lower() on the authority prefix), so the
DuckDB oracle applies the IDENTICAL chain (see
pipelines/driver_queries.SQL_DOCS_URL_DEDUP; parity pinned by tests).

Chain, in order (order matters — lowercasing must precede the
case-sensitive default-port strip):

1. strip fragment            ``#.*$`` → ''
2. lowercase scheme+host     lower() on the ``^[a-zA-Z]+://[^/?#]*`` prefix
3. strip tracking params     ``([?&])(utm_*|fbclid|gclid|msclkid)=[^&]*`` → ``\1``
   then separator cleanup    ``\?&``→``?`` (once), ``&&+``→``&``, ``[?&]+$``→''
4. strip default ports       ``^(http://host):80`` / ``^(https://host):443``
5. strip trailing slashes    ``/+$`` → ''

Non-URL strings pass through steps they don't match — canonicalization
is total, never raises on junk input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import bucket_tag

__all__ = ["canonical_url_batch", "url_dedup"]

_TRACKING = r"([?&])(utm_[a-zA-Z0-9_]+|fbclid|gclid|msclkid)=[^&]*"
_AUTHORITY = r"^[a-zA-Z]+://[^/?#]*"


def canonical_url_batch(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalization of a string Series (pandas str
    kernels end to end — no per-row Python). Null-safe: NaN in, NaN
    out."""
    u = urls.astype("string")
    u = u.str.replace(r"#.*$", "", regex=True)
    # lowercase the scheme://authority prefix, keep path/query case:
    # extract the prefix, strip it off with the SAME anchored regex
    # (both vectorized), re-concatenate lowered prefix + original rest
    auth = u.str.extract(f"({_AUTHORITY})", expand=False)
    has = auth.notna()
    rest = u.str.replace(_AUTHORITY, "", n=1, regex=True)
    u = u.mask(has, auth.str.lower().str.cat(rest, na_rep=""))
    u = u.str.replace(_TRACKING, r"\1", regex=True)
    u = u.str.replace(r"\?&", "?", n=1, regex=True)
    u = u.str.replace(r"&&+", "&", regex=True)
    u = u.str.replace(r"[?&]+$", "", regex=True)
    u = u.str.replace(r"^(http://[^/:]+):80(/|$)", r"\1\2", regex=True)
    u = u.str.replace(r"^(https://[^/:]+):443(/|$)", r"\1\2", regex=True)
    u = u.str.replace(r"/+$", "", regex=True)
    return u.astype(object)


def url_dedup(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Collapse rows whose URLs canonicalize identically → Dataset
    (canon_url, n_dups, keep_id) with keep_id = MIN(id) per group (the
    deterministic survivor rule, replayable in SQL).

    Scale shape: canonicalize + within-batch combiner (one row per
    distinct canon URL per batch: partial count + partial min-id), ONE
    bucket shuffle keyed on the canonical URL's hash, one vectorized
    groupby per bucket. The corpus text never moves — only (url, id)
    pairs."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        canon = canonical_url_batch(df[url_col])
        part = pd.DataFrame({"canon_url": canon, "_id": df[id_col]})
        g = part.groupby("canon_url", as_index=False).agg(
            n_dups=("_id", "size"), keep_id=("_id", "min")
        )
        g["n_dups"] = g["n_dups"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, "canon_url", num_buckets))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("canon_url", as_index=False).agg(
            n_dups=("n_dups", "sum"), keep_id=("keep_id", "min")
        )
        out["n_dups"] = out["n_dups"].astype(np.int64)
        return out

    return (
        ds.map_batches(combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )
