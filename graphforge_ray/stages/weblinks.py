"""Hyperlink resolution + host-level web-link graph (crawl analytics).

A Common-Crawl-scale KG constructor needs the WEB GRAPH alongside the
content graph: which registered domains link to which (crawl frontier
seeding, domain authority via PageRank over hosts, spam-farm
detection). The forge extractor already harvests ``<a href>`` anchors
(stages/extract.py PRED_LINKS_TO); this module turns raw
``(src_url, href)`` pairs into a domain-level edge list:

1. ``resolve_href_batch`` — reference resolution (RFC 3986 §5, the
   documented subset below), fully vectorized and RE2-replayable so the
   DuckDB driver oracle applies the IDENTICAL chain:

   * fragment stripped from the href first (the web graph is
     fragment-blind);
   * empty href (incl. fragment-only) → the source URL sans fragment
     (same-document reference);
   * scheme-absolute (``^[a-zA-Z][a-zA-Z0-9+.-]*:``) → as-is;
   * protocol-relative ``//host/…`` → source scheme + ``:`` + href;
   * root-relative ``/path`` → source origin + href;
   * query-only ``?q=…`` → origin + source path + href;
   * otherwise path-relative → origin + source path directory + href;
   * dot segments then collapse iteratively (``/./``, trailing ``/.``,
     ``/seg/../`` leftmost-first with above-root clamping — leftmost
     order gives RFC stack semantics; parity vs urllib.parse.urljoin
     pinned in tests across the whole case matrix).

   Sources without a parseable origin resolve relative forms to ``''``
   (dropped by the scheme filter downstream) — junk-tolerant, total.

2. ``host_link_graph`` — per-batch resolve + registered-domain map +
   (src_domain, dst_domain) count combiner, then ONE src-domain-bucket
   shuffle sums partials (a pair lives wholly in its src bucket, so
   per-bucket sums are globally exact). Only ``http(s)`` results count;
   rows with an unextractable domain on either side are dropped.

3. ``page_link_edges`` — pages(url, html) → flat (src_url, href,
   anchor_text) rows via the SAME extractor the forge pipeline uses
   (byte-identical text contract, extract/html_text.py).

Scale shape: resolution and domain mapping are pure map-side string
kernels; the single shuffle moves per-batch (src_domain, dst_domain)
count partials — never the pages, never the raw link rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import bucket_tag, pair_bucket_tag
from .urls import registered_domain_batch

__all__ = ["resolve_href_batch", "host_link_graph", "page_link_edges",
           "anchor_term_topk"]

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*:"
_ORIGIN_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

# dot-segment collapse: one round of the five rules below, iterated to
# fixpoint. Round budget 64 ≫ any sane path depth; a loop that deep is
# adversarial input and fails loudly rather than silently truncating.
_MAX_DOT_ROUNDS = 64


def _collapse_round(path: pd.Series) -> pd.Series:
    """One round of dot-segment removal over a PATH-ONLY string (origin
    and query already split off, so no rule can consume the authority).
    Order matters: the anchored above-root clamp runs BEFORE the
    generic leftmost ``/seg/../`` collapse so a leading ``..`` can
    never be consumed as the segment."""
    b = path.str.replace(r"/\./", "/", regex=True)
    b = b.str.replace(r"/\.$", "/", regex=True)
    b = b.str.replace(r"^/\.\./", "/", regex=True)
    b = b.str.replace(r"^/\.\.$", "/", regex=True)
    b = b.str.replace(r"/[^/?#]+/\.\./", "/", n=1, regex=True)
    b = b.str.replace(r"/[^/?#]+/\.\.$", "/", n=1, regex=True)
    return b


def _collapse_dots(urls: pd.Series) -> pd.Series:
    """Iterative dot-segment removal (RFC 3986 §5.2.4 semantics via
    leftmost-first single collapses) applied to the PATH part only —
    the origin is split off first (an authority label can never be
    consumed as a path segment) and so is the query string (``/../``
    inside a query survives untouched)."""
    u = urls.astype("string").fillna("")
    origin = u.str.extract(f"({_ORIGIN_RE})", expand=False).fillna("")
    tail = u.str.replace(_ORIGIN_RE, "", n=1, regex=True)
    path = tail.str.replace(r"\?.*$", "", regex=True)
    qs = tail.str.extract(r"(\?.*)$", expand=False).fillna("")
    for _ in range(_MAX_DOT_ROUNDS):
        np_ = _collapse_round(path)
        if np_.equals(path):
            return (origin + np_ + qs).astype(object)
        path = np_
    raise ValueError(
        f"dot-segment collapse did not converge in {_MAX_DOT_ROUNDS} "
        "rounds — adversarial path depth"
    )


def resolve_href_batch(src: pd.Series, href: pd.Series) -> pd.Series:
    """Resolve each href against its source URL (see module doc for
    the exact rule chain) → object Series of absolute URLs, fragment
    stripped. Null/irresolvable rows → ''."""
    s = src.astype("string").fillna("")
    h = (
        href.astype("string")
        .fillna("")
        .str.replace(r"#.*$", "", regex=True)
    )
    origin = s.str.extract(f"({_ORIGIN_RE})", expand=False).fillna("")
    scheme = s.str.extract(
        r"^([a-zA-Z][a-zA-Z0-9+.-]*):", expand=False
    ).fillna("")
    spath = (
        s.str.replace(_ORIGIN_RE, "", n=1, regex=True)
        .str.replace(r"[?#].*$", "", regex=True)
        .fillna("")
    )
    sdir = spath.str.replace(r"[^/]*$", "", regex=True)
    sdir = sdir.mask(sdir.eq(""), "/")
    src_nofrag = s.str.replace(r"#.*$", "", regex=True)

    has_origin = origin.ne("")
    conds = [
        h.eq(""),
        h.str.match(_SCHEME_RE).fillna(False),
        h.str.startswith("//").fillna(False),
        h.str.startswith("/").fillna(False) & has_origin,
        h.str.startswith("?").fillna(False) & has_origin,
        has_origin,  # path-relative
    ]
    choices = [
        src_nofrag,
        h,
        scheme + ":" + h,
        origin + h,
        origin + spath + h,
        origin + sdir + h,
    ]
    res = pd.Series(
        np.select(conds, choices, default=""),
        index=h.index,
        dtype="string",
    )
    # scheme is case-insensitive (RFC 3986 §3.1): lowercase it so the
    # downstream ^https?:// filter and domain extraction see one form
    rscheme = res.str.extract(
        r"^([a-zA-Z][a-zA-Z0-9+.-]*:)", expand=False
    )
    has_s = rscheme.notna()
    rest = res.str.replace(_SCHEME_RE, "", n=1, regex=True)
    res = res.mask(has_s, rscheme.str.lower().str.cat(rest, na_rep=""))
    return _collapse_dots(res)


def host_link_graph(
    edges: "ray.data.Dataset",
    src_col: str = "src_url",
    href_col: str = "href",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """(src_url, href) rows → registered-domain edge list: Dataset
    (src_domain, dst_domain, n_links:int64). Only http(s)-resolved
    targets count; self-loops (intra-domain links) are kept — callers
    filter if they want the inter-domain graph."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        res = resolve_href_batch(df[src_col], df[href_col])
        ok = res.astype("string").str.match(r"^https?://").fillna(False)
        g = pd.DataFrame(
            {
                "src_domain": registered_domain_batch(df[src_col][ok]),
                "dst_domain": registered_domain_batch(res[ok]),
            }
        ).dropna()
        if g.empty:
            return pd.DataFrame(
                {"src_domain": pd.Series([], dtype=object),
                 "dst_domain": pd.Series([], dtype=object),
                 "n_links": pd.Series([], dtype=np.int64),
                 "_bucket": pd.Series([], dtype="int32")})
        g = (
            g.groupby(["src_domain", "dst_domain"], as_index=False)
            .size()
            .rename(columns={"size": "n_links"})
        )
        g["n_links"] = g["n_links"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, "src_domain", num_buckets))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(
            ["src_domain", "dst_domain"], as_index=False
        )["n_links"].sum()
        out["n_links"] = out["n_links"].astype(np.int64)
        return out

    return (
        edges.map_batches(combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


_TOKEN_RE = r"[a-z0-9]+"


def anchor_term_topk(
    edges: "ray.data.Dataset",
    k: int = 3,
    src_col: str = "src_url",
    href_col: str = "href",
    text_col: str = "anchor_text",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Aggregated anchor text per TARGET domain — the classic web-search
    signal (what the rest of the web calls a site): (src_url, href,
    anchor_text) rows → Dataset (dst_domain, term, n:int64), the k most
    frequent anchor terms per destination registered domain (ties by
    term ascending — deterministic, SQL-replayable as ROW_NUMBER()).

    Tokenization is the deterministic lowercase ``[a-z0-9]+`` scan (the
    same RE2-class contract as the resolution chain, so a DuckDB oracle
    replays it with regexp_extract_all). Scale shape: resolve + domain
    map + tokenize + per-batch (domain, term) count combiner are all
    map-side; ONE (domain, term)-bucket shuffle finalizes counts (each
    pair lives wholly in its bucket, so sums are globally exact); the
    top-k is ``stats.group_topk`` over the finalized one-row-per-pair
    counts (≤ k rows per domain per block move in its shuffle)."""
    from .stats import group_topk

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        res = resolve_href_batch(df[src_col], df[href_col])
        ok = res.astype("string").str.match(r"^https?://").fillna(False)
        dom = registered_domain_batch(res[ok])
        toks = (
            df.loc[ok.to_numpy(), text_col]
            .astype("string").fillna("")
            .str.lower()
            .str.findall(_TOKEN_RE)
        )
        g = pd.DataFrame({"dst_domain": dom.to_numpy(),
                          "term": toks.to_numpy()}).dropna(
                              subset=["dst_domain"])
        g = g.explode("term").dropna(subset=["term"])
        if g.empty:
            return pd.DataFrame(
                {"dst_domain": pd.Series([], dtype=object),
                 "term": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "_bucket": pd.Series([], dtype="int32")})
        g = (g.groupby(["dst_domain", "term"], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype(np.int64)
        return g.assign(
            _bucket=pair_bucket_tag(g, ["dst_domain", "term"],
                                    num_buckets))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["dst_domain", "term"], as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = (
        edges.map_batches(combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )
    return group_topk(counts, key="dst_domain", score_col="n", k=k,
                      id_col="term", num_buckets=num_buckets)


def page_link_edges(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """pages(url, html) → flat (src_url, href, anchor_text) rows using
    the forge extractor's anchor walk (extract/html_text.py) — one
    map-side pass, non-HTML/undecodable payloads contribute no rows."""
    from ..extract.html_text import extract_text_and_anchors

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        srcs, hrefs, texts = [], [], []
        for url, payload in zip(df["url"], df["html"]):
            if payload is None:
                continue
            try:
                _, anchors = extract_text_and_anchors(payload)
            except Exception:  # noqa: BLE001 — poison-row tolerance,
                continue  # same contract as the forge extractor
            for href, anchor_text in anchors:
                srcs.append(url)
                hrefs.append(href)
                texts.append(anchor_text)
        return pd.DataFrame(
            {"src_url": pd.Series(srcs, dtype=object),
             "href": pd.Series(hrefs, dtype=object),
             "anchor_text": pd.Series(texts, dtype=object)})

    return pages.map_batches(expand, batch_format="pandas")
