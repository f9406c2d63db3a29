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

__all__ = [
    "canonical_url_batch", "url_dedup",
    "registered_domain_batch", "domain_stats",
    "robots_filter", "resolve_redirects",
]

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


# Fixed two-level public-suffix APPROXIMATION (the full PSL is ~10k
# entries and changes monthly — at production scale, ship the real list
# as a broadcast set; the regex form here keeps the rule SQL-replayable
# and covers the common ccTLD second-level registries).
_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
    "org.au", "co.jp", "co.in", "co.kr", "com.br", "com.cn", "com.mx",
)
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_DOMAIN_RE = (
    r"([^.]+\.(?:"
    + "|".join(s.replace(".", r"\.") for s in _TWO_LEVEL_SUFFIXES)
    + r")|[^.]+\.[^.]+)$"
)


def registered_domain_batch(urls: pd.Series) -> pd.Series:
    """Vectorized registered-domain extraction: host from the authority
    (userinfo/port stripped, lowercased, trailing-dot trimmed), then the
    last two labels — three when the host ends in a two-level-registry
    suffix from the fixed approximation list. Single-label hosts
    (``localhost``) fall back to the host itself; non-URLs → NaN.

    Both regexes are RE2-compatible and alternation-order-safe (the
    two branches can never match at the same start position), so a
    DuckDB oracle replays the rule verbatim."""
    host = (
        urls.astype("string")
        .str.extract(_HOST_RE, expand=False)
        .str.lower()
        .str.rstrip(".")
    )
    dom = host.str.extract(_DOMAIN_RE, expand=False)
    return dom.where(dom.notna(), host).astype(object)


def domain_stats(
    docs: "ray.data.Dataset",
    url_col: str = "url",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-registered-domain corpus statistics — the crawl-governance
    pass (per-domain quotas, blocklists, head-domain analysis) run
    before content curation. → Dataset (domain, n_docs:int64,
    n_hosts:int64, min_doc) — exact, including the distinct-host count.

    Shape: map-side (domain, host) combiner (docs collapse to ≤1 row
    per pair per batch — head domains like popular hosts stay skew-free
    on the reduce side), ONE domain-bucket shuffle, vectorized groupby
    per bucket. Rows with no parseable host are dropped and counted in
    metrics ``domain_stats.unparsed``."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dom = registered_domain_batch(df[url_col])
        host = (
            df[url_col].astype("string")
            .str.extract(_HOST_RE, expand=False)
            .str.lower()
            .str.rstrip(".")
            .astype(object)
        )
        g = pd.DataFrame(
            {"domain": dom, "host": host, id_col: df[id_col]}
        )
        bad = int(g["domain"].isna().sum())
        if bad:
            from .. import metrics

            metrics.incr("domain_stats.unparsed", bad)
        g = g.dropna(subset=["domain"])
        out = g.groupby(["domain", "host"], as_index=False).agg(
            n_docs=(id_col, "size"), min_doc=(id_col, "min")
        )
        out["_bucket"] = bucket_tag(out, "domain", num_buckets)
        return out

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # re-combine per (domain, host) first (pairs split across
        # upstream batches), then roll up to the domain
        ph = g.groupby(["domain", "host"], as_index=False).agg(
            n_docs=("n_docs", "sum"), min_doc=("min_doc", "min")
        )
        out = ph.groupby("domain", as_index=False).agg(
            n_docs=("n_docs", "sum"),
            n_hosts=("host", "nunique"),
            min_doc=("min_doc", "min"),
        )
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["n_hosts"] = out["n_hosts"].astype(np.int64)
        return out

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def robots_filter(
    ds: "ray.data.Dataset",
    rules: pd.DataFrame,
    url_col: str = "url",
    max_rules: int = 100_000,
) -> "ray.data.Dataset":
    """Crawl-governance gate: apply robots.txt-style Allow/Disallow
    rules (RFC 9309 longest-match precedence; Allow wins exact-length
    ties; no rule → allowed; plain path PREFIXES, no wildcards —
    documented subset so the decision is SQL-replayable) → adds
    ``allowed`` (0/1 int64) and ``rule_len`` (matched prefix length,
    −1 when no rule applied).

    ``rules``: DataFrame (host, prefix, allow 0/1) — governance config
    is bounded by construction (loud ``max_rules`` cap); it ships in
    the task closure and each rule applies as ONE vectorized
    host-equality + startswith pass over the batch, so the scan is
    pure map-side (no shuffle)."""
    need = {"host", "prefix", "allow"}
    if not need.issubset(rules.columns):
        raise ValueError(f"rules needs columns {sorted(need)}")
    if len(rules) > max_rules:
        raise ValueError(
            f"rules table too large: {len(rules)} > {max_rules}")
    rl = [(str(h).lower(), str(p), int(a))
          for h, p, a in zip(rules["host"], rules["prefix"],
                             rules["allow"])]

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        u = df[url_col].fillna("").astype(str)
        auth = u.str.extract(r"^[a-zA-Z]+://([^/?#]*)", expand=False)
        host = (
            auth.fillna("").str.split("@").str[-1]
            .str.split(":").str[0].str.lower()
        )
        path = u.str.replace(r"^[a-zA-Z]+://[^/?#]*", "",
                             regex=True).str.extract(
            r"^([^?#]*)", expand=False).fillna("")
        path = path.where(path != "", "/")
        # best = 2*len(prefix) + allow → longest match wins, Allow
        # wins ties; decision = best parity
        best = np.full(len(df), -1, np.int64)
        hv = host.to_numpy(dtype=object)
        pv = path.to_numpy(dtype=object)
        for rh, rp, ra in rl:
            m = (hv == rh) & pd.Series(pv).str.startswith(rp) \
                .to_numpy()
            if m.any():
                score = 2 * len(rp) + ra
                best[m] = np.maximum(best[m], score)
        out = df.copy()
        out["allowed"] = np.where(best < 0, 1, best % 2).astype(
            np.int64)
        out["rule_len"] = np.where(best < 0, -1, best // 2).astype(
            np.int64)
        return out

    return ds.map_batches(scan, batch_format="pandas")


def resolve_redirects(
    redirects: "ray.data.Dataset",
    urls: "ray.data.Dataset | None" = None,
    max_rounds: int = 20,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Resolve redirect CHAINS to their terminal target (crawl
    governance: the frontier and the URL-dedup pass both need the final
    fetch target, not the hop). ``redirects`` is an (s, t) Dataset —
    conflicting targets for one source collapse deterministically to
    the MINIMUM t; self-redirects are dropped. Returns, for the given
    ``urls`` Dataset (column ``url``) — or for every redirect source
    when ``urls`` is None — (url, final_url, hops:int64) where hops
    counts followed edges (0 for a URL that is no redirect source).

    Pointer jumping: each round rewrites the map M(s) → (t, hops) as
    M'(s) = (M(t).t, hops + M(t).hops) where t is itself a source —
    chain lengths DOUBLE per round, so L-deep chains settle in ⌈log₂L⌉
    rounds of ONE tag-union-bucket shuffle each (same discipline as
    dedup's min-label components). Rounds materialize + repartition so
    sort-shuffle block counts don't explode (CLAUDE.md). A map still
    live after ``max_rounds`` (chains deeper than 2^max_rounds — i.e. a
    redirect CYCLE) fails loudly rather than truncating silently."""
    from ray.data.aggregate import Sum

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"s": df["s"].astype(object),
                          "t": df["t"].astype(object)})
        g = g.loc[g["s"] != g["t"]]
        g = g.sort_values(["s", "t"]).groupby("s", as_index=False).head(1)
        g["hops"] = np.int64(1)
        return g.assign(_bucket=bucket_tag(g, "s", num_buckets))

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values(["s", "t"])
               .groupby("s", as_index=False).head(1))
        return out[["s", "t", "hops"]]

    m = (
        redirects.map_batches(canon, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(dedup_bucket, batch_format="pandas")
        .materialize()
    )
    # no (non-self) redirects at all → schema-less Dataset breaks the
    # union below (CLAUDE.md empty-Dataset guard): everything terminal
    if m.schema(fetch_if_missing=True) is None:
        if urls is None:
            return m
        return urls.map_batches(
            lambda df: pd.DataFrame(
                {"url": df["url"].astype(object),
                 "final_url": df["url"].astype(object),
                 "hops": np.zeros(len(df), dtype=np.int64)}),
            batch_format="pandas",
        )

    def tag_probe(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "k": df["t"].astype(object), "s": df["s"].astype(object),
            "t": df["t"].astype(object),
            "hops": df["hops"].astype(np.int64),
            "_side": np.int8(0)})
        return out.assign(_bucket=bucket_tag(out, "k", num_buckets))

    def tag_map(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "k": df["s"].astype(object), "s": df["s"].astype(object),
            "t": df["t"].astype(object),
            "hops": df["hops"].astype(np.int64),
            "_side": np.int8(1)})
        return out.assign(_bucket=bucket_tag(out, "k", num_buckets))

    def jump_bucket(g: pd.DataFrame) -> pd.DataFrame:
        probe = g.loc[g["_side"] == 0, ["k", "s", "t", "hops"]]
        hit = g.loc[g["_side"] == 1, ["k", "t", "hops"]].rename(
            columns={"t": "t2", "hops": "h2"})
        out = probe.merge(hit, on="k", how="left")
        live = out["t2"].notna()
        out["t"] = out["t2"].where(live, out["t"])
        out["hops"] = (out["hops"]
                       + out["h2"].fillna(0).astype(np.int64))
        out["_live"] = live.astype(np.int64)
        return out[["s", "t", "hops", "_live"]]

    for _ in range(max_rounds):
        jumped = (
            m.map_batches(tag_probe, batch_format="pandas")
            .union(m.map_batches(tag_map, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(jump_bucket, batch_format="pandas")
            .repartition(num_buckets)
            .materialize()
        )
        agg = jumped.aggregate(Sum(on="_live", alias_name="live"))
        live = int(agg["live"] or 0) if agg else 0
        m = jumped.map_batches(
            lambda df: df[["s", "t", "hops"]], batch_format="pandas"
        ).materialize()
        if live == 0:
            break
    else:
        raise ValueError(
            f"redirect map still live after {max_rounds} pointer-jump "
            "rounds — redirect cycle or chain deeper than "
            f"2^{max_rounds}"
        )

    if urls is None:
        return m.map_batches(
            lambda df: pd.DataFrame(
                {"url": df["s"], "final_url": df["t"],
                 "hops": df["hops"].astype(np.int64)}),
            batch_format="pandas",
        )

    def tag_url(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "k": df["url"].astype(object), "s": df["url"].astype(object),
            "t": pd.Series([""] * len(df), dtype=object, index=df.index),
            "hops": np.zeros(len(df), dtype=np.int64),
            "_side": np.int8(0)})
        return out.assign(_bucket=bucket_tag(out, "k", num_buckets))

    def final_bucket(g: pd.DataFrame) -> pd.DataFrame:
        probe = g.loc[g["_side"] == 0, ["k", "s"]]
        hit = g.loc[g["_side"] == 1, ["k", "t", "hops"]].rename(
            columns={"t": "t2", "hops": "h2"})
        out = probe.merge(hit, on="k", how="left")
        matched = out["t2"].notna()
        return pd.DataFrame({
            "url": out["s"],
            "final_url": out["t2"].where(matched, out["s"]),
            "hops": out["h2"].fillna(0).astype(np.int64)})

    return (
        urls.map_batches(tag_url, batch_format="pandas")
        .union(m.map_batches(tag_map, batch_format="pandas"))
        .groupby("_bucket")
        .map_groups(final_bucket, batch_format="pandas")
    )
