"""URL canonicalization + dedup: spec cases, DuckDB-chain parity, and
the distributed dedup kernel."""

import duckdb
import pandas as pd
import ray.data as rd

from graphforge_ray.stages.urls import canonical_url_batch, url_dedup

CASES = {
    "HTTP://Example-3.COM:80/Path/17/?utm_source=feed&x=9#Sec":
        "http://example-3.com/Path/17/?x=9",
    "https://EX.com:443/a?utm_a=1&utm_b=2": "https://ex.com/a",
    "http://h.com/a/?x=1&utm_c=3": "http://h.com/a/?x=1",
    "http://h.com/": "http://h.com",
    "http://h.com/a//": "http://h.com/a",
    "https://H.com/A?utm_x=1": "https://h.com/A",
    "HTTPS://A.com:443": "https://a.com",
    "http://h.com:8080/x": "http://h.com:8080/x",  # non-default port kept
    "not-a-url": "not-a-url",                      # junk passes through
    "http://h.com/?utm_a=1": "http://h.com",
    "http://h.com/p?a=1&utm_b=2&c=3#f": "http://h.com/p?a=1&c=3",
}

# the same chain as stages/urls.canonical_url_batch, expressed as the
# nested-DuckDB-regex oracle (mirrors SQL_DOCS_URL_DEDUP)
_SQL_CHAIN = r"""
SELECT regexp_replace(u4, '/+$', '') AS out FROM (
  SELECT regexp_replace(regexp_replace(u3,
           '^(http://[^/:]+):80(/|$)', '\1\2'),
           '^(https://[^/:]+):443(/|$)', '\1\2') AS u4 FROM (
    SELECT regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(u2,
               '([?&])(utm_[a-zA-Z0-9_]+|fbclid|gclid|msclkid)=[^&]*',
               '\1', 'g'),
             '\?&', '?'), '&&+', '&', 'g'), '[?&]+$', '') AS u3 FROM (
      SELECT CASE WHEN regexp_extract(u1, '^[a-zA-Z]+://[^/?#]*') <> ''
             THEN lower(regexp_extract(u1, '^[a-zA-Z]+://[^/?#]*')) ||
                  substr(u1, length(
                      regexp_extract(u1, '^[a-zA-Z]+://[^/?#]*')) + 1)
             ELSE u1 END AS u2 FROM (
        SELECT regexp_replace(u0, '#.*$', '') AS u1
        FROM (SELECT unnest(?) AS u0)
      )
    )
  )
)
"""


def test_canonical_url_spec_cases():
    got = canonical_url_batch(pd.Series(list(CASES)))
    assert list(got) == list(CASES.values())


def test_canonical_url_duckdb_parity():
    # the SQL oracle chain and the pandas kernel must agree on every
    # case INCLUDING junk — this is the contract the driver gate uses
    urls = list(CASES) + [
        "", "ftp://X.com/A#b", "http://a.com?utm_source=x",
        "https://b.com:443?q=1", "http://c.com:80",
        "http://d.com/p/?utm_a=1&utm_b=2&utm_c=3",
    ]
    con = duckdb.connect()
    sql = [r[0] for r in con.execute(_SQL_CHAIN, [urls]).fetchall()]
    py = list(canonical_url_batch(pd.Series(urls)))
    assert sql == py


def test_canonical_url_null_safe():
    got = canonical_url_batch(pd.Series(["http://A.com/", None]))
    assert got.iloc[0] == "http://a.com"
    assert pd.isna(got.iloc[1])


def test_url_dedup_groups_and_survivor():
    rows = pd.DataFrame(
        {
            "doc_id": [5, 3, 9, 1, 7],
            "url": [
                "http://A.com/x?utm_a=1",
                "HTTP://a.com:80/x#frag",
                "http://a.com/x",
                "http://b.com/y/",
                "http://b.com/y",
            ],
        }
    )
    got = (
        url_dedup(rd.from_pandas(rows).repartition(3))
        .to_pandas()
        .sort_values("canon_url")
        .reset_index(drop=True)
    )
    assert list(got["canon_url"]) == ["http://a.com/x", "http://b.com/y"]
    assert list(got["n_dups"]) == [3, 2]
    assert list(got["keep_id"]) == [3, 1]


def test_normalize_text_duckdb_parity():
    # the whitespace class is pinned EXPLICITLY (Python \s is
    # unicode-wide, RE2's is ASCII-only) — both chains must agree on
    # every case incl. NBSP, unicode spaces, controls and ligatures
    from graphforge_ray.stages.text_analysis import normalize_text_batch

    cases = [
        "café  double  space",
        "\tTab\x01ctrl\x1fchars\n\nend ",
        "ｆｕｌwidth",
        "a nbsp", "", "already clean",
        "ﬁligature",
        "em space", "zero​width",  # ZWSP is NOT whitespace
        "ideographic　space", "line sep",
    ]
    got = list(
        normalize_text_batch(pd.DataFrame({"text": cases}))["norm_text"]
    )
    sql = r"""
    SELECT trim(regexp_replace(regexp_replace(nfc_normalize(u),
        '[\x00-\x1F\x7F]', ' ', 'g'),
        '[ \t\n\r\f\v\x{00A0}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+',
        ' ', 'g')) AS out
    FROM (SELECT unnest(?) AS u)
    """
    exp = [r[0] for r in duckdb.connect().execute(sql, [cases]).fetchall()]
    assert got == exp
    assert got[3] == "a nbsp" and got[8] == "zero​width"


def test_normalize_text_null_safe():
    from graphforge_ray.stages.text_analysis import normalize_text_batch

    out = normalize_text_batch(
        pd.DataFrame({"text": ["  a  b ", None]})
    )["norm_text"]
    assert out.iloc[0] == "a b" and pd.isna(out.iloc[1])


def test_registered_domain_extraction():
    from graphforge_ray.stages.urls import registered_domain_batch

    u = pd.Series([
        "http://www.Example.COM/path",        # www is just a label
        "https://a.b.co.uk:443/x",            # two-level registry suffix
        "http://user@sub.site.com.au/p?q=1",  # userinfo + suffix list
        "http://localhost/x",                 # single label → itself
        "not a url",                          # junk → NA
        "http://host.de./y",                  # trailing dot trimmed
    ])
    got = registered_domain_batch(u)
    assert got.tolist()[:4] == [
        "example.com", "b.co.uk", "site.com.au", "localhost"
    ]
    assert pd.isna(got.iloc[4])
    assert got.iloc[5] == "host.de"


def test_domain_stats_exact_counts(ray_session):
    import ray.data as rd

    from graphforge_ray import metrics
    from graphforge_ray.stages.urls import domain_stats

    rows = [
        (0, "http://a.example.com/1"),
        (1, "http://b.example.com/2"),
        (2, "http://a.example.com/3"),   # same host again
        (3, "https://shop.co.uk/x"),
        (4, "junk"),                     # unparsed → counted, dropped
    ]
    ds = rd.from_pandas(
        pd.DataFrame(rows, columns=["doc_id", "url"])
    ).repartition(3)
    before = metrics.snapshot()
    got = (
        domain_stats(ds)
        .to_pandas()
        .sort_values("domain")
        .reset_index(drop=True)
    )
    after = metrics.snapshot()
    assert list(map(tuple, got.to_numpy())) == [
        ("example.com", 3, 2, 0),
        ("shop.co.uk", 1, 1, 3),
    ]
    assert metrics.delta(before, after).get("domain_stats.unparsed") == 1


def test_robots_filter_longest_match(ray_session):
    import pytest
    import ray.data as rd

    from graphforge_ray.stages.urls import robots_filter

    rules = pd.DataFrame({
        "host": ["ex.com", "ex.com", "ex.com", "Blk.com", "tie.com",
                 "tie.com"],
        "prefix": ["/private", "/private/pub", "/tmp", "/", "/a",
                   "/a"],
        "allow": [0, 1, 0, 0, 0, 1],
    })
    urls = pd.DataFrame({
        "doc_id": range(8),
        "url": [
            "http://ex.com/private/x",        # disallow /private
            "http://ex.com/private/pub/ok",   # allow (longer)
            "http://ex.com/other",            # no rule → allowed
            "https://user@BLK.com:8443/a",    # host case + userinfo
            "http://tie.com/a/b",             # exact tie → allow wins
            "http://ex.com",                  # empty path → '/'
            None,
            "not a url at all",
        ],
    })
    got = robots_filter(
        rd.from_pandas(urls).repartition(2), rules
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    assert got["allowed"].tolist() == [0, 1, 1, 0, 1, 1, 1, 1]
    assert got["rule_len"].tolist() == [8, 12, -1, 1, 2, -1, -1, -1]
    with pytest.raises(ValueError, match="columns"):
        robots_filter(rd.from_pandas(urls), pd.DataFrame({"x": []}))
    with pytest.raises(ValueError, match="too large"):
        robots_filter(rd.from_pandas(urls), rules, max_rules=2)


def test_resolve_redirects_chains_and_terminals(ray_session):
    import numpy as np

    from graphforge_ray.stages.urls import resolve_redirects

    # chain a→b→c→d (depth 3, needs 2 doubling rounds), plus e→d
    m = pd.DataFrame({"s": ["a", "b", "c", "e"],
                      "t": ["b", "c", "d", "d"]})
    u = pd.DataFrame({"url": ["a", "b", "d", "e", "z"]})
    out = (
        resolve_redirects(rd.from_pandas(m).repartition(2),
                          rd.from_pandas(u).repartition(2))
        .to_pandas().set_index("url")
    )
    assert out.loc["a", "final_url"] == "d" and out.loc["a", "hops"] == 3
    assert out.loc["b", "final_url"] == "d" and out.loc["b", "hops"] == 2
    assert out.loc["e", "final_url"] == "d" and out.loc["e", "hops"] == 1
    # non-sources are their own terminal at 0 hops
    assert out.loc["d", "final_url"] == "d" and out.loc["d", "hops"] == 0
    assert out.loc["z", "final_url"] == "z" and out.loc["z", "hops"] == 0
    assert out["hops"].dtype == np.int64


def test_resolve_redirects_map_only_and_conflicts(ray_session):
    from graphforge_ray.stages.urls import resolve_redirects

    # conflicting targets for one source collapse to MIN t; self-loop
    # rows are dropped entirely
    m = pd.DataFrame({"s": ["a", "a", "x"], "t": ["c", "b", "x"]})
    out = resolve_redirects(rd.from_pandas(m)).to_pandas()
    got = dict(zip(out["url"], out["final_url"]))
    assert got == {"a": "b"}


def test_resolve_redirects_cycle_raises(ray_session):
    import pytest as _pytest

    from graphforge_ray.stages.urls import resolve_redirects

    m = pd.DataFrame({"s": ["a", "b", "p"], "t": ["b", "a", "q"]})
    with _pytest.raises(ValueError, match="cycle"):
        resolve_redirects(rd.from_pandas(m), max_rounds=4)


def test_resolve_redirects_empty_map(ray_session):
    from graphforge_ray.stages.urls import resolve_redirects

    m = pd.DataFrame({"s": ["x"], "t": ["x"]})  # only a self-loop
    u = pd.DataFrame({"url": ["x", "y"]})
    out = (
        resolve_redirects(rd.from_pandas(m), rd.from_pandas(u))
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert list(out["final_url"]) == ["x", "y"]
    assert list(out["hops"]) == [0, 0]
