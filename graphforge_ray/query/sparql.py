"""SPARQL-subset front end: query-text normalization + SELECT compiler.

``prepare_query`` replicates the reference's regex rewrite block
(``prepareQuery`` /root/reference/docs/test HTML/documentQueryTest.html:637-661,
inline twin in ``executeQuery`` document.js:930-946) rule for rule:

1. ``\\ba\\s+`` → ``rdf:type `` when followed by a CURIE or ``<IRI>``;
2. ``PREFIX name: <iri>`` statements extracted from the body;
3. bare ``http://…`` tokens wrapped in ``<>``;
4. the global prefix map is prepended, then the original PREFIX statements
   re-attached (so user PREFIXes shadow globals — last declaration wins,
   as in SPARQL).

(The queryManager.js:99 variant that also brackets CURIEs is deliberately
NOT replicated — SURVEY §2.2 P10 marks it variant-only.)

``compile_select`` parses the SELECT subset the reference's harnesses
exercise (SPARQL.html:241-283 + the app default query app.js:100-104) and
executes it against a triples Dataset via query.ops:

    SELECT ?v … | (COUNT(?v) AS ?alias)
    WHERE { pattern . pattern . OPTIONAL { pattern } }  with property-path
    alternation/star ``(p1|p2)*`` on the predicate position
    GROUP BY ?v / LIMIT n

Always driver-side compile → distributed Dataset execution.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

import ray.data

from .ops import bgp, count_by, limit as limit_op, match_pattern, optional_join
from .ops import property_path_closure

__all__ = ["prepare_query", "compile_select", "run_select", "SelectQuery"]

RDF_TYPE_CURIE = "rdf:type"

_A_RULE = re.compile(r"\ba\s+(?=\w+:[\w-]+|<[^>]+>)")
_PREFIX_RULE = re.compile(r"^PREFIX\s+\w+:\s*<[^>]+>\s*", re.M)
_IRI_WRAP = re.compile(r"(\bhttp://[^\s<>]+)(?=\s|$)")


def prepare_query(query: str, prefixes: dict[str, str] | None = None) -> str:
    """Reference-faithful query text normalization (P9)."""
    prefixes = prefixes or {}
    query = _A_RULE.sub("rdf:type ", query)
    prefix_statements = _PREFIX_RULE.findall(query)
    query = _PREFIX_RULE.sub("", query)
    query = _IRI_WRAP.sub(r"<\1>", query)
    prefix_string = "\n".join(
        f"PREFIX {p}: <{u}>" for p, u in prefixes.items()
    )
    query = f"{prefix_string}\n{query}"
    if prefix_statements:
        query = "\n".join(s.strip() for s in prefix_statements) + "\n" + query
    return query


@dataclass
class SelectQuery:
    variables: list[str]
    count_alias: str | None
    count_var: str | None
    patterns: list[tuple]          # (s, p, o) terms; p may be PathExpr
    optionals: list[list[tuple]]
    group_by: str | None
    limit: int | None
    prefixes: dict[str, str] = field(default_factory=dict)


@dataclass
class PathExpr:
    preds: list[str]
    star: bool


_PREFIX_DECL = re.compile(r"PREFIX\s+(\w+):\s*<([^>]+)>")
_SELECT = re.compile(
    r"SELECT\s+(?P<proj>.+?)\s+WHERE\s*\{(?P<body>.*)\}"
    r"(?P<tail>[^}]*)$",
    re.S | re.I,
)
_COUNT = re.compile(r"\(\s*COUNT\s*\(\s*(\?\w+)\s*\)\s+AS\s+(\?\w+)\s*\)", re.I)
_GROUP_BY = re.compile(r"GROUP\s+BY\s+(\?\w+)", re.I)
_LIMIT = re.compile(r"LIMIT\s+(\d+)", re.I)
_OPTIONAL = re.compile(r"OPTIONAL\s*\{([^}]*)\}", re.S | re.I)
_PATH = re.compile(r"^\(([^)]+)\)(\*?)$")


def _term(tok: str, prefixes: dict[str, str]):
    if tok.startswith("?"):
        return tok
    if tok.startswith("<") and tok.endswith(">"):
        return tok[1:-1]
    if tok.startswith('"'):
        return tok.strip('"')
    m = _PATH.match(tok)
    if m:
        preds = [_term(p.strip(), prefixes) for p in m.group(1).split("|")]
        return PathExpr(preds=preds, star=bool(m.group(2)))
    if ":" in tok:
        pfx, local = tok.split(":", 1)
        if pfx in prefixes:
            return prefixes[pfx] + local
        return tok  # unexpanded CURIE kept verbatim (reference stores
        # CURIE-named predicates as written, e.g. 'rdf:type')
    return tok


def _parse_patterns(body: str, prefixes: dict[str, str]) -> list[tuple]:
    patterns = []
    for stmt in re.split(r"\s*\.\s*", body.strip()):
        stmt = stmt.strip()
        if not stmt:
            continue
        toks = stmt.split()
        if len(toks) != 3:
            raise ValueError(f"unsupported pattern: {stmt!r}")
        patterns.append(tuple(_term(t, prefixes) for t in toks))
    return patterns


def compile_select(
    query: str, prefixes: dict[str, str] | None = None
) -> SelectQuery:
    query = prepare_query(query, prefixes)
    decl = dict(_PREFIX_DECL.findall(query))
    body_match = _SELECT.search(query)
    if not body_match:
        raise ValueError("only SELECT … WHERE { … } queries are supported")
    proj = body_match.group("proj").strip()
    body = body_match.group("body")
    tail = body_match.group("tail") or ""

    count_match = _COUNT.search(proj)
    count_var = count_alias = None
    if count_match:
        count_var = count_match.group(1)[1:]
        count_alias = count_match.group(2)[1:]
        proj = _COUNT.sub("", proj)
    variables = [v[1:] for v in re.findall(r"\?(?:\w+)", proj)]

    optionals = [
        _parse_patterns(m.group(1), decl) for m in _OPTIONAL.finditer(body)
    ]
    body = _OPTIONAL.sub("", body)
    patterns = _parse_patterns(body, decl)

    gb = _GROUP_BY.search(tail) or _GROUP_BY.search(query)
    lim = _LIMIT.search(tail) or _LIMIT.search(query)
    return SelectQuery(
        variables=variables,
        count_alias=count_alias,
        count_var=count_var,
        patterns=patterns,
        optionals=optionals,
        group_by=gb.group(1)[1:] if gb else None,
        limit=int(lim.group(1)) if lim else None,
        prefixes=decl,
    )


def run_select(
    triples: "ray.data.Dataset",
    query: str,
    prefixes: dict[str, str] | None = None,
) -> pd.DataFrame:
    """Compile + execute a SELECT query → pandas bindings table (the
    reference renders bindings row by row; results are presentation-sized
    per its LIMIT convention)."""
    q = compile_select(query, prefixes)

    # property-path pattern → closure pairs joined as bindings
    path_idx = [
        i for i, p in enumerate(q.patterns) if isinstance(p[1], PathExpr)
    ]
    bindings: "ray.data.Dataset | None" = None
    if path_idx:
        if len(q.patterns) > 1:
            raise ValueError("property path must be the only pattern")
        s_t, path, o_t = q.patterns[0]
        closure = property_path_closure(
            triples, path.preds, include_reflexive=path.star
        )
        df = closure.rename(
            columns={"s": s_t[1:] if str(s_t).startswith("?") else "s",
                     "o": o_t[1:] if str(o_t).startswith("?") else "o"}
        )
        out = df
    else:
        if len(q.patterns) == 1:
            bindings = match_pattern(triples, *q.patterns[0])
        else:
            bindings = bgp(triples, q.patterns)
        for opt in q.optionals:
            opt_b = match_pattern(triples, *opt[0]) if len(opt) == 1 else bgp(
                triples, opt
            )
            shared = sorted(
                set(c for c in bindings.schema().names)
                & set(opt_b.schema().names)
            )
            bindings = optional_join(bindings, opt_b, on=shared)
        if q.count_alias:
            group = q.group_by or (q.variables[0] if q.variables else None)
            if group is None:
                out = pd.DataFrame({q.count_alias: [bindings.count()]})
            else:
                out = count_by(bindings, group, alias=q.count_alias).to_pandas()
        else:
            if q.limit is not None:
                bindings = limit_op(bindings, q.limit)
            out = bindings.to_pandas()
            if q.variables:
                out = out[[v for v in q.variables if v in out.columns]]
            return out.reset_index(drop=True)

    if q.limit is not None:
        out = out.head(q.limit)
    return out.reset_index(drop=True)
