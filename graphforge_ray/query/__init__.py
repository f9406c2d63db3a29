"""SPARQL-subset query capability layer over triples Datasets."""

from .ops import (  # noqa: F401
    bgp,
    count_by,
    limit,
    match_pattern,
    optional_join,
    property_path_closure,
    top_k,
    transitive_closure,
)
