"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in graphforge_ray) calls ``ray.init()`` / ``ray.shutdown()``.

* ``entry()``      — flagship forge pipeline (pages → canonical triples)
                     plus the RML mapping over sf0.001 documents.
* ``queries()``    — one callable per implemented operator family
                     (SURVEY.md §2 + training-data ops), each over
                     ``sf_dir`` testdata tables.
* ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
                     query (same column names; floats rounded on both
                     sides), including exact recomputation oracles for
                     minhash near-dup clustering (trigram Jaccard +
                     recursive-CTE components) and embedding near-dup
                     (probe pairs). Genuinely non-SQL ops (langid,
                     simhash, IVF approx, forged-pages runs) are
                     rows-only.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: forge the synthetic
    pages corpus into canonical triples and union the RML-mapped
    documents-table triples. Returns a ray.data.Dataset of
    (subj, pred, obj)."""
    import ray.data as rd

    from graphforge_ray.fixtures import gen_pages_table
    from graphforge_ray.pipelines.driver_queries import q_rml_documents_triples
    from graphforge_ray.pipelines.forge import forge_triples

    pages = rd.from_arrow(gen_pages_table(200))
    forged = forge_triples(pages).map_batches(
        lambda df: df[["subj", "pred", "obj"]], batch_format="pandas"
    )
    mapped = q_rml_documents_triples("/root/testdata/sf0.001")
    return forged.union(mapped)


def queries() -> dict[str, Callable[[str], Any]]:
    from graphforge_ray.pipelines.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from graphforge_ray.pipelines.driver_queries import ORACLES

    return dict(ORACLES)
