"""graphforge_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch reimplementation of the query/data-processing capabilities of
the GraphForge reference (read-only snapshot at /root/reference), re-expressed
as idiomatic Ray Data pipelines: ``ray.data.Dataset`` of Arrow blocks,
``map_batches`` over zero-copy pyarrow batches, actor pools for stateful
stages, groupby/sort/repartition for the wide steps.

Layout:
    schemas       Arrow schemas for the pages table and the triples table
    fixtures      deterministic synthetic pages-table generator (seeded)
    oracle        single-threaded reference-faithful extractor (P/R oracle)
    extract/      rdfxml, turtle, ntriples, html_text, jsonmap parsers
    stages/       map_batches stage functions / actor classes
    sinks/        N-Triples + adjacency-parquet sinks with lineage manifests
    pipelines/    end-to-end forge pipeline
    query/        SPARQL-subset capability layer (BGP, OPTIONAL, paths, agg)
    state/        checkpoint / resume manifests

None of these modules call ``ray.init()``; sessions are owned by the
caller (bench.py, tests/conftest.py, tools/check_contract.py, the
jobs/ entrypoints, or the driver).
"""

__version__ = "0.1.0"


def tune_data_context() -> None:
    """Engine-level Ray Data knobs (idempotent; call after ray.init or let
    the pipelines call it lazily):

    * push-based sort shuffle — measured 3× faster than the default
      pull-based sort for the bucket-dedup shuffles on this workload;
    * progress bars off (bench/driver runs are log-scraped).
    """
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    ctx.enable_progress_bars = False


def default_concurrency(fused: bool = True) -> int:
    """Fixed actor-pool size from the CLUSTER, not a literal (fixed
    start-up in parallel beats autoscaling's serial ramp, measured 2×;
    a hard-coded (1, 4) caps any cluster at 4-way parallelism).

    ``fused=True`` (a shuffle runs in the SAME execution): pool =
    cpus // 2 so the concurrent shuffle map/reduce tasks keep the other
    half busy (a cpus−2 pool starves the sort — measured 1.6× slower).
    ``fused=False`` (standalone stage): cpus − 2, leaving CPUs for the
    read/write operators (a pool of ALL CPUs deadlocks the streaming
    executor on small clusters)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, cpus // 2 if fused else cpus - 2)
