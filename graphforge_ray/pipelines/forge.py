"""The forge pipeline — pages → knowledge graph.

Ray-Data topology (one streaming-executor run per stage; SURVEY §3.1):

    read_parquet(pages, columns=[url, html])       # prune at the read
      → map_batches(extract_pages_batch)           # stateless tasks, fuses
      → map_batches(MentionLinker, concurrency=N)  # actor pool, broadcast gaz
      → dedup_triples                              # combiner + hash shuffle
      → apply_canonical_mapping                    # broadcast map-side rewrite
      → write adjacency parquet + N-Triples        # partitioned sinks

Two APIs:

* ``forge_triples(pages_ds)`` — in-memory streaming form, returns the
  canonical triples ``Dataset`` (used by tests / driver ``queries()``).
* ``run_forge_pipeline(input_paths, out_dir)`` — production form with
  checkpoint-resumable stage boundaries: each stage writes partitioned
  parquet + a lineage manifest via ``StageRunner``; a restarted run skips
  completed stages (north rule: "resumable from checkpoint with
  per-partition lineage + metrics").

Canonical-surface-form note: the mapping is BUILT from all entity IRIs
(asserted + linked, so the reference spelling wins as representative) but
APPLIED only to link-derived triples (``gf:mentions`` / ``gf:linksTo``) —
reference-extracted triples pass through byte-exact, preserving P/R parity
(SURVEY §7 hard part 1).
"""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.dataset  # noqa: F401  (ensures pq dataset machinery loaded)

import ray
import ray.data

from ..fixtures import GAZETTEER
from ..sinks.adjacency import write_adjacency
from ..sinks.ntriples_sink import write_ntriples
from ..stages.canonicalize import (
    apply_canonical_mapping,
    build_canonical_mapping,
    dedup_triples,
)
from ..stages.extract import (
    PRED_LINKS_TO,
    PRED_MENTION,
    PRED_PREFIX,
    PRED_QUARANTINE,
    PRED_TEXT,
    extract_pages_batch,
)
from ..stages.linker import MentionLinker, PRED_MENTIONS, make_stateless_linker
from ..state.manifest import StageRunner

__all__ = ["forge_triples", "run_forge_pipeline", "extract_and_link",
           "collect_prefixes"]

_LINK_PREDS = (PRED_MENTIONS, PRED_LINKS_TO)
_NON_TRIPLE_PREDS = (PRED_TEXT, PRED_QUARANTINE, PRED_MENTION, PRED_PREFIX)


from .. import default_concurrency as _default_concurrency  # shared sizing


def extract_and_link(
    pages_ds: "ray.data.Dataset",
    gazetteer: dict[str, str] | None = None,
    linker_concurrency=None,
    batch_size: int | None = None,
) -> "ray.data.Dataset":
    """pages → EXTRACT_SCHEMA rows with mentions linked (text rows kept).

    ``linker_concurrency``: None/"tasks" → stateless tasks with a
    per-worker-process cached linker (default: shares all CPUs with fused
    shuffles); "actors" or an int/(min,max) → MentionLinker actor pool
    (the right tool when the stage runs standalone or holds heavy state).

    ``batch_size=None`` on BOTH stages is deliberate: the stages fuse into
    one actor-pool operator, and an explicit batch_size there makes Ray
    COALESCE upstream blocks into batch-sized tasks — a batch_size larger
    than the block size silently caps parallelism at n_rows/batch_size
    tasks (measured: 120 blocks → 14 tasks → 14 of 30 actors busy). With
    None, one task per input block; parallelism = input block count, which
    the reader/generator controls."""
    gaz = GAZETTEER if gazetteer is None else gazetteer
    gaz_ref = ray.put(gaz)
    extracted = pages_ds.map_batches(
        extract_pages_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if linker_concurrency == "tasks":
        # stateless tasks (linker cached per worker process): fluid CPU
        # sharing, no pool; measured slower than the pool on this host but
        # kept as an option (see make_stateless_linker)
        return extracted.map_batches(
            make_stateless_linker(gaz_ref),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    if linker_concurrency is None:
        linker_concurrency = _default_concurrency(fused=True)
    elif linker_concurrency == "actors":
        linker_concurrency = _default_concurrency(fused=False)
    return extracted.map_batches(
        MentionLinker,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=linker_concurrency,
        fn_constructor_kwargs={"gazetteer_ref": gaz_ref},
    )


def collect_prefixes(extracted: "ray.data.Dataset") -> dict[str, str]:
    """Distill the corpus prefix map from the extract output's prefixDecl
    rows (reference parity: every parse's prefixes accumulate into the
    global prefix map used at query time, document.js:706-715/:940-942).

    Distributed distill: predicate filter + per-batch dedup map-side; the
    driver sees only the distinct (prefix, iri, src_url) universe, which
    is vocabulary-sized. The reference's 'last declaration wins' is
    store-insertion-order-dependent; a distributed engine needs a
    DETERMINISTIC merge, so conflicts resolve to the declaration from the
    lexicographically smallest src_url (ties: smallest iri)."""
    import pyarrow as pa

    def decls(batch: "pa.Table") -> "pa.Table":
        t = batch.filter(pc.equal(batch["pred"], pa.scalar(PRED_PREFIX)))
        return pa.Table.from_arrays(
            [t["subj"], t["obj"], t["src_url"]],
            names=["prefix", "iri", "src_url"],
        )

    pairs = (
        extracted.map_batches(decls, batch_format="pyarrow")
        .map_batches(lambda df: df.drop_duplicates(), batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if pairs.empty:
        return {}
    pairs = pairs.sort_values(["prefix", "src_url", "iri"], kind="stable")
    first = pairs.drop_duplicates("prefix", keep="first")
    return dict(zip(first["prefix"], first["iri"]))


def _real_triples(linked: "ray.data.Dataset") -> "ray.data.Dataset":
    import pyarrow as pa

    def keep(batch: "pa.Table") -> "pa.Table":
        mask = pc.invert(
            pc.is_in(batch["pred"], value_set=pa.array(_NON_TRIPLE_PREDS))
        )
        return batch.filter(mask).drop_columns(["text", "kind"])

    return linked.map_batches(keep, batch_format="pyarrow")


def forge_triples(
    pages_ds: "ray.data.Dataset",
    gazetteer: dict[str, str] | None = None,
    canonicalize: bool = True,  # kept for API compat: False skips nothing
    linker_concurrency: int | tuple[int, int] | None = None,
    num_buckets: int = 512,
    variant_merge: bool = False,
) -> "ray.data.Dataset":
    """In-memory flagship: pages Dataset → canonical triples Dataset.

    Default path is ONE fully-streamed execution: extract → link → dedup
    shuffle, with link-IRI canonicalization applied AT EMISSION
    (iri.normalize_iri inside the extract/linker stages), so the dedup
    shuffle is keyed directly on normalized surface forms — no extra
    passes, no barrier. Reference-extracted triples are never normalized
    (byte-exact P/R parity, SURVEY §7 hard part 1).

    ``variant_merge=True`` additionally merges IRIs whose DIFFERENT
    spellings normalize together across the corpus onto the minimum
    occurring spelling (build_canonical_mapping): requires pinning the
    deduped set + two map passes + a small re-dedup of the link slice —
    use when corpora mix spellings beyond what emission-normalization
    already unifies.
    """
    import graphforge_ray

    graphforge_ray.tune_data_context()
    # block-count floor: a single-block input (rd.from_arrow of one
    # table, a one-file read) can launch at most ONE extract/link task
    # regardless of pool size — split it so parallelism = block count
    # covers the cluster ("operator only received 1 input(s)" warning)
    try:
        n_blocks = pages_ds.num_blocks()
    except Exception:
        n_blocks = None  # lazy plans without known block counts: leave be
    if n_blocks is not None:
        import ray as _ray

        floor = int(_ray.cluster_resources().get("CPU", 8))
        if 0 < n_blocks < floor:
            pages_ds = pages_ds.repartition(floor)
    linked = extract_and_link(pages_ds, gazetteer, linker_concurrency)
    real = _real_triples(linked)
    deduped = dedup_triples(real, num_buckets)
    if not variant_merge:
        return deduped

    deduped = deduped.materialize()
    mapping = build_canonical_mapping(deduped, columns=["subj", "obj"])
    if not mapping:
        return deduped

    import pyarrow as pa

    def split(batch: "pa.Table", keep_links: bool) -> "pa.Table":
        mask = pc.is_in(batch["pred"], value_set=pa.array(_LINK_PREDS))
        return batch.filter(mask if keep_links else pc.invert(mask))

    untouched = deduped.map_batches(
        lambda b: split(b, False), batch_format="pyarrow"
    )

    def rewrite_links(df):
        df = df.copy()
        df["obj"] = df["obj"].map(lambda v: mapping.get(v, v))
        return df

    links = (
        deduped.map_batches(lambda b: split(b, True), batch_format="pyarrow")
        .map_batches(rewrite_links, batch_format="pandas")
    )
    return untouched.union(dedup_triples(links, max(16, num_buckets // 4)))


def run_forge_pipeline(
    input_paths: list[str] | str,
    out_dir: str,
    gazetteer: dict[str, str] | None = None,
    linker_concurrency: int | tuple[int, int] | None = None,
    num_adjacency_partitions: int = 64,
    write_nt: bool = True,
    neardup_index: bool = True,
) -> StageRunner:
    """Checkpoint-resumable production pipeline. Stage layout::

        <out_dir>/extract/        EXTRACT_SCHEMA parquet  + MANIFEST.json
        <out_dir>/linked/         linked rows parquet     + MANIFEST.json
        <out_dir>/text/           (url, text) parquet     + MANIFEST.json
        <out_dir>/neardup_index/  MinHash band index      + MANIFEST.json
        <out_dir>/canonical/      canonical triples       + MANIFEST.json
        <out_dir>/adjacency/      part=<k>/ parquet       + MANIFEST.json
        <out_dir>/ntriples/       part-*.nt               + MANIFEST.json
    """
    import graphforge_ray

    graphforge_ray.tune_data_context()
    if isinstance(input_paths, str):
        input_paths = [input_paths]
    runner = StageRunner(out_dir)
    gaz = GAZETTEER if gazetteer is None else gazetteer

    def stage_inputs(*stages: str) -> list[str]:
        out = []
        for s in stages:
            d = runner.stage_dir(s)
            out.extend(
                os.path.join(dp, f)
                for dp, _, fs in os.walk(d)
                for f in fs
                if f.endswith(".parquet")
            )
        return sorted(out)

    # -- stage 1: extract (per-shard checkpoints, ONE execution) ----------
    # One input file = one shard = one manifest: a killed/incremental run
    # re-extracts only pending shards (north rule: per-partition lineage +
    # resume). All pending shards are processed in a SINGLE streaming
    # execution (per-shard executions serialize and pay per-run fixed
    # costs — measured 30 shards sequentially = 87 s vs ~8 s fused): the
    # output is hive-partitioned by shard id, then each partition is
    # published atomically with its own manifest. At cluster scale a
    # "shard" is an input path prefix, not a single file.
    import shutil

    import pyarrow as pa

    from ..state.manifest import StageManifest, fingerprint_paths

    extract_root = runner.stage_dir("extract")
    os.makedirs(extract_root, exist_ok=True)
    shards = list(enumerate(sorted(input_paths)))
    pending = [
        (i, path)
        for i, path in shards
        if not runner.is_done(f"extract/shard-{i:05d}", [path])
    ]
    pending_ids = {i for i, _ in pending}
    for i, _ in shards:
        if i not in pending_ids:
            runner.log.append(f"skip extract/shard-{i:05d} (checkpoint hit)")
    if pending:
        partial = extract_root + ".partial"
        shutil.rmtree(partial, ignore_errors=True)

        parts = []
        for i, path in pending:
            d = ray.data.read_parquet(path, columns=["url", "html"])
            parts.append(
                d.map_batches(
                    lambda t, _i=i: t.append_column(
                        "shard", pa.array([_i] * t.num_rows, pa.int32())
                    ),
                    batch_format="pyarrow",
                )
            )
        ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

        def extract_keep_shard(batch: "pa.Table") -> "pa.Table":
            shard_col = batch.column("shard")
            out = extract_pages_batch(batch.drop_columns(["shard"]))
            # blocks never span input files, so the batch has one shard id
            sid = shard_col[0].as_py() if batch.num_rows else -1
            return out.append_column(
                "shard", pa.array([sid] * out.num_rows, pa.int32())
            )

        ds.map_batches(
            extract_keep_shard, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(partial, partition_cols=["shard"])

        for i, path in pending:
            sdir = runner.stage_dir(f"extract/shard-{i:05d}")
            src = os.path.join(partial, f"shard={i}")
            shutil.rmtree(sdir, ignore_errors=True)
            if os.path.exists(src):
                os.replace(src, sdir)
            else:  # shard produced no rows (e.g. all-null input)
                os.makedirs(sdir, exist_ok=True)
            outputs = sorted(
                f for f in os.listdir(sdir) if f.endswith(".parquet")
            )
            StageManifest(
                stage=f"extract/shard-{i:05d}",
                input_fingerprint=fingerprint_paths([path]),
                output_files=outputs,
                extra={"input": path},
            ).write(sdir)
            runner.log.append(f"ran extract/shard-{i:05d}: {len(outputs)} files")
        shutil.rmtree(partial, ignore_errors=True)

    # -- stage 2: link ----------------------------------------------------
    def build_link(tmp_dir):
        nonlocal linker_concurrency
        if linker_concurrency is None:
            linker_concurrency = _default_concurrency()
        gaz_ref = ray.put(gaz)
        ds = ray.data.read_parquet(stage_inputs("extract"))
        linked = ds.map_batches(
            MentionLinker,
            batch_format="pyarrow",
            # None is deliberate (measured, CLAUDE.md): an explicit
            # batch_size COALESCES blocks and caps parallelism at
            # n_rows/batch_size tasks — one task per input block instead
            batch_size=None,
            concurrency=linker_concurrency,
            fn_constructor_kwargs={"gazetteer_ref": gaz_ref},
        )
        linked.write_parquet(tmp_dir)
        return -1, {}

    runner.run("linked", stage_inputs("extract"), build_link)

    # -- stage 3: extracted text artifact ---------------------------------
    def build_text(tmp_dir):
        import pyarrow as pa

        ds = ray.data.read_parquet(
            stage_inputs("linked"), columns=["src_url", "pred", "text"]
        )

        def keep_text(batch: "pa.Table") -> "pa.Table":
            t = batch.filter(pc.equal(batch["pred"], pa.scalar(PRED_TEXT)))
            return t.select(["src_url", "text"]).rename_columns(["url", "text"])

        ds.map_batches(keep_text, batch_format="pyarrow").write_parquet(tmp_dir)
        return -1, {}

    runner.run("text", stage_inputs("linked"), build_text)

    # -- stage 3b: MinHash band index over the extracted text -------------
    # (r4 verdict item #5) persisted at forge time so the incremental
    # update path probes NEW pages against it with a band equi-join
    # instead of re-clustering the corpus (stages/dedup.probe_band_index)
    if neardup_index:

        def build_ndindex(tmp_dir):
            from ..stages.dedup import build_band_index

            texts = ray.data.read_parquet(stage_inputs("text"))
            stats = build_band_index(
                texts, tmp_dir, id_col="url", text_col="text"
            )
            return stats["rows"], stats

        runner.run("neardup_index", stage_inputs("text"), build_ndindex)

    # -- stage 4: canonicalize (dedup shuffle + surface-form merge) -------
    def build_canonical(tmp_dir):
        import pyarrow as pa

        linked = ray.data.read_parquet(stage_inputs("linked"))
        triples = _real_triples(linked)
        deduped = dedup_triples(triples)
        deduped.write_parquet(os.path.join(tmp_dir, "pre"))
        pre = ray.data.read_parquet(os.path.join(tmp_dir, "pre"))
        count = pre.count()  # parquet metadata read
        mapping = build_canonical_mapping(
            pre, columns=["subj", "obj"], count_hint=count
        )

        if not mapping:
            final = pre
        else:
            def split(batch: "pa.Table", keep_links: bool) -> "pa.Table":
                mask = pc.is_in(batch["pred"], value_set=pa.array(_LINK_PREDS))
                return batch.filter(mask if keep_links else pc.invert(mask))

            def rewrite(df):
                df = df.copy()
                df["obj"] = df["obj"].map(lambda v: mapping.get(v, v))
                return df

            untouched = pre.map_batches(
                lambda b: split(b, False), batch_format="pyarrow"
            )
            links = pre.map_batches(
                lambda b: split(b, True), batch_format="pyarrow"
            ).map_batches(rewrite, batch_format="pandas")
            final = untouched.union(dedup_triples(links, num_buckets=16))
        final.write_parquet(tmp_dir)
        import shutil

        shutil.rmtree(os.path.join(tmp_dir, "pre"))
        return -1, {"canonical_merges": len(mapping)}

    runner.run("canonical", stage_inputs("linked"), build_canonical)

    # -- stage 5: materialize ---------------------------------------------
    def build_adjacency(tmp_dir):
        ds = ray.data.read_parquet(stage_inputs("canonical"))
        extra = write_adjacency(ds, tmp_dir, num_adjacency_partitions)
        return -1, extra

    runner.run("adjacency", stage_inputs("canonical"), build_adjacency)

    if write_nt:

        def build_nt(tmp_dir):
            ds = ray.data.read_parquet(stage_inputs("canonical"))
            stats = write_ntriples(ds, tmp_dir, sort=True)
            return stats["lines"], stats

        runner.run("ntriples", stage_inputs("canonical"), build_nt)

    return runner
