"""Incremental KG maintenance: re-forge, diff, (optionally) entail,
publish — the "yesterday's graph → today's graph" production loop.

A 10^12-page corpus is never forged once; crawls land continuously and
the downstream consumers (indexes, embeddings, caches) want the CHANGE
SET, not a full re-materialization. ``run_update_pipeline`` composes the
existing checkpointed stages into that loop:

1. **snapshot** — ``run_forge_pipeline`` over the new page shards into
   ``<out>/snapshot`` (itself per-shard checkpointed: only new/changed
   shards re-extract).
2. **delta** — ``stages/delta.kg_delta`` between the BASE run's
   canonical triples and the new snapshot's (one composite-hash
   shuffle); written as op-partitioned parquet plus add/del counts in
   the manifest.
3. **entailed** (optional, ``ontology`` given) — RDFS closure of the
   new snapshot union the ontology (``stages/rdfs.rdfs_entail``), so
   consumers that query by supertype see the updated inferred graph.
4. **publish** — N-Quads of the delta (``<op>`` in the graph position
   would be wrong — ops become two files: ``adds-*.nt`` /
   ``dels-*.nt``), atomic via the stage-dir rename.

Every stage is a ``StageRunner`` stage: re-running with the same base +
inputs is a no-op; changing the ontology or the base invalidates
exactly the dependent stages (parameter-aware fingerprints).
"""

from __future__ import annotations

import os

import ray

from ..state.manifest import StageRunner
from ..stages.delta import kg_delta

__all__ = ["run_update_pipeline"]


def _parquet_under(root: str) -> list[str]:
    return sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    )


def run_update_pipeline(
    new_input_paths: list[str] | str,
    base_dir: str,
    out_dir: str,
    ontology: "ray.data.Dataset | None" = None,
    ontology_fingerprint: str | None = None,
    write_nt: bool = True,
    shapes: list[dict] | None = None,
) -> StageRunner:
    """``base_dir`` is a completed ``run_forge_pipeline`` output root
    (its ``canonical/`` stage is the old snapshot). Returns the update
    runner; stage layout::

        <out_dir>/snapshot/     full forge run over the new pages
        <out_dir>/delta/        (op, subj, pred, obj) parquet
        <out_dir>/entailed/     RDFS closure of the new graph (optional)
        <out_dir>/publish/      adds-*.nt / dels-*.nt
    """
    from .forge import run_forge_pipeline

    base_canonical = _parquet_under(os.path.join(base_dir, "canonical"))
    if not base_canonical:
        raise ValueError(
            f"base run has no canonical triples: {base_dir}/canonical "
            "(run the forge pipeline there first)"
        )

    if isinstance(new_input_paths, str):
        new_input_paths = [new_input_paths]

    # stage 1: forge the new snapshot (nested runner, own checkpoints)
    snap_dir = os.path.join(out_dir, "snapshot")
    snap_runner = run_forge_pipeline(
        new_input_paths, snap_dir, write_nt=False
    )

    runner = StageRunner(out_dir)
    runner.log.extend(f"snapshot: {line}" for line in snap_runner.log)
    new_canonical = _parquet_under(os.path.join(snap_dir, "canonical"))
    delta_inputs = sorted(base_canonical + new_canonical)

    # stage 2: the change set. Identity is the FULL term tuple (flags,
    # lang, datatype, graph) so the published lines serialize exactly;
    # nullable string terms are normalized to '' (NaN-key merges are a
    # pandas foot-gun and '' is the sink's own null convention).
    TERM_COLS = ["subj", "pred", "obj", "obj_is_iri", "obj_lang",
                 "obj_datatype", "graph"]

    def _norm(df):
        df = df.copy()
        for c in ("obj_lang", "obj_datatype", "graph"):
            df[c] = df[c].fillna("")
        df["obj_is_iri"] = df["obj_is_iri"].astype(bool)
        return df

    def build_delta(tmp_dir):
        old = ray.data.read_parquet(
            base_canonical, columns=TERM_COLS
        ).map_batches(_norm, batch_format="pandas")
        new = ray.data.read_parquet(
            new_canonical, columns=TERM_COLS
        ).map_batches(_norm, batch_format="pandas")
        d = kg_delta(old, new, cols=tuple(TERM_COLS)).materialize()
        counts = {"adds": 0, "dels": 0}
        for row in d.groupby("op").count().take_all():
            counts[f"{row['op']}s"] = int(row["count()"])
        d.write_parquet(tmp_dir)
        return counts["adds"] + counts["dels"], counts

    runner.run("delta", delta_inputs, build_delta)

    # stage 2b: incremental near-dup (r4 verdict item #5) — when the
    # base run persisted a MinHash band index, probe ONLY the new
    # snapshot's pages against it (band equi-join + exact-Jaccard
    # verify): O(new) signature work, no base re-clustering. Written as
    # (id_a, id_b, jaccard) parquet; pair count in the manifest.
    base_index = os.path.join(base_dir, "neardup_index")
    if os.path.exists(os.path.join(base_index, "INDEX.json")):
        new_texts = _parquet_under(os.path.join(snap_dir, "text"))
        base_texts = _parquet_under(os.path.join(base_dir, "text"))

        def build_neardup(tmp_dir):
            from ..stages.dedup import probe_band_index

            pairs = probe_band_index(
                ray.data.read_parquet(new_texts),
                base_index,
                ray.data.read_parquet(base_texts),
                id_col="url", text_col="text",
            ).materialize()
            n = pairs.count()
            if n:
                pairs.write_parquet(tmp_dir)
            return n, {"pairs": int(n)}

        runner.run(
            "neardup",
            sorted(new_texts + _parquet_under(base_index)),
            build_neardup,
        )

    # stage 2c (optional): SHACL gate over the new snapshot. When the
    # base run carries a prior report (validated/), revalidation is
    # INCREMENTAL — only delta-touched subjects recompute (cardinality
    # verdicts are subject-scoped); a first run validates in full.
    # Each run writes its own validated/ so the NEXT update can go
    # incremental.
    if shapes is not None:
        import hashlib as _hashlib
        import json as _json

        shapes_fp = _hashlib.md5(
            _json.dumps(shapes, sort_keys=True).encode()
        ).hexdigest()
        prev_report = _parquet_under(os.path.join(base_dir, "validated"))

        def build_validated(tmp_dir):
            from ..stages.shacl import (
                shacl_validate,
                shacl_validate_incremental,
            )

            new = ray.data.read_parquet(
                new_canonical, columns=["subj", "pred", "obj"]
            )
            delta_files = _parquet_under(runner.stage_dir("delta"))
            if prev_report and not delta_files:
                # no-change day: the previous report IS today's
                v = ray.data.read_parquet(prev_report)
            elif prev_report:
                affected = ray.data.read_parquet(
                    delta_files, columns=["subj"]
                )
                prev = ray.data.read_parquet(prev_report)
                v = shacl_validate_incremental(
                    new, shapes, affected, prev
                )
            else:
                v = shacl_validate(new, shapes)
            v = v.materialize()
            n = v.count()
            if n:
                v.write_parquet(tmp_dir)
            return n, {"violations": int(n)}

        runner.run(
            "validated",
            sorted(new_canonical + prev_report
                   + _parquet_under(runner.stage_dir("delta"))),
            build_validated,
            params={"shapes": shapes_fp},
        )

    # stage 3 (optional): closed new graph
    if ontology is not None:
        onto_snap = ontology.materialize()

        def build_entailed(tmp_dir):
            from ..stages.rdfs import rdfs_entail

            new = ray.data.read_parquet(
                new_canonical, columns=["subj", "pred", "obj"]
            )
            closed = rdfs_entail(new.union(onto_snap))
            closed.write_parquet(tmp_dir)
            return -1, {}

        runner.run(
            "entailed", new_canonical, build_entailed,
            params={"ontology": ontology_fingerprint or "inline"},
        )

    # stage 4: publish the change set as N-Triples
    if write_nt:

        def build_publish(tmp_dir):
            from ..sinks.ntriples_sink import write_ntriples

            delta_files = _parquet_under(runner.stage_dir("delta"))
            stats = {"adds": 0, "dels": 0}
            for op, prefix in (("add", "adds"), ("del", "dels")):
                sub = os.path.join(tmp_dir, prefix)
                os.makedirs(sub, exist_ok=True)
                # a 0-row delta writes NO parquet files (Ray skips empty
                # blocks) — the no-change day publishes empty dirs, it
                # must not crash read_parquet([])
                if not delta_files:
                    continue
                part = ray.data.read_parquet(delta_files).filter(
                    expr=f"op == '{op}'"
                ).drop_columns(["op"])
                s = write_ntriples(part, sub, sort=True)
                stats[prefix] = s["lines"]
            return stats["adds"] + stats["dels"], stats

        runner.run(
            "publish",
            _parquet_under(runner.stage_dir("delta")),
            build_publish,
        )

    return runner
