"""End-to-end corpus-curation pipeline (checkpoint-resumable).

The training-data counterpart of ``run_forge_pipeline``: every stage
writes partitioned parquet plus a ``MANIFEST.json`` (input fingerprint,
counts, stage metrics) through ``state.manifest.StageRunner``, so a
killed or re-run job skips completed stages and a changed input
re-runs exactly the stages downstream of it. Stage layout::

    <out_dir>/signals/   per-doc quality/repetition/LM/contamination
    <out_dir>/kept/      ids surviving filters + dedup + quotas
    <out_dir>/shards/    (doc_id, rank, shard, seq_id, offset)
    <out_dir>/corpus/    shard=<k>/ final packed corpus parquet

Composition of the curation operators (each individually SQL-oracled
through the driver contract): quality scoring + Gopher repetition
signals + corpus-trained bigram-LM scoring + substring decontamination
→ threshold filter → exact dedup → MinHash near-dup dedup → optional
per-source quota → reproducible shuffle/shard → greedy sequence
packing → hive-partitioned corpus write (one directory per shard, so a
consumer — or a resumed writer — addresses shards independently).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data

from ..shuffle import bindings_join, snap_lineage
from ..state.manifest import StageRunner

__all__ = ["run_curation_pipeline"]


def _restore(df: pd.DataFrame, dtypes: dict) -> pd.DataFrame:
    """bindings_join widens filled columns to object — restore dtypes
    so downstream hash buckets see consistent key dtypes (shuffle.py
    caveat) and parquet blocks agree on one Arrow schema."""
    df = df.copy()
    for c, t in dtypes.items():
        if c in df.columns:
            df[c] = df[c].astype(t)
    return df


def _restore_int(df: pd.DataFrame, cols: tuple[str, ...]) -> pd.DataFrame:
    return _restore(df, {c: "int64" for c in cols})


def run_curation_pipeline(
    input_paths: str | list[str],
    out_dir: str,
    quality_min: float = 0.35,
    max_dup_word_frac: float = 0.8,
    lm_min: float | None = None,
    probes: list[str] | None = None,
    per_source_cap: int | None = None,
    minhash_threshold: float = 0.8,
    num_shards: int = 8,
    pack_capacity: int = 512,
) -> StageRunner:
    """Curate a documents parquet corpus ``(doc_id, text, source, …)``
    into packed training shards under ``out_dir``. Returns the
    StageRunner (``.log`` records ran/skip per stage)."""
    import graphforge_ray

    graphforge_ray.tune_data_context()
    if isinstance(input_paths, str):
        input_paths = [input_paths]
    input_paths = sorted(input_paths)
    runner = StageRunner(out_dir)

    def stage_files(stage: str) -> list[str]:
        d = runner.stage_dir(stage)
        return sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    # -- stage 1: per-doc signals -----------------------------------
    def build_signals(tmp_dir):
        from ..stages.curation import (
            contamination_flags,
            repetition_stats_batch,
        )
        from ..stages.lm import bigram_logprob_scores
        from ..stages.proc_cache import process_cached_stage
        from ..stages.text_analysis import TextQualityScorer

        docs = ray.data.read_parquet(
            input_paths, columns=["doc_id", "text", "source"]
        )
        scored = docs.map_batches(
            process_cached_stage(TextQualityScorer), batch_format="pandas"
        ).map_batches(repetition_stats_batch, batch_format="pandas")
        scored = contamination_flags(scored, probes or [])
        base = scored.map_batches(
            lambda df: df[
                ["doc_id", "source", "n_words", "dup_word_frac",
                 "quality_score", "contaminated"]
            ],
            batch_format="pandas",
        )
        lm = bigram_logprob_scores(docs)
        joined = bindings_join(base, lm, on=["doc_id"]).map_batches(
            lambda df: _restore(
                df,
                {"doc_id": "int64", "n_words": "int64",
                 "contaminated": "int64", "dup_word_frac": "float64",
                 "quality_score": "float64", "lm_score": "float64"},
            ),
            batch_format="pandas",
        )
        joined.write_parquet(tmp_dir)
        return -1, {}

    # stage params ride into the checkpoint fingerprint: re-running with
    # a changed threshold against the same out dir must RE-RUN the stage,
    # not silently return the stale output (parameter-blind checkpoints)
    runner.run("signals", input_paths, build_signals,
               params={"probes": sorted(probes or [])})

    # -- stage 2: filter + dedup + quota → kept ids -------------------
    def build_kept(tmp_dir):
        from ..stages.curation import per_source_quota
        from ..stages.dedup import exact_dedup, minhash_dedup

        sig = ray.data.read_parquet(stage_files("signals"))
        lo_q, hi_dup, lo_lm = quality_min, max_dup_word_frac, lm_min

        def passes(df: pd.DataFrame) -> pd.DataFrame:
            keep = (
                (df["quality_score"].astype(float) >= lo_q)
                & (df["dup_word_frac"].astype(float) <= hi_dup)
                & (df["contaminated"].astype("int64") == 0)
                & (df["n_words"].astype("int64") > 0)
            )
            if lo_lm is not None:
                keep &= df["lm_score"].astype(float) >= lo_lm
            return df.loc[keep, ["doc_id", "source"]]

        # snaps: each of kept_ids / kept_docs / exact_docs feeds 2+
        # consumers (exact_docs is consumed ~4× inside minhash_dedup);
        # unsnapped, Ray Data replays the whole upstream join chain per
        # consumer (the lm.py shared-sub-plan lesson)
        kept_ids = snap_lineage(
            sig.map_batches(passes, batch_format="pandas")
        )

        docs = ray.data.read_parquet(
            input_paths, columns=["doc_id", "text"]
        )
        kept_docs = snap_lineage(bindings_join(
            docs, kept_ids.map_batches(
                lambda df: df[["doc_id"]], batch_format="pandas"
            ), on=["doc_id"], how="semi",
        ).map_batches(
            lambda df: _restore_int(df, ("doc_id",)),
            batch_format="pandas",
        ))
        # exact dedup keeps the smallest doc_id per identical text;
        # it returns SURVIVOR IDS (content_hash, doc_id), so the docs
        # re-attach via a semi join before near-dup clustering
        exact_ids = exact_dedup(kept_docs).map_batches(
            lambda df: _restore_int(df[["doc_id"]], ("doc_id",)),
            batch_format="pandas",
        )
        exact_docs = snap_lineage(bindings_join(
            kept_docs, exact_ids, on=["doc_id"], how="semi"
        ).map_batches(
            lambda df: _restore_int(df, ("doc_id",)),
            batch_format="pandas",
        ))
        # near-dup clustering: keep one representative per cluster
        clustered = minhash_dedup(exact_docs, threshold=minhash_threshold)
        survivors = clustered.map_batches(
            lambda df: df.loc[df["keep"], ["doc_id"]],
            batch_format="pandas",
        ).map_batches(
            lambda df: _restore_int(df, ("doc_id",)),
            batch_format="pandas",
        )
        final_ids = bindings_join(
            kept_ids, survivors, on=["doc_id"], how="semi"
        ).map_batches(
            lambda df: _restore_int(df, ("doc_id",)),
            batch_format="pandas",
        )
        if per_source_cap is not None:
            final_ids = per_source_quota(final_ids, k=per_source_cap)
        final_ids.write_parquet(tmp_dir)
        return -1, {}

    runner.run(
        "kept", stage_files("signals"), build_kept,
        params={
            "quality_min": quality_min,
            "max_dup_word_frac": max_dup_word_frac,
            "lm_min": lm_min,
            "per_source_cap": per_source_cap,
            "minhash_threshold": minhash_threshold,
        },
    )

    # -- stage 3: shuffle + shard + pack ------------------------------
    def build_shards(tmp_dir):
        from ..stages.sampling import deterministic_shuffle, pack_sequences

        kept = ray.data.read_parquet(
            stage_files("kept"), columns=["doc_id"]
        )
        sharded = deterministic_shuffle(kept, num_shards=num_shards)
        toks = ray.data.read_parquet(
            stage_files("signals"), columns=["doc_id", "n_words"]
        )
        joined = bindings_join(sharded, toks, on=["doc_id"]).map_batches(
            lambda df: _restore_int(
                df, ("doc_id", "rank", "shard", "n_words")
            ),
            batch_format="pandas",
        )
        packed = pack_sequences(
            joined, capacity=pack_capacity, size_col="n_words"
        )
        packed.write_parquet(tmp_dir)
        return -1, {}

    runner.run("shards", stage_files("kept") + stage_files("signals"),
               build_shards,
               params={"num_shards": num_shards,
                       "pack_capacity": pack_capacity})

    # -- stage 4: final packed corpus, hive-partitioned by shard ------
    def build_corpus(tmp_dir):
        docs = ray.data.read_parquet(
            input_paths, columns=["doc_id", "text"]
        )
        plan = ray.data.read_parquet(stage_files("shards"))
        # snap before the count + write pair — unsnapped, count() and
        # write_parquet() each execute the join once
        final = snap_lineage(bindings_join(
            docs, plan, on=["doc_id"]
        ).map_batches(
            lambda df: _restore_int(
                df, ("doc_id", "shard", "seq_id", "offset")
            ),
            batch_format="pandas",
        ))
        n = final.count()
        final.write_parquet(tmp_dir, partition_cols=["shard"])
        return n, {"docs_out": n, "num_shards": num_shards}

    runner.run("corpus", stage_files("shards"), build_corpus,
               params={"num_shards": num_shards})
    return runner
