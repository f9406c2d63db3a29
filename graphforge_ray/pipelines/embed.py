"""KG-embedding training pipeline: triples parquet → TransE entity /
relation embeddings + link-prediction eval, checkpoint-resumable.

Stage layout under ``out_dir`` (manifest conventions of
pipelines/forge.py — atomic ``.tmp`` rename + MANIFEST.json):

* ``entities/``   distinct subjects ∪ objects (bucket dedup)
* ``init/``       md5-deterministic entity + relation init vectors
* ``epoch-NNNN/`` one full-batch TransE epoch each — an interrupted
  N-epoch run resumes at the first epoch whose manifest is missing
  (epoch k's fingerprint covers epoch k−1's output, the triples and
  the hyper-parameters, so a changed lr/margin retrains)
* ``eval/``       filtered link-prediction ranks over an md5-chosen
  test slice + MRR / Hits@k in the manifest extra

Embeddings persist as plain parquet (name, embedding list<float64>)
so any downstream consumer (ANN stages, similarity joins) reads them
without this module.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd

__all__ = ["run_embed_pipeline"]


def _expand(input_paths) -> list[str]:
    if isinstance(input_paths, str):
        input_paths = [input_paths]
    out: list[str] = []
    for p in input_paths:
        if os.path.isdir(p):
            out.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
        elif any(ch in p for ch in "*?["):
            out.extend(sorted(glob.glob(p)))
        elif os.path.exists(p):
            out.append(p)
    if not out:
        raise ValueError(f"no input parquet found: {input_paths}")
    return out


def run_embed_pipeline(
    input_paths,
    out_dir: str,
    dim: int = 32,
    epochs: int = 3,
    lr: float = 0.01,
    margin: float = 1.0,
    cols: tuple[str, str, str] = ("subj", "pred", "obj"),
    test_mod: int = 50,
    max_relations: int = 100_000,
    salt: str = "graft-embed",
    warm_start: str | None = None,
):
    """Run (or resume) the embedding pipeline; returns the StageRunner
    (``.log`` holds ran/skip lines; manifests carry the metrics).

    ``warm_start``: a previous run's stage dir (its ``init/`` or final
    ``epoch-NNNN/``) — today's entities reuse yesterday's trained
    vectors, only NEW entities/relations get the md5 init (incremental
    KG maintenance: re-train a few epochs instead of from scratch)."""
    import ray.data as rd

    from ..state.manifest import StageRunner
    from ..stages.fasthash import hex_prefix_int, md5_hex
    from ..stages.transe import (
        distinct_entities, init_embeddings, transe_epoch,
        transe_rank_eval, warm_init_embeddings)

    if epochs < 1:
        raise ValueError(f"epochs must be ≥ 1: {epochs}")
    s, p, o = cols
    paths = _expand(input_paths)
    warm_ent_paths: list[str] = []
    warm_rel_path: str | None = None
    if warm_start is not None:
        warm_ent_paths = sorted(
            glob.glob(os.path.join(warm_start, "ent", "*.parquet")))
        warm_rel_path = os.path.join(warm_start, "rel", "rel.parquet")
        if not warm_ent_paths or not os.path.exists(warm_rel_path):
            raise ValueError(
                f"warm_start dir lacks ent/*.parquet + rel/rel.parquet:"
                f" {warm_start}")
    runner = StageRunner(out_dir)
    hyper = {"dim": dim, "lr": lr, "margin": margin, "cols": list(cols),
             "salt": salt, "warm": bool(warm_start)}

    def triples():
        return rd.read_parquet(paths, columns=list(cols))

    # ---- entities ----------------------------------------------------
    def build_entities(tmp_dir: str):
        ents = distinct_entities(triples(), cols=cols)
        ents.write_parquet(tmp_dir)
        return ents.count(), {}

    runner.run("entities", paths, build_entities,
               params={"cols": list(cols)})
    ent_dir = runner.stage_dir("entities")

    # ---- init ---------------------------------------------------------
    def build_init(tmp_dir: str):
        # the stage root also holds MANIFEST.json — glob the parquet
        ents = rd.read_parquet(
            sorted(glob.glob(os.path.join(ent_dir, "*.parquet"))))
        if warm_ent_paths:
            e0 = warm_init_embeddings(
                ents, rd.read_parquet(warm_ent_paths), dim,
                salt=f"{salt}-e")
        else:
            e0 = init_embeddings(ents, dim, salt=f"{salt}-e")
        os.makedirs(os.path.join(tmp_dir, "ent"))
        e0.write_parquet(os.path.join(tmp_dir, "ent"))
        # relations are ontology-sized: distinct preds via per-batch
        # dedup + a driver-side set behind the loud cap
        preds = sorted(
            set(
                triples()
                .map_batches(
                    lambda df: df[[p]].drop_duplicates(),
                    batch_format="pandas",
                )
                .to_pandas()[p]
                .astype(str)
            )
        )
        if len(preds) > max_relations:
            raise ValueError(
                f"relation vocabulary too large: {len(preds)} > "
                f"max_relations={max_relations}")
        r0 = init_embeddings(
            rd.from_pandas(pd.DataFrame({p: preds})),
            dim, name_col=p, salt=f"{salt}-r", normalize=False,
        ).to_pandas()
        if warm_rel_path is not None:
            # relations are ontology-sized: warm-merge driver-side
            old = pd.read_parquet(warm_rel_path)
            om = {str(k): np.asarray(v, np.float64).tolist()
                  for k, v in zip(old[p], old["embedding"])}
            r0["embedding"] = [
                om.get(str(k), np.asarray(v, np.float64).tolist())
                for k, v in zip(r0[p], r0["embedding"])
            ]
        os.makedirs(os.path.join(tmp_dir, "rel"))
        r0.to_parquet(os.path.join(tmp_dir, "rel", "rel.parquet"),
                      index=False)
        return e0.count() + len(preds), {"relations": len(preds)}

    runner.run("init",
               paths + [os.path.join(ent_dir, "MANIFEST.json")]
               + warm_ent_paths
               + ([warm_rel_path] if warm_rel_path else []),
               build_init, params=hyper)

    # ---- epochs --------------------------------------------------------
    prev = runner.stage_dir("init")
    for e in range(1, epochs + 1):
        stage = f"epoch-{e:04d}"
        prev_dir = prev

        def build_epoch(tmp_dir: str, _prev=prev_dir):
            ent = rd.read_parquet(os.path.join(_prev, "ent"))
            rel = pd.read_parquet(
                os.path.join(_prev, "rel", "rel.parquet"))
            rel["embedding"] = rel["embedding"].map(
                lambda v: np.asarray(v, np.float64).tolist())
            e1, r1 = transe_epoch(
                triples(), ent, rel, lr=lr, margin=margin, cols=cols)
            os.makedirs(os.path.join(tmp_dir, "ent"))
            e1.write_parquet(os.path.join(tmp_dir, "ent"))
            os.makedirs(os.path.join(tmp_dir, "rel"))
            r1.to_parquet(
                os.path.join(tmp_dir, "rel", "rel.parquet"),
                index=False)
            return e1.count(), {"epoch": e}

        runner.run(
            stage,
            paths + [os.path.join(prev_dir, "MANIFEST.json")],
            build_epoch, params=hyper,
        )
        prev = runner.stage_dir(stage)

    # ---- eval -----------------------------------------------------------
    final_dir = prev

    def build_eval(tmp_dir: str):
        ent = rd.read_parquet(os.path.join(final_dir, "ent"))
        rel = pd.read_parquet(
            os.path.join(final_dir, "rel", "rel.parquet"))
        rel["embedding"] = rel["embedding"].map(
            lambda v: np.asarray(v, np.float64).tolist())

        def pick_test(df: pd.DataFrame) -> pd.DataFrame:
            keys = np.array(
                [f"{salt}-test:{a}\x1f{b}\x1f{c}" for a, b, c in
                 zip(df[s], df[p], df[o])],
                dtype=object)
            m = hex_prefix_int(md5_hex(keys), 10) % test_mod == 0
            return df[m]

        test = triples().map_batches(pick_test, batch_format="pandas")
        ranks = transe_rank_eval(
            test, ent, rel, known_triples=triples(), cols=cols)
        ranks.write_parquet(tmp_dir)
        rk = ranks.to_pandas()["rank"].to_numpy(np.float64)
        return len(rk), {
            "mrr": round(float((1.0 / rk).mean()), 6),
            "hits1": round(float((rk <= 1).mean()), 6),
            "hits10": round(float((rk <= 10).mean()), 6),
        }

    runner.run(
        "eval", paths + [os.path.join(final_dir, "MANIFEST.json")],
        build_eval, params=dict(hyper, test_mod=test_mod),
    )
    return runner
