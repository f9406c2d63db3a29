"""Cluster job entrypoint for KG-embedding training (TransE).

Given a triples parquet (subj, pred, obj), train N full-batch TransE
epochs and evaluate filtered link-prediction ranks:

    ray job submit --working-dir . -- \
        python jobs/embed_job.py --input /data/kg/canonical \
            --out /data/kg_embed --dim 64 --epochs 5

or locally:

    python jobs/embed_job.py --input /tmp/triples.parquet \
        --out /tmp/embed --dim 16 --epochs 2 --num-cpus 8

Checkpoint-resumable: re-running with the same inputs/out resumes at
the first missing epoch; changed hyper-parameters retrain. One JSON
metrics line on stdout; exit 0 iff all stages done.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="triples parquet file/dir/glob (subj, pred, obj)")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--margin", type=float, default=1.0)
    ap.add_argument("--test-mod", type=int, default=50,
                    help="1/N of triples become the eval slice")
    ap.add_argument("--warm-start", default=None,
                    help="previous run's init/ or epoch-NNNN/ dir — "
                         "existing entities reuse trained vectors")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        address = os.environ.get("RAY_ADDRESS", "local")
        if address == "local" and args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=address, **kwargs)

    from graphforge_ray.pipelines.embed import run_embed_pipeline
    from graphforge_ray.state.manifest import StageManifest

    runner = run_embed_pipeline(
        args.input, args.out, dim=args.dim, epochs=args.epochs,
        lr=args.lr, margin=args.margin, test_mod=args.test_mod,
        warm_start=args.warm_start,
    )

    stages = (["entities", "init"]
              + [f"epoch-{e:04d}" for e in range(1, args.epochs + 1)]
              + ["eval"])
    manifests = {
        st: StageManifest.read(runner.stage_dir(st)) for st in stages
    }
    ok = all(m is not None and m.status == "done"
             for m in manifests.values())
    ev = manifests["eval"]
    print(json.dumps({
        "ok": ok,
        "log": runner.log,
        "stages": {
            st: {"rows": m.rows_out, "wall_sec": round(m.wall_sec, 3)}
            for st, m in manifests.items() if m is not None
        },
        "eval": (ev.extra if ev is not None else {}),
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
