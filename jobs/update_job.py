"""Cluster job entrypoint for incremental KG maintenance.

Given a BASE forge run (yesterday's graph) and the new page shards,
produce the new snapshot, the add/del change set, and optionally the
RDFS-closed graph:

    ray job submit --working-dir . -- \
        python jobs/update_job.py --input /data/pages_v2 \
            --base /data/kg_v1 --out /data/kg_v2

or locally:

    python jobs/update_job.py --input /tmp/pages2 --base /tmp/kg1 \
        --out /tmp/kg2 --num-cpus 8 [--ontology /tmp/onto.parquet]

Checkpoint-resumable like forge_job: same --base/--input/--out resumes;
a changed ontology invalidates only the `entailed` stage. One JSON
metrics line on stdout; exit 0 iff all stages done.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="new pages parquet file/dir/glob (url, html)")
    ap.add_argument("--base", required=True,
                    help="previous forge output root (canonical/ inside)")
    ap.add_argument("--out", required=True, help="update output root")
    ap.add_argument("--ontology", default=None,
                    help="optional (subj, pred, obj) parquet of RDFS "
                         "schema triples — adds the `entailed` stage")
    ap.add_argument("--shapes", default=None,
                    help="JSON file of SHACL cardinality shapes; adds "
                         "the 'validated' stage (incremental when the "
                         "base run carries a validated/ report)")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--no-ntriples", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        address = os.environ.get("RAY_ADDRESS", "local")
        if address == "local" and args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=address, **kwargs)

    from graphforge_ray.pipelines.update import run_update_pipeline
    from graphforge_ray.state.manifest import fingerprint_paths

    if os.path.isdir(args.input):
        inputs = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    else:
        inputs = sorted(glob.glob(args.input)) or [args.input]

    ontology = None
    onto_fp = None
    if args.ontology:
        ontology = ray.data.read_parquet(args.ontology)
        onto_fp = fingerprint_paths(sorted(glob.glob(args.ontology))
                                    or [args.ontology])

    shapes = None
    if args.shapes:
        import json as _json

        with open(args.shapes) as f:
            shapes = _json.load(f)

    runner = run_update_pipeline(
        inputs,
        args.base,
        args.out,
        ontology=ontology,
        ontology_fingerprint=onto_fp,
        write_nt=not args.no_ntriples,
        shapes=shapes,
    )

    from graphforge_ray.state.manifest import StageManifest

    stages = ["delta"] + (["entailed"] if ontology is not None else []) \
        + (["validated"] if shapes is not None else []) \
        + ([] if args.no_ntriples else ["publish"])
    report = {"log": runner.log, "stages": {}}
    ok = True
    for s in stages:
        m = StageManifest.read(runner.stage_dir(s))
        if m is None or m.status != "done":
            ok = False
            report["stages"][s] = {"status": "missing"}
        else:
            report["stages"][s] = {
                "status": m.status, "rows": m.rows_out,
                **(m.extra or {}),
            }
    print(json.dumps(report))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
