"""Cluster job entrypoint for SHACL cardinality validation of a KG.

    ray job submit --working-dir . -- \
        python jobs/validate_job.py --input /data/kg/canonical \
            --shapes shapes.json --out /data/kg_violations

or locally:

    python jobs/validate_job.py --input /tmp/out/canonical \
        --shapes /tmp/shapes.json --out /tmp/violations --num-cpus 8

``--input`` is a directory tree of (subj, pred, obj[, ...]) parquet;
``--shapes`` a JSON list of shape dicts (shape_id, target_class, pred,
min_count[, max_count]). Violations are written as partitioned parquet
under ``--out`` and never collected on the driver. One JSON metrics
line on stdout; exit 0 iff validation ran (violations found is still
exit 0 — the COUNT is the signal; pass --fail-on-violation to gate).
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
                    help="directory tree of triples parquet")
    ap.add_argument("--shapes", required=True,
                    help="JSON file: list of shape dicts")
    ap.add_argument("--out", required=True,
                    help="output directory for violations parquet")
    ap.add_argument("--type-pred", default="rdf:type")
    ap.add_argument("--fail-on-violation", action="store_true",
                    help="exit 1 when any violation exists")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    with open(args.shapes) as f:
        shapes = json.load(f)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        address = os.environ.get("RAY_ADDRESS", "local")
        if address == "local" and args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=address, **kwargs)

    import ray.data as rd

    from graphforge_ray.stages.shacl import shacl_validate

    triples = rd.read_parquet(args.input, columns=["subj", "pred", "obj"])
    violations = shacl_validate(triples, shapes,
                                type_pred=args.type_pred)
    os.makedirs(args.out, exist_ok=True)
    violations = violations.materialize()
    n = violations.count()
    violations.write_parquet(args.out)
    per_shape = (
        violations.groupby("shape_id").count().to_pandas()
        if n else None
    )
    print(json.dumps({
        "job": "validate", "ok": True, "violations": int(n),
        "shapes": len(shapes),
        "per_shape": (
            {str(r["shape_id"]): int(r["count()"])
             for _, r in per_shape.iterrows()}
            if per_shape is not None else {}
        ),
        "out": args.out,
    }))
    ray.shutdown()
    return 1 if (args.fail_on_violation and n > 0) else 0


if __name__ == "__main__":
    sys.exit(main())
