"""Cluster job entrypoint for the corpus-curation pipeline.

Submit to a running Ray cluster (the production ``ray job submit`` form;
the sandbox runs it locally):

    ray job submit --working-dir . -- \
        python jobs/curate_job.py --input /data/docs --out /data/corpus

or locally:

    python jobs/curate_job.py --input /root/testdata/sf0.001 \
        --out /tmp/corpus --num-cpus 8

Input: documents parquet (doc_id, text, source). Output: per-stage
artifacts (signals / kept / shards) plus the packed training corpus
hive-partitioned by shard. Checkpoint-resumable exactly like the forge
job: re-submitting with the same --out skips completed stages via their
lineage manifests. Exit 0 iff every stage manifest reports done; one
JSON summary line prints at the end.
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
                    help="documents parquet file/dir/glob "
                         "(doc_id, text, source columns)")
    ap.add_argument("--out", required=True, help="pipeline output root")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU cap (ignored on a real cluster)")
    ap.add_argument("--quality-min", type=float, default=0.35)
    ap.add_argument("--max-dup-word-frac", type=float, default=0.8)
    ap.add_argument("--lm-min", type=float, default=None,
                    help="min bigram-LM mean logprob (off by default)")
    ap.add_argument("--per-source-cap", type=int, default=None)
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--pack-capacity", type=int, default=512)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        address = os.environ.get("RAY_ADDRESS", "local")
        if args.num_cpus and address == "local":
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=address, **kwargs)

    from graphforge_ray.pipelines.curate import run_curation_pipeline

    if os.path.isdir(args.input):
        paths = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        # a testdata dir holds many tables; prefer documents.parquet
        docs = [p for p in paths if p.endswith("documents.parquet")]
        paths = docs or paths
    else:
        paths = sorted(glob.glob(args.input)) or [args.input]
    if not paths:
        print(f"no input parquet under {args.input!r}", file=sys.stderr)
        return 2

    runner = run_curation_pipeline(
        paths, args.out,
        quality_min=args.quality_min,
        max_dup_word_frac=args.max_dup_word_frac,
        lm_min=args.lm_min,
        per_source_cap=args.per_source_cap,
        num_shards=args.num_shards,
        pack_capacity=args.pack_capacity,
    )

    stages = {}
    ok = True
    for mpath in sorted(
        glob.glob(os.path.join(args.out, "**", "MANIFEST.json"),
                  recursive=True)
    ):
        m = json.load(open(mpath))
        stages[m["stage"]] = m.get("status")
        ok &= m.get("status") == "done"
    n_shards = len(glob.glob(os.path.join(args.out, "corpus", "shard=*")))
    print(json.dumps({
        "job": "curate",
        "input_files": len(paths),
        "stages_done": sum(1 for s in stages.values() if s == "done"),
        "stages_total": len(stages),
        "corpus_shards": n_shards,
        "log": runner.log[-6:],
        "ok": ok,
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
