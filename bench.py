"""Benchmark harness (driver contract).

Plain run: executes the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "graphforge_ray end-to-end", "value": <total sec>,
     "unit": "sec", "queries": {...per-pipeline sec...},
     "sf": 0.1, "num_cpus": 32, "forge": {...triples/sec detail...}}

``--scaling``: runs the headline forge pipeline twice in FRESH processes
(num_cpus=N then 4N; default 6 → 24 — leaving headroom for Ray system
processes on this 32-core host so the measurement reflects engine scaling,
not host saturation) on the same input, and reports both throughputs +
scaling efficiency (sandbox substitute for the N vs 4N-node criterion; see
BASELINE.md).

Headline pipelines:
    forge            pages corpus → canonical KG triples (the north-star
                     pipeline; corpus size $GRAFT_BENCH_PAGES, default
                     120k ≈ tens of seconds at 8 cpus)
    lineitem_agg     grouped aggregate over 600k rows
    events_hourly    tumbling-window aggregate
    docs_dedup       exact + MinHash-LSH dedup over documents
    ann_topk         brute-force cosine top-k over embeddings
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("GRAFT_BENCH_PAGES", "60000"))
    rich = int(os.environ.get("GRAFT_BENCH_RICH", "8"))

    # ambient host load BEFORE we spin anything up — the only sample not
    # polluted by our own workers; readers adjudicating a regressed-
    # looking snapshot need this in the artifact (r2: every query
    # "regressed" 1.5-2.3× at once under a load-avg-13 neighbor burst)
    load_start = [round(x, 2) for x in os.getloadavg()]

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    # warm the OS page cache so we measure compute + shuffle, not first read
    for name in os.listdir(sf_dir):
        with open(os.path.join(sf_dir, name), "rb") as f:
            while f.read(1 << 22):
                pass

    from graphforge_ray.fixtures import pages_dataset, write_pages_parquet
    from graphforge_ray.pipelines import driver_queries as dq
    from graphforge_ray.pipelines.forge import forge_triples
    from graphforge_ray.stages.dedup import exact_dedup, minhash_lsh_candidates

    queries: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    rep_loads: dict[str, list[list[float]]] = {}
    detail: dict = {}
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "2"))
    max_reps = int(os.environ.get("GRAFT_BENCH_MAX_REPS", "4"))

    def timed(name: str, fn):
        # per-query best-of-N: this host carries bursty invisible
        # neighbor load (measured 4× swings within minutes); min wall
        # time is the least-interference estimate of the engine's cost.
        # When the rep-to-rep spread says a rep was hit by neighbor load
        # (max/min > 1.4), extra reps run (up to max_reps) so one noisy
        # window can't double the headline number — the r2 driver
        # snapshot regressed ~2× on every query simultaneously purely
        # from ambient load. Per-REP load-avg is recorded so a single
        # noisy rep is attributable in the artifact (r3 verdict #10).
        times: list[float] = []
        loads: list[list[float]] = []
        out = None
        while True:
            t0 = time.perf_counter()
            out = fn()
            times.append(time.perf_counter() - t0)
            loads.append([round(x, 2) for x in os.getloadavg()])
            if len(times) >= reps and (
                len(times) >= max_reps
                or max(times) / min(times) <= 1.4
            ):
                break
        queries[name] = round(min(times), 3)
        rep_times[name] = [round(t, 3) for t in times]
        rep_loads[name] = loads
        return out

    # untimed warm-up (worker spawn + imports)
    forge_triples(pages_dataset(2000, rich=rich)).count()

    # 1. forge — the headline KG pipeline, from PARQUET pages (the north
    # rule's input shape). The corpus is deterministic and written once
    # (untimed; existing files are reused), so the timed run measures
    # read → extract → link → dedup-shuffle, not Python fixture
    # generation (~0.46 ms/page, slower than the parse itself).
    import ray.data as _rd

    corpus_dir = os.environ.get(
        "GRAFT_BENCH_CORPUS", f"/tmp/graft_bench_pages_{n_pages}_r{rich}"
    )
    paths = write_pages_parquet(corpus_dir, n_pages, rows_per_file=500,
                                rich=rich)
    for path in paths:  # warm the page cache like the sf tables above
        with open(path, "rb") as f:
            while f.read(1 << 22):
                pass
    n_triples = timed(
        "forge",
        lambda: forge_triples(
            _rd.read_parquet(paths, columns=["url", "html"])
        ).count(),
    )
    detail["forge"] = {
        "pages": n_pages,
        "rich": rich,
        "triples": int(n_triples),
        "pages_per_sec": round(n_pages / queries["forge"], 1),
        "triples_per_sec": round(n_triples / queries["forge"], 1),
    }

    # 2. relational / window aggregates
    timed("lineitem_agg", lambda: dq.q_lineitem_agg(sf_dir).to_pandas())
    timed("events_hourly", lambda: dq.q_events_hourly(sf_dir).to_pandas())

    # 3. dedup suite over documents
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    timed("docs_exact_dedup", lambda: exact_dedup(docs).count())
    timed("docs_minhash_lsh", lambda: len(minhash_lsh_candidates(docs)))

    # 4. similarity search
    timed("ann_topk", lambda: dq.q_ann_topk(sf_dir))

    # 4b. KG-embedding training: one full-batch TransE epoch over the
    # orders→customer graph (~sf×1.5M triples, ~sf×2.5M entities at
    # dim 16) — negatives + two entity-keyed shuffles + scatter-add
    # (round-5 model-training leg)
    import pandas as pd

    from graphforge_ray.stages.transe import (
        distinct_entities, init_embeddings, transe_epoch)

    def kg_embed():
        orders = rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey"],
        )
        trips = orders.map_batches(
            lambda df: pd.DataFrame({
                "subj": "ord:" + df["o_orderkey"].astype(str),
                "pred": "ex:placedBy",
                "obj": "cust:" + df["o_custkey"].astype(str),
            }),
            batch_format="pandas",
        ).materialize()
        e0 = init_embeddings(
            distinct_entities(trips), dim=16, salt="bench-e")
        r0 = init_embeddings(
            rd.from_pandas(pd.DataFrame({"pred": ["ex:placedBy"]})),
            dim=16, name_col="pred", salt="bench-r", normalize=False,
        ).to_pandas()
        e1, _ = transe_epoch(trips, e0, r0, lr=0.01, margin=1.0)
        return e1.count()

    n_emb = timed("kg_embed", kg_embed)
    detail["kg_embed"] = {"entities": int(n_emb), "dim": 16}

    # 5. multimodal decode throughput (pure-Python from-scratch codecs:
    # PNG inflate+filters / GIF LZW / baseline JPEG — the PIL-less
    # constraint of this container; the number exists so the next
    # round has a target to improve against, r3 verdict #9)
    n_media = int(os.environ.get("GRAFT_BENCH_MEDIA", "1200"))
    from graphforge_ray.fixtures import media_dataset
    from graphforge_ray.stages.multimodal import ImageDecoder
    from graphforge_ray.stages.proc_cache import process_cached_stage

    image_kinds = ["ppm", "pgm", "png", "gif", "jpeg", "gfimg"]

    def media_decode():
        media = media_dataset(n_media).map_batches(
            lambda df, _k=tuple(image_kinds): df[df["kind"].isin(_k)],
            batch_format="pandas",
        )
        return media.map_batches(
            process_cached_stage(ImageDecoder, data_col="payload"),
            batch_format="pandas",
        ).count()

    n_decoded = timed("media_decode", media_decode)
    detail["media_decode"] = {
        "images": int(n_decoded),
        "images_per_sec": round(n_decoded / queries["media_decode"], 1),
    }

    # 6. standing 10× scale-stress row (r4 verdict item #9): ONE
    # single-rep forge at 10× the headline corpus plus one MinHash-LSH
    # candidate pass over a 10× documents union — scale regressions
    # land in the per-round artifact instead of BASELINE prose. Kept
    # OUT of `queries`/`value` so the headline total stays comparable
    # round over round; disable with GRAFT_STRESS=0.
    if os.environ.get("GRAFT_STRESS", "1") != "0":
        stress_pages = int(
            os.environ.get("GRAFT_STRESS_PAGES", str(n_pages * 10))
        )
        sdir = os.environ.get(
            "GRAFT_STRESS_CORPUS",
            f"/tmp/graft_bench_pages_{stress_pages}_r{rich}",
        )
        spaths = write_pages_parquet(
            sdir, stress_pages, rows_per_file=2000, rich=rich
        )
        t0 = time.perf_counter()
        s_triples = forge_triples(
            _rd.read_parquet(spaths, columns=["url", "html"])
        ).count()
        s_forge = round(time.perf_counter() - t0, 3)

        def shift(df: "pd.DataFrame", k: int):
            return df.assign(doc_id=df["doc_id"] + k * 1_000_000)

        import pandas as pd  # noqa: F401 (type for the closure above)

        docs10 = docs.union(*[
            docs.map_batches(
                lambda df, _k=k: shift(df, _k), batch_format="pandas"
            )
            for k in range(1, 10)
        ])
        t0 = time.perf_counter()
        n_cand = minhash_lsh_candidates(
            docs10, as_dataset=True, dedup=True
        ).count()
        s_mh = round(time.perf_counter() - t0, 3)
        detail["scale_stress"] = {
            "pages": stress_pages,
            "forge_sec": s_forge,
            "forge_triples": int(s_triples),
            "forge_pages_per_sec": round(stress_pages / s_forge, 1),
            "minhash_docs": "10x sf documents (shifted-id union)",
            "minhash_sec": s_mh,
            "minhash_candidate_pairs": int(n_cand),
            "load_avg": [round(x, 2) for x in os.getloadavg()],
        }

    total = round(sum(queries.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "graphforge_ray headline pipelines end-to-end",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": num_cpus,
        "load_avg": {
            "ambient_start": load_start,
            "end": [round(x, 2) for x in os.getloadavg()],
        },
        "rep_times": rep_times,
        "rep_loads": rep_loads,
        **detail,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same forge job at two parallelism levels — INTERLEAVED A/B pairs,
    median-of-N (r1 verdict item 9: the sequential best-of-2 protocol
    left a 0.71-1.35 efficiency spread because host neighbor load drifted
    between the two legs; interleaving puts both legs under the same
    load, and per-PAIR efficiencies expose the spread honestly)."""
    lo, hi = (
        int(os.environ.get("GRAFT_SCALE_LO", "4")),
        int(os.environ.get("GRAFT_SCALE_HI", "16")),
    )
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "3"))

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_FORGE_ONLY="1",
            # scaling corpus: large enough that parse/link/shuffle compute
            # dominates fixed session overheads (actor spin-up, barriers)
            GRAFT_BENCH_PAGES=os.environ.get("GRAFT_SCALE_PAGES", "120000"),
            GRAFT_BENCH_RICH=os.environ.get("GRAFT_SCALE_RICH", "16"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    pairs = []
    for _ in range(reps):
        r_lo = one(lo)   # A/B interleave: lo then hi under the same
        r_hi = one(hi)   # ambient load window
        pairs.append((r_lo, r_hi))

    def med(vals):
        vals = sorted(vals)
        return vals[len(vals) // 2]

    effs = [
        (p[1]["forge"]["pages_per_sec"] / p[0]["forge"]["pages_per_sec"])
        / (hi / lo)
        for p in pairs
    ]
    thr_lo = med([p[0]["forge"]["pages_per_sec"] for p in pairs])
    thr_hi = med([p[1]["forge"]["pages_per_sec"] for p in pairs])
    sec_lo = med([p[0]["queries"]["forge"] for p in pairs])
    sec_hi = med([p[1]["queries"]["forge"] for p in pairs])
    return {
        "metric": "forge throughput scaling",
        "unit": "pages/sec",
        "protocol": f"interleaved A/B, median of {reps} pairs",
        f"cpus_{lo}": {"sec": sec_lo, "pages_per_sec": thr_lo},
        f"cpus_{hi}": {"sec": sec_hi, "pages_per_sec": thr_hi},
        "scaling_efficiency": round(med(effs), 3),
        "efficiency_per_pair": [round(e, 3) for e in effs],
        "efficiency_spread": round(max(effs) - min(effs), 3),
        "load_avg_per_pair": [
            [p[0].get("load_avg", {}).get("ambient_start"),
             p[1].get("load_avg", {}).get("ambient_start")]
            for p in pairs
        ],
        "pages": pairs[0][1]["forge"]["pages"],
        "rich": pairs[0][1]["forge"]["rich"],
        "triples": pairs[0][1]["forge"]["triples"],
    }


def run_forge_only() -> dict:
    """Internal: forge pipeline only (used by --scaling child runs)."""
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("GRAFT_BENCH_PAGES", "60000"))
    rich = int(os.environ.get("GRAFT_BENCH_RICH", "8"))
    load_start = [round(x, 2) for x in os.getloadavg()]

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from graphforge_ray.fixtures import pages_dataset
    from graphforge_ray.pipelines.forge import forge_triples

    # untimed warm-up: spawns the worker processes and pays the one-time
    # library imports so the measurement reflects steady-state throughput
    forge_triples(pages_dataset(2000, rich=rich)).count()

    t0 = time.perf_counter()
    n_triples = forge_triples(pages_dataset(n_pages, rich=rich)).count()
    dt = round(time.perf_counter() - t0, 3)
    result = {
        "metric": "forge", "value": dt, "unit": "sec",
        "queries": {"forge": dt},
        "sf": 0.1, "num_cpus": num_cpus,
        "load_avg": {"ambient_start": load_start,
                     "end": [round(x, 2) for x in os.getloadavg()]},
        "forge": {
            "pages": n_pages, "rich": rich, "triples": int(n_triples),
            "pages_per_sec": round(n_pages / dt, 1),
            "triples_per_sec": round(n_triples / dt, 1),
        },
    }
    ray.shutdown()
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif os.environ.get("GRAFT_BENCH_FORGE_ONLY"):
        print(json.dumps(run_forge_only()))
    else:
        print(json.dumps(run_bench()))
