"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — baseline: per-batch numpy matmul of the
  normalized corpus block against a BROADCAST query matrix (``ray.put``
  once; per-task ``ray.get`` is a zero-copy local read, never re-shipped
  over the network), per-batch partial top-k, tiny driver-side merge.
  One pass, no shuffle, stateless tasks by default (parallelism = block
  count; an actor pool is opt-in via ``concurrency`` for heavy query
  matrices).
* ``ivf_topk`` — scale path: IVF-style coarse quantizer. Centroids are
  trained once on a sample (deterministic k-means), each vector is
  assigned map-side to its nearest centroid (cluster id column →
  partition pruning); queries probe only ``nprobe`` nearest clusters, so
  the scan touches a fraction of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

__all__ = [
    "brute_force_topk", "train_centroids", "assign_clusters", "ivf_topk",
    "kmeans_fit", "group_centroids",
    "quantize_embeddings", "quantized_topk",
]


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class _BlockScorer:
    """Actor: holds the normalized query matrix; emits per-batch top-k."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        mat = _normalize(np.asarray(df[self.vec_col].tolist(), dtype=np.float64))
        sims = mat @ self.q.T  # (batch, n_queries)
        frames = []
        ids = df[self.id_col].to_numpy()
        for qi in range(self.q.shape[0]):
            col = sims[:, qi]
            k = min(self.k, len(col))
            top = np.argpartition(-col, k - 1)[:k]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": qi,
                        self.id_col: ids[top],
                        "cosine": np.round(col[top], 6),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)


def brute_force_topk(
    embeddings: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int | tuple[int, int] | None = None,
    distributed_merge: bool | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k for each query row →
    (query_id, id_col, cosine), sorted by (query_id, -cosine, id).

    Default is STATELESS TASKS closing over the broadcast query matrix
    (``ray.put`` once; ``ray.get`` per task is a local shared-memory read
    and normalization of the small matrix is trivial) — parallelism then
    equals block count with no actor-pool spin-up, which is what a small
    or medium corpus needs. Pass ``concurrency`` to force an actor pool
    (``_BlockScorer``) for huge query matrices where per-actor setup is
    worth amortizing.

    The driver frame is the MERGED result. With few queries the ≤
    k·blocks·queries partial rows collect and merge driver-side (no
    shuffle). At many-query × many-block scale that frame is itself
    corpus-shaped, so ``distributed_merge`` (auto above ~100k estimated
    partial rows, or forced via the flag) first reduces partials to ≤ k
    rows per query in a ``groupby(query_id)`` shuffle — the driver then
    receives at most k·queries rows regardless of block count."""
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(queries)
    if concurrency is not None:
        scored = embeddings.map_batches(
            _BlockScorer,
            batch_format="pandas",
            concurrency=concurrency,
            fn_constructor_kwargs={
                "queries_ref": q_ref, "k": k,
                "id_col": id_col, "vec_col": vec_col,
            },
        )
    else:
        def score_batch(df: pd.DataFrame) -> pd.DataFrame:
            scorer = _BlockScorer(q_ref, k, id_col, vec_col)
            return scorer(df)

        scored = embeddings.map_batches(score_batch, batch_format="pandas")

    if distributed_merge is None:
        try:
            n_blocks = embeddings.num_blocks()
        except Exception:
            n_blocks = None
        est = (n_blocks or 64) * len(queries) * k
        distributed_merge = est > 100_000
    if distributed_merge:
        # per-query tree merge in the cluster: each query's partials
        # co-locate in one shuffle group and reduce to its final top-k,
        # so the driver never sees a blocks-proportional frame
        def merge_group(g: pd.DataFrame) -> pd.DataFrame:
            return g.sort_values(
                ["cosine", id_col], ascending=[False, True]
            ).head(k)

        scored = scored.groupby("query_id").map_groups(
            merge_group, batch_format="pandas"
        )
    partials = scored.to_pandas()  # ≤ k rows per (batch|query, query)
    out = (
        partials.sort_values(
            ["query_id", "cosine", id_col], ascending=[True, False, True]
        )
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return out


# ---------------------------------------------------------------------------
# IVF (coarse-quantized) variant
# ---------------------------------------------------------------------------

def _bounded_sample(
    embeddings: "ray.data.Dataset",
    cap: int,
    seed: int,
    vec_col: str,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Deterministic sample of ≤ ``cap`` vectors. The fraction is derived
    from the corpus row count (parquet-metadata-cheap) so the driver NEVER
    materializes the full embedding table; ``limit(cap)`` is a hard bound
    even when the fraction estimate overshoots."""
    if sample_fraction is None:
        n = embeddings.count()
        # 1.3× headroom so the limit(cap) is actually reached w.h.p.
        sample_fraction = min(1.0, (cap * 1.3) / max(n, 1))
    sample_ds = (
        embeddings
        if sample_fraction >= 1.0
        else embeddings.random_sample(sample_fraction, seed=seed)
    ).limit(cap)
    return np.asarray(sample_ds.to_pandas()[vec_col].tolist(), dtype=np.float64)


def train_centroids(
    embeddings: "ray.data.Dataset",
    num_clusters: int = 16,
    sample_fraction: float | None = None,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    max_sample: int | None = None,
) -> np.ndarray:
    """Deterministic mini k-means on a BOUNDED sample (driver-side numpy
    over ≤ ``max_sample`` vectors — default ``max(64·k, 4096)``; the
    corpus itself streams and is never materialized on the driver)."""
    cap = max_sample if max_sample is not None else max(64 * num_clusters, 4096)
    sample = _bounded_sample(embeddings, cap, seed, vec_col, sample_fraction)
    sample = _normalize(sample)
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(num_clusters, len(sample)), replace=False)
    centroids = sample[np.sort(idx)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def assign_clusters(
    embeddings: "ray.data.Dataset",
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Map-side cluster assignment (adds ``cluster`` column). Broadcast
    centroids via ray.put; stateless tasks (the per-task ``ray.get`` is a
    local shared-memory read — no pool spin-up, parallelism = blocks)."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = _normalize(ray.get(c_ref))
        mat = _normalize(np.asarray(df[vec_col].tolist(), dtype=np.float64))
        out = df.copy()
        out["cluster"] = np.argmax(mat @ c.T, axis=1).astype("int32")
        return out

    return embeddings.map_batches(assign, batch_format="pandas")


def kmeans_fit(
    embeddings: "ray.data.Dataset",
    num_clusters: int,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, list[float]]:
    """Fully DISTRIBUTED spherical k-means (Lloyd's) — the SemDeDup-style
    semantic-clustering primitive. Unlike ``train_centroids`` (driver
    numpy over a bounded sample), every iteration here streams the WHOLE
    corpus:

    - init: the vectors of the ``num_clusters`` smallest ids, found with
      a map-side partial-nsmallest combiner (the driver sees ≤ k rows
      per block, never the corpus);
    - each round: centroids broadcast via ``ray.put``; each batch
      assigns vectors by max cosine (ties → lowest cluster index) and
      emits ONE partial row per cluster (count, vector sum, cosine sum)
      — k rows per block leave each task, nothing corpus-sized moves;
    - the driver reduces the ≤ k·blocks partials to k×d new centroids
      (renormalized — spherical k-means); an emptied cluster keeps its
      previous centroid.

    Returns ``(centroids (k, d) float64, inertia_per_iter)`` where
    inertia = mean(1 − cosine-to-assigned-centroid) — non-increasing up
    to float noise."""
    # materialize ONCE: the seed pass plus every Lloyd iteration
    # re-consumes `embeddings`; lazy datasets re-run their upstream
    # pipeline per consumer, so without this the parquet read / map
    # chain executes iters+1 times. Blocks land in the object store
    # (spill-backed) and each round streams from there.
    embeddings = embeddings.materialize()

    # --- deterministic init: vectors of the k smallest ids -----------
    def head_batch(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(num_clusters, id_col)[[id_col, vec_col]]

    seed_rows = (
        embeddings.map_batches(head_batch, batch_format="pandas")
        .to_pandas()
        .nsmallest(num_clusters, id_col)
        .sort_values(id_col)
    )
    centroids = _normalize(
        np.asarray(seed_rows[vec_col].tolist(), dtype=np.float64)
    )
    k = centroids.shape[0]
    inertia: list[float] = []

    for _ in range(iters):
        c_ref = ray.put(centroids)

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(c_ref)
            mat = _normalize(
                np.asarray(df[vec_col].tolist(), dtype=np.float64)
            )
            sims = mat @ c.T
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(mat)), assign]
            rows = []
            for ci in np.unique(assign):
                m = assign == ci
                rows.append(
                    {
                        "cluster": int(ci),
                        "n": int(m.sum()),
                        "vsum": mat[m].sum(axis=0).tolist(),
                        "cos_sum": float(best[m].sum()),
                    }
                )
            return pd.DataFrame(rows)

        part = embeddings.map_batches(
            partials, batch_format="pandas"
        ).to_pandas()  # ≤ k rows per block — driver-safe at any scale
        agg_n = np.zeros(k)
        agg_v = np.zeros_like(centroids)
        total_cos = 0.0
        total_n = 0
        # sum in cluster-then-block order for a reproducible reduce
        for ci, g in part.sort_values("cluster").groupby("cluster"):
            agg_n[ci] = g["n"].sum()
            agg_v[ci] = np.sum(
                np.asarray(g["vsum"].tolist(), dtype=np.float64), axis=0
            )
            total_cos += float(g["cos_sum"].sum())
            total_n += int(g["n"].sum())
        inertia.append(1.0 - total_cos / max(total_n, 1))
        nxt = centroids.copy()  # emptied cluster keeps its centroid
        nz = agg_n > 0
        nxt[nz] = agg_v[nz] / agg_n[nz, None]
        centroids = _normalize(nxt)
    return centroids, inertia


def ivf_topk(
    assigned: "ray.data.Dataset",
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Approximate top-k: scan only the ``nprobe`` clusters nearest each
    query (vectorized filter prunes blocks map-side before scoring)."""
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qn = _normalize(queries)
    cn = _normalize(np.asarray(centroids, dtype=np.float64))
    probe = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted = sorted({int(c) for row in probe for c in row})
    pruned = assigned.filter(
        expr=f"cluster in {wanted}"
    )
    result = brute_force_topk(pruned, queries, k, id_col, vec_col)
    return result


def group_centroids(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    group_col: str = "label",
    num_buckets: int = 8,
) -> "ray.data.Dataset":
    """Mean embedding vector per group → long-form Dataset
    (group, dim, value) with dim 0-based — the shape an SQL oracle can
    replay via unnest + generate_subscripts, and the input to semantic
    drift / cluster-quality monitoring over a curated corpus.

    Scale shape: per-batch partial sums (vectors stacked to one float64
    matrix, per-group reduction via sort + ``np.add.reduceat`` — no
    Python per-row work), emitting G×D narrow partial rows per batch;
    ONE bucket shuffle keyed on (group, dim); per-bucket vectorized
    sum-of-sums ÷ sum-of-counts. The corpus of vectors never moves —
    only per-batch partials do."""
    from ..shuffle import pair_bucket_tag

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"group": [], "dim": [], "s": [], "c": []}
            )
        mat = np.vstack(df[vec_col].to_numpy()).astype(np.float64)
        g = df[group_col].to_numpy()
        order = np.argsort(g, kind="stable")
        gs = g[order]
        starts = np.flatnonzero(
            np.concatenate(([True], gs[1:] != gs[:-1]))
        )
        sums = np.add.reduceat(mat[order], starts, axis=0)
        counts = np.diff(np.append(starts, len(gs)))
        n_groups, d = sums.shape
        out = pd.DataFrame(
            {
                "group": np.repeat(gs[starts], d),
                "dim": np.tile(np.arange(d, dtype=np.int64), n_groups),
                "s": sums.ravel(),
                "c": np.repeat(counts.astype(np.int64), d),
            }
        )
        return out.assign(
            _bucket=pair_bucket_tag(out, ["group", "dim"], num_buckets)
        )

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["group", "dim"], as_index=False).agg(
            s=("s", "sum"), c=("c", "sum")
        )
        return pd.DataFrame(
            {
                "group": out["group"],
                "dim": out["dim"].astype(np.int64),
                "value": out["s"] / out["c"],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def quantize_embeddings(
    embeddings: "ray.data.Dataset",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Per-vector symmetric int8 quantization: ``q_emb`` (list<int8>,
    round(x · 127 / max|x|)) + ``q_scale`` (float64, max|x| / 127) —
    4× less object-store/network volume per vector on the 100-TB scale
    path, at the cost of ≤ 1/254 relative per-component error.
    All-zero vectors quantize to zeros with scale 0. Pure map-side."""

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        amax = np.abs(m).max(axis=1)
        scale = amax / 127.0
        safe = np.where(scale > 0, scale, 1.0)
        q = np.clip(
            np.round(m / safe[:, None]), -127, 127
        ).astype(np.int8)
        out = df.drop(columns=[vec_col]).copy()
        out["q_emb"] = list(q)
        out["q_scale"] = scale
        return out

    return embeddings.map_batches(quant, batch_format="pandas")


def quantized_topk(
    quantized: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact cosine top-k over int8-QUANTIZED vectors (the memory-bound
    scale path: dot products run on the dequantized int8 grid —
    q_doc · q_query · scale_doc · scale_query — so only int8 payloads
    move through the object store). → (rank, vec_id, cosine) like
    ``brute_force_topk``; cosine is the QUANTIZED-grid value, within
    ~1% of the float value (recall pinned by pytest)."""
    qv = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(qv)
    if qn == 0:
        raise ValueError("zero query vector")
    qv = qv / qn
    import ray as _ray

    q_ref = _ray.put(qv)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        q = _ray.get(q_ref)
        m = np.stack(df["q_emb"].to_numpy()).astype(np.float64)
        m *= df["q_scale"].to_numpy()[:, None]
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        cos = (m @ q) / norms
        out = pd.DataFrame({id_col: df[id_col], "cosine": cos})
        return out.sort_values(
            ["cosine", id_col], ascending=[False, True]
        ).head(k)

    parts = quantized.map_batches(score, batch_format="pandas").to_pandas()
    top = parts.sort_values(
        ["cosine", id_col], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return top
