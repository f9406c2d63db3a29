"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — baseline: per-batch numpy matmul of the
  normalized corpus block against a BROADCAST query matrix (``ray.put``
  once, fetched per actor in ``__init__``, never re-shipped per batch),
  per-batch partial top-k, tiny driver-side merge. One pass, no shuffle.
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

__all__ = ["brute_force_topk", "train_centroids", "assign_clusters", "ivf_topk"]


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
    concurrency: int | tuple[int, int] = (1, 4),
) -> pd.DataFrame:
    """Exact cosine top-k for each query row →
    (query_id, id_col, cosine), sorted by (query_id, -cosine, id)."""
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(queries)
    partials = embeddings.map_batches(
        _BlockScorer,
        batch_format="pandas",
        concurrency=concurrency,
        fn_constructor_kwargs={
            "queries_ref": q_ref, "k": k, "id_col": id_col, "vec_col": vec_col,
        },
    ).to_pandas()  # ≤ k rows per (batch, query) — small
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

def train_centroids(
    embeddings: "ray.data.Dataset",
    num_clusters: int = 16,
    sample_fraction: float = 1.0,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic mini k-means on a sample (driver-side numpy; the
    sample is bounded, the corpus itself streams)."""
    sample_ds = (
        embeddings if sample_fraction >= 1.0
        else embeddings.random_sample(sample_fraction, seed=seed)
    )
    sample = np.asarray(
        sample_ds.to_pandas()[vec_col].tolist(), dtype=np.float64
    )
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
    centroids via ray.put."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    class Assigner:
        def __init__(self):
            self.c = _normalize(ray.get(c_ref))

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mat = _normalize(np.asarray(df[vec_col].tolist(), dtype=np.float64))
            out = df.copy()
            out["cluster"] = np.argmax(mat @ self.c.T, axis=1).astype("int32")
            return out

    return embeddings.map_batches(
        Assigner, batch_format="pandas", concurrency=(1, 4)
    )


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
