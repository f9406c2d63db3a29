"""Feature-hashing text vectorization (the "hashing trick").

Bridges the text corpus to the vector operators (ANN, k-means
clustering, near-dup, centroid drift) WITHOUT a vocabulary table: each
term hashes straight to a dimension index, so the mapping is stateless,
map-side, and identical on every node — the exact property a 100 TB
corpus needs (a learned vocab would be a giant broadcast).

Weinberger et al., "Feature Hashing for Large Scale Multitask
Learning" (ICML 2009, public): dim index = h(term) mod d, value sign
from an independent hash bit, so collisions cancel in expectation.

Everything is md5-keyed (``stages/fasthash``), so the driver oracle
replays the EXACT vectors in SQL. Output is long form (id, dim_idx,
val) — nonzero entries only, the natural shape for both SQL parity and
a downstream sparse matmul. Float parity note: term counts are
integers, so per-dimension sums and the squared-norm are EXACT in
doubles regardless of summation order; the only rounding is the final
normalize, identical on both sides (one divide), FLOOR-truncated at
1e-6 like every other float surface in the repo.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .fasthash import hex_prefix_int, md5_hex

__all__ = ["feature_hash_embed", "random_project", "projection_matrix"]

_PREFIX = 10  # 40 bits — same exact-double-int rationale as sketches


def feature_hash_embed(
    docs: "ray.data.Dataset",
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    signed: bool = True,
    normalize: bool = True,
) -> "ray.data.Dataset":
    """→ Dataset (id, dim_idx:int64, val:float64), nonzero dims only.

    Rule (SQL-replayable): for each whitespace term,
    ``dim_idx = int(md5(term)[:10], 16) % dim``; contribution is the
    term count, with sign −1 when ``int(md5('sgn:'+term)[:10], 16)`` is
    odd (``signed=True``). Per-doc L2 normalization divides by the
    exact integer squared-norm's square root; values are then
    FLOOR-truncated at 1e-6. Docs with no terms (or all-cancelled
    vectors) emit no rows."""
    if dim < 1:
        raise ValueError(f"dim must be ≥ 1: {dim}")

    def embed(df: pd.DataFrame) -> pd.DataFrame:
        words = df[text_col].fillna("").str.findall(r"\S+")
        ex = words.explode().dropna()
        if ex.empty:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=df[id_col].dtype),
                 "dim_idx": pd.Series([], dtype=np.int64),
                 "val": pd.Series([], dtype=np.float64)}
            )
        terms = ex.to_numpy(dtype=object)
        # hash each DISTINCT term once, then scatter (batch vocab ≪ rows)
        uniq, inv = np.unique(terms, return_inverse=True)
        idx_u = (
            hex_prefix_int(md5_hex(uniq), _PREFIX) % dim
        ).astype(np.int64)
        if signed:
            sgn_u = np.where(
                hex_prefix_int(
                    md5_hex(np.array(["sgn:" + t for t in uniq],
                                     dtype=object)),
                    _PREFIX,
                ) % 2 == 0,
                1.0, -1.0,
            )
        else:
            sgn_u = np.ones(len(uniq), np.float64)
        g = (
            pd.DataFrame(
                {
                    id_col: df[id_col].reindex(ex.index).to_numpy(),
                    "dim_idx": idx_u[inv],
                    "val": sgn_u[inv],
                }
            )
            .groupby([id_col, "dim_idx"], as_index=False)["val"].sum()
        )
        g = g[g["val"] != 0.0]
        if normalize and len(g):
            # integer-valued sums → exact squared norm in double
            sq = g["val"] ** 2
            nrm = np.sqrt(sq.groupby(g[id_col]).transform("sum"))
            g["val"] = np.floor(g["val"] / nrm * 1e6) / 1e6
        g["dim_idx"] = g["dim_idx"].astype(np.int64)
        g["val"] = g["val"].astype(np.float64)
        return g

    return docs.map_batches(embed, batch_format="pandas")


def projection_matrix(in_dim: int, out_dim: int) -> np.ndarray:
    """Deterministic ±1 random-projection matrix (in_dim × out_dim).

    Achlioptas, "Database-friendly random projections" (JCSS 2003,
    public): ±1 entries preserve pairwise distances in expectation
    exactly like Gaussian entries. Entry sign comes from
    ``md5('rp:{i}:{j}')`` so every node — and the SQL oracle —
    regenerates the SAME matrix with no randomness to ship."""
    i = np.repeat(np.arange(in_dim), out_dim)
    j = np.tile(np.arange(out_dim), in_dim)
    keys = np.array(
        [f"rp:{a}:{b}" for a, b in zip(i, j)], dtype=object
    )
    bits = hex_prefix_int(md5_hex(keys), _PREFIX) % 2
    return np.where(bits == 0, 1.0, -1.0).reshape(in_dim, out_dim)


def random_project(
    embeddings: "ray.data.Dataset",
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """→ Dataset (id, dim_idx:int64, val:float64): each vector mapped
    to ``x @ R / sqrt(out_dim)`` with the deterministic ±1 matrix, in
    long form, FLOOR-truncated at 1e-6.

    Float-parity rule: inputs are first QUANTIZED to the 2⁻²⁰ grid
    (``floor(v · 2²⁰ + 0.5)``, half-up — identical formula in SQL), so
    each projected sum is a sum of INTEGERS, exact in doubles in any
    order; the only rounding after that is the shared single-op
    divide/sqrt/floor chain. Without quantization, numpy's pairwise
    matmul and SQL's sequential SUM can floor to adjacent 1e-6 grid
    values — a latent contract-gate flake.

    Map-side only — the matrix is rebuilt per actor process from the
    md5 rule (in_dim × out_dim scalars), nothing is shipped or
    shuffled; the natural pre-step that makes brute-force ANN and
    near-dup kernels 4× cheaper at 100 TB."""
    if out_dim < 1:
        raise ValueError(f"out_dim must be ≥ 1: {out_dim}")
    cache: dict[int, np.ndarray] = {}
    Q = float(1 << 20)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=df[id_col].dtype),
                 "dim_idx": pd.Series([], dtype=np.int64),
                 "val": pd.Series([], dtype=np.float64)}
            )
        x = np.stack(
            [np.asarray(v, dtype=np.float64) for v in df[vec_col]]
        )
        x = np.floor(x * Q + 0.5)  # exact ints in doubles
        in_dim = x.shape[1]
        r = cache.get(in_dim)
        if r is None:
            r = cache[in_dim] = projection_matrix(in_dim, out_dim)
        y = np.floor(
            x @ r / Q / np.sqrt(float(out_dim)) * 1e6
        ) / 1e6
        n = len(df)
        return pd.DataFrame(
            {
                id_col: np.repeat(df[id_col].to_numpy(), out_dim),
                "dim_idx": np.tile(
                    np.arange(out_dim, dtype=np.int64), n
                ),
                "val": y.ravel(),
            }
        )

    return embeddings.map_batches(project, batch_format="pandas")
