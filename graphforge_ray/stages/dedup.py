"""Deduplication operators for web-scale corpora.

Exact + near-dup family over a documents table ``(doc_id, text, ...)``:

* ``exact_dedup``            — md5 content hash → hash-partitioned groupby,
                               keep min doc_id (SQL-oracle-able)
* ``minhash_lsh_candidates`` — shingle → minhash → band → bucket groupby →
                               candidate pairs → Jaccard verify
* ``minhash_dedup``          — candidates → connected components (min-label
                               propagation) → survivors
* ``simhash_batch``          — 64-bit simhash; near-dup = small Hamming
                               distance, bucketed by bit-bands
* ``ngram_jaccard``          — exact n-gram Jaccard verification kernel
* ``embedding_neardup``      — cosine near-dup over an embedding column
                               (normalized matmul within hash buckets)

Scale notes (how each behaves at 100 TB):
- shingling/minhashing is map-side vectorized numpy per batch;
- the ONLY all-to-all exchange is the (band_id, band_hash) groupby whose
  rows are 3 ints + doc_id — narrow;
- candidate pairs are verified pairwise only within buckets (bucket size
  is bounded by design: identical-band groups are near-dup clusters);
- connected components run min-label propagation as iterated groupbys —
  driver only sees the final label table when asked for survivors.

All hashing is keyed blake2b / fixed-key pandas hashing — deterministic
across processes (Python's builtin ``hash`` is per-process salted and is
never used).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

import ray
import ray.data
from ray.data.aggregate import Min

from .text_analysis import content_hash_batch

__all__ = [
    "exact_dedup", "shingle_minhash_batch", "minhash_lsh_candidates",
    "minhash_dedup", "simhash_batch", "simhash_neardup_candidates",
    "ngram_jaccard", "embedding_neardup",
]

_TOKEN = re.compile(r"\w+")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Keep exactly one row (min id) per distinct text. Map-side
    within-batch pre-dedup is the combiner (a document repeated millions of
    times collapses to ≤1 row per batch); the reduce side hash-partitions
    the md5 content hash into coarse buckets and dedups each with one
    vectorized kernel — uniform keys, no skew, no per-key Python reduce."""
    hashed = docs.map_batches(
        lambda df: content_hash_batch(df, text_col)[[id_col, "content_hash"]]
        .sort_values(id_col)
        .drop_duplicates("content_hash", keep="first")
        .assign(
            _bucket=lambda d: (
                pd.util.hash_array(
                    d["content_hash"].to_numpy(dtype=object),
                    hash_key="graphforge-dedup!"[:16],
                )
                % num_buckets
            ).astype("int32")
        ),
        batch_format="pandas",
    )

    def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).drop_duplicates("content_hash", keep="first")
        return g[["content_hash", id_col]]

    return hashed.groupby("_bucket").map_groups(bucket_min, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)  # fixed seed → identical on all workers
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _shingles(text: str, k: int) -> np.ndarray:
    """Word k-gram shingle hashes (uint64)."""
    toks = _TOKEN.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(g.encode(), digest_size=8).digest(), "big"
            )
            for g in set(grams)
        ),
        dtype=np.uint64,
    )


def shingle_minhash_batch(
    df: pd.DataFrame,
    num_perm: int = 64,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """→ one row per doc: (doc_id, sig) where sig is the uint64[num_perm]
    minhash signature (kept as a list column)."""
    a, b = _perm_params(num_perm)
    ids, sigs = [], []
    for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
        sh = _shingles(text, shingle_k)
        if len(sh) == 0:
            sig = np.full(num_perm, _MERSENNE, dtype=np.uint64)
        else:
            # (a*x + b) mod p, min over shingles — vectorized outer product
            vals = (
                sh[None, :] * a[:, None] + b[:, None]
            ) % np.uint64(_MERSENNE)
            sig = vals.min(axis=1)
        ids.append(doc_id)
        sigs.append(sig.tolist())
    return pd.DataFrame({id_col: ids, "sig": sigs})


def _band_rows(
    sig_df: pd.DataFrame, num_bands: int, id_col: str = "doc_id"
) -> pd.DataFrame:
    """Explode signatures to (band_id, band_hash, doc_id) rows."""
    out_band, out_hash, out_id = [], [], []
    for doc_id, sig in zip(sig_df[id_col], sig_df["sig"]):
        sig = np.asarray(sig, dtype=np.uint64)
        rows_per_band = len(sig) // num_bands
        for band in range(num_bands):
            chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            out_band.append(band)
            out_hash.append(h)
            out_id.append(doc_id)
    return pd.DataFrame(
        {"band_id": out_band, "band_hash": out_hash, id_col: out_id}
    )


def minhash_lsh_candidates(
    docs: "ray.data.Dataset",
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """→ candidate pair DataFrame (id_a < id_b) from LSH bucket collisions.

    Shuffle profile: one groupby on (band_id, band_hash) over narrow rows.
    Pair explosion inside a bucket is quadratic — buckets ARE near-dup
    groups so their size is naturally bounded; a defensive cap drops
    degenerate buckets (e.g. empty-text collisions) with a warning row
    rather than exploding.
    """
    sigs = docs.map_batches(
        lambda df: shingle_minhash_batch(df, num_perm, shingle_k, id_col, text_col),
        batch_format="pandas",
    )
    bands = sigs.map_batches(
        lambda df: _band_rows(df, num_bands, id_col), batch_format="pandas"
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group[id_col]))
        if len(ids) < 2 or len(ids) > 200:  # degenerate-bucket cap
            return pd.DataFrame({"id_a": [], "id_b": []})
        pairs = [(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]]
        return pd.DataFrame(pairs, columns=["id_a", "id_b"])

    pairs = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"id_a": [], "id_b": []})
    return pairs.drop_duplicates().reset_index(drop=True)


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard similarity (verification kernel)."""
    a = set(_shingles(text_a, k).tolist())
    b = set(_shingles(text_b, k).tolist())
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def minhash_dedup(
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Full near-dup pipeline → Dataset (doc_id, cluster_id, keep).

    cluster_id = min doc_id of the connected component (union-find on the
    verified candidate pairs — the pair set is LSH-pruned and small
    relative to the corpus; components computed driver-side, the full
    label table produced distributed via broadcast lookup; only candidate
    texts ever reach the driver).
    """
    candidates = minhash_lsh_candidates(
        docs, num_perm, num_bands, shingle_k, id_col, text_col
    )
    # Fetch ONLY the candidate docs' texts (broadcast id-set, map-side
    # filter) — the full corpus never reaches the driver; the candidate
    # set is LSH-pruned and small by construction.
    cand_ids = set(candidates.get("id_a", [])) | set(candidates.get("id_b", []))
    ids_ref = ray.put(cand_ids)

    def keep_candidates(df: pd.DataFrame) -> pd.DataFrame:
        wanted = ray.get(ids_ref)
        return df.loc[df[id_col].isin(wanted), [id_col, text_col]]

    texts = (
        docs.map_batches(keep_candidates, batch_format="pandas")
        .to_pandas()
        .set_index(id_col)[text_col]
        .to_dict()
        if cand_ids
        else {}
    )

    verified = [
        (a, b)
        for a, b in zip(candidates.get("id_a", []), candidates.get("id_b", []))
        if ngram_jaccard(texts.get(a, ""), texts.get(b, ""), shingle_k)
        >= threshold
    ]

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx

    for a, b in verified:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)

    # labels exist only for docs in verified components (small); the full
    # per-doc label table is produced DISTRIBUTED via a broadcast lookup —
    # non-candidate docs are their own cluster.
    labels = {i: find(i) for i in parent}
    labels_ref = ray.put(labels)

    def label_batch(df: pd.DataFrame) -> pd.DataFrame:
        lab = ray.get(labels_ref)
        out = df[[id_col]].copy()
        out["cluster_id"] = out[id_col].map(lambda i: lab.get(i, i))
        out["keep"] = out[id_col] == out["cluster_id"]
        return out

    return docs.map_batches(label_batch, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(
    df: pd.DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> pd.DataFrame:
    """64-bit SimHash per document (token-hash bit-vote), plus the four
    16-bit bands used for near-dup bucketing."""
    ids, hashes = [], []
    for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
        toks = _TOKEN.findall(text.lower())
        votes = np.zeros(64, dtype=np.int64)
        for tok in toks:
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
            )
            bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            votes += np.where(bits == 1, 1, -1)
        sh = int("".join("1" if v > 0 else "0" for v in votes[::-1]), 2)
        ids.append(doc_id)
        hashes.append(sh)
    out = pd.DataFrame({id_col: ids})
    out["simhash"] = np.array(hashes, dtype=np.uint64)
    for band in range(4):
        out[f"band{band}"] = np.array(
            [(h >> (band * 16)) & 0xFFFF for h in hashes], dtype=np.uint32
        )
    return out


def simhash_neardup_candidates(
    docs: "ray.data.Dataset",
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Near-dup pairs by SimHash: two docs within ``max_hamming ≤ 3`` bits
    share at least one identical 16-bit band (pigeonhole over 4 bands) →
    groupby each band, verify Hamming distance within buckets."""
    sh = docs.map_batches(
        lambda df: simhash_batch(df, id_col, text_col), batch_format="pandas"
    )
    frames = []
    for band in range(4):
        def pairs(group: pd.DataFrame, _band=band) -> pd.DataFrame:
            rows = list(zip(group[id_col], group["simhash"]))
            if len(rows) < 2 or len(rows) > 200:
                return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
            out = []
            for i, (ia, ha) in enumerate(rows):
                for ib, hb in rows[i + 1 :]:
                    d = int(bin(int(ha) ^ int(hb)).count("1"))
                    if d <= max_hamming:
                        out.append((min(ia, ib), max(ia, ib), d))
            return pd.DataFrame(out, columns=["id_a", "id_b", "hamming"])

        frames.append(
            sh.groupby(f"band{band}")
            .map_groups(pairs, batch_format="pandas")
            .to_pandas()
        )
    allp = pd.concat(frames, ignore_index=True)
    if allp.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    return (
        allp.sort_values("hamming")
        .drop_duplicates(["id_a", "id_b"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup(
    embeddings: "ray.data.Dataset",
    threshold: float = 0.95,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> pd.DataFrame:
    """Cosine near-dup via random-hyperplane LSH buckets: bucket key =
    sign pattern of ``num_planes`` fixed random projections; exact cosine
    verified within buckets (normalized matmul). → (id_a, id_b, cosine)."""
    rng = np.random.RandomState(seed)
    planes_holder: dict[str, np.ndarray] = {}

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.asarray(df[vec_col].tolist(), dtype=np.float64)
        if mat.size == 0:
            return pd.DataFrame({id_col: [], "bucket": [], vec_col: []})
        if "p" not in planes_holder:
            r = np.random.RandomState(seed)
            planes_holder["p"] = r.standard_normal((mat.shape[1], num_planes))
        proj = mat @ planes_holder["p"]
        bits = (proj > 0).astype(np.uint8)
        bucket = [
            int.from_bytes(np.packbits(row).tobytes(), "big")
            for row in bits
        ]
        out = df[[id_col]].copy()
        out["bucket"] = bucket
        out[vec_col] = df[vec_col]
        return out

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2 or len(group) > 500:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        mat = np.asarray(group[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        sims = mat @ mat.T
        ids = group[id_col].to_numpy()
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids[ia][keep], ids[ib][keep]),
                "id_b": np.maximum(ids[ia][keep], ids[ib][keep]),
                "cosine": np.round(sims[ia, ib][keep], 6),
            }
        )

    out = (
        embeddings.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    return out.drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)
