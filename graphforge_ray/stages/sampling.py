"""Deterministic sampling / splitting for training-data pipelines.

``hash_split`` assigns every row to train/test by a keyed md5 of its id —
a pure function of (key, salt), so the split is REPRODUCIBLE across runs,
processes and cluster sizes (never ``random_sample`` for persistent
splits: resharding would reassign rows), and rows added later don't
perturb existing assignments (the property that matters when a 100 TB
corpus grows incrementally). Map-side only — no shuffle.

The assignment rule is intentionally SQL-expressible (md5 hex prefix
compared against a threshold) so the split is oracle-checkable:

    bucket = md5(str(key) + ':' + salt)[:4]   # 16-bit hex
    test   = bucket < format(int(65536 * pct / 100), '04x')

(valid for 0 < pct < 100; the boundary percentages are clamped — see
``_threshold_hex`` — because pct=100 would format a 5-char threshold
that breaks the 4-char lexicographic compare).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from .fasthash import hex_prefix_int, md5_hex, md5_hex_keyed

__all__ = ["hash_split_column", "hash_split", "deterministic_shuffle",
           "pack_sequences", "budget_select", "stratified_sample",
           "source_mixture", "negative_sample", "global_rank",
           "grouped_rank", "weighted_sample"]


def _threshold_hex(test_pct: float) -> str:
    """4-hex-char threshold; boundary pcts are clamped so the 4-char
    lexicographic compare stays valid (pct=100 would otherwise format as
    5-char '10000' and send everything to train)."""
    t = int(65536 * test_pct / 100.0)
    if t <= 0:
        return "0000"   # bucket < '0000' is never true → all train
    if t >= 65536:
        return "zzzz"   # every hex bucket < 'zzzz' → all test
    return format(t, "04x")


def hash_split_column(
    df: pd.DataFrame,
    key_col: str = "doc_id",
    test_pct: float = 10.0,
    salt: str = "graft-split",
) -> pd.DataFrame:
    """map_batches body: adds a ``split`` column ('train' | 'test').
    Vectorized md5 (fasthash); the 'U4' cast is a C-speed first-4-chars
    slice, compared lexicographically against the hex threshold —
    exactly the SQL ``substr(md5(...), 1, 4) < thresh`` rule."""
    thresh = _threshold_hex(test_pct)
    hx = md5_hex_keyed(df[key_col], salt)
    test = np.asarray(hx, dtype="U4") < thresh
    out = df.copy()
    out["split"] = np.where(test, "test", "train")
    return out


def hash_split(
    ds: "ray.data.Dataset",
    key_col: str = "doc_id",
    test_pct: float = 10.0,
    salt: str = "graft-split",
) -> "ray.data.Dataset":
    """→ the Dataset with a deterministic ``split`` column (map-side)."""
    return ds.map_batches(
        lambda df: hash_split_column(df, key_col, test_pct, salt),
        batch_format="pandas",
    )


def _bucket_count_offsets(tagged: "ray.data.Dataset", n_buckets: int):
    """Count histogram over a ``_bucket``-tagged Dataset → (prefix
    offsets dict in the object store, total rows). The shared
    rank-protocol core of ``deterministic_shuffle`` and
    ``global_rank``: per-batch partial counts are reduced DISTRIBUTED
    before the driver sees them (≤ n_buckets rows regardless of corpus
    size)."""
    import ray as _ray

    from ray.data.aggregate import Sum

    hist_parts = (
        tagged.map_batches(
            lambda df: df.groupby("_bucket", as_index=False)
            .size()
            .rename(columns={"size": "c"}),
            batch_format="pandas",
        )
        .groupby("_bucket")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    if "c" not in hist_parts.columns:
        hist_parts = pd.DataFrame({"_bucket": [], "c": []})
    counts = (
        hist_parts.set_index("_bucket")["c"]
        .reindex(range(n_buckets), fill_value=0)
        .astype("int64")
    )
    offsets = counts.cumsum().shift(fill_value=0).astype("int64")
    return _ray.put(offsets.to_dict()), int(counts.sum())


def deterministic_shuffle(
    ds: "ray.data.Dataset",
    key_col: str = "doc_id",
    salt: str = "graft-shuffle",
    num_shards: int | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Reproducible global shuffle → Dataset (key, rank[, shard]):
    every row's ``rank`` is its position in the total order of
    ``md5(key:salt)`` (ties broken by key), and ``shard = rank %
    num_shards`` when requested — the training-data shuffle+shard
    assignment that must be REPRODUCIBLE across runs, resumes and
    cluster sizes (``random_shuffle`` is none of those).

    Distributed rank without a global sort barrier on the driver:

    1. map-side: per-batch row counts per ORDER-PRESERVING bucket (the
       first hex chars of the md5 key — lexicographic bucket order IS
       key order, and md5 uniformity balances buckets);
    2. driver: fold the tiny (bucket → count) histogram into prefix
       offsets, broadcast via ``ray.put``;
    3. one bucket shuffle; per bucket, sort its rows and add the
       bucket's offset — rank = offset + local position.

    The histogram is ≤ ``num_buckets`` rows regardless of corpus size;
    no row data ever lands on the driver."""
    import math

    import numpy as np

    import ray as _ray

    from ..shuffle import bucket_tag  # noqa: F401  (module convention)

    hex_chars = max(1, math.ceil(math.log(num_buckets, 16)))
    n_buckets = 16 ** hex_chars

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        ks = md5_hex_keyed(df[key_col], salt)  # vectorized (fasthash)
        return pd.DataFrame(
            {
                key_col: df[key_col].to_numpy(),
                "_h": ks,
                "_bucket": hex_prefix_int(ks, hex_chars),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pandas").materialize()

    ref, _total = _bucket_count_offsets(keyed_ds, n_buckets)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        offs = _ray.get(ref)
        g = g.sort_values(["_h", key_col], kind="mergesort")
        base = int(offs[int(g["_bucket"].iloc[0])])
        out = pd.DataFrame(
            {
                key_col: g[key_col].to_numpy(),
                "rank": base + np.arange(len(g), dtype=np.int64),
            }
        )
        if num_shards:
            out["shard"] = (out["rank"] % num_shards).astype(np.int64)
        return out

    return (
        keyed_ds.groupby("_bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def stratified_sample(
    ds: "ray.data.Dataset",
    fractions: dict[str, float],
    group_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "graft-strata",
    default_pct: float = 0.0,
) -> "ray.data.Dataset":
    """Per-group deterministic sampling (language rebalancing, the
    multilingual-corpus mixing step): keep a row iff its keyed md5
    bucket clears the GROUP's percentage threshold — the same
    reproducible/growth-stable hash rule as ``hash_split``, one
    threshold per group, groups missing from ``fractions`` get
    ``default_pct``. Pure map-side: no shuffle, no driver state beyond
    the (small) fractions dict, SQL-replayable as
    ``substr(md5(key || ':salt'), 1, 4) < CASE group …``."""
    thresholds = {g: _threshold_hex(p) for g, p in fractions.items()}
    default_thresh = _threshold_hex(default_pct)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        hx = np.asarray(md5_hex_keyed(df[key_col], salt), dtype="U4")
        th = (
            df[group_col]
            .map(thresholds)
            .fillna(default_thresh)
            .to_numpy(dtype="U4")
        )
        return df.loc[hx < th]

    return ds.map_batches(keep, batch_format="pandas")


def budget_select(
    ds: "ray.data.Dataset",
    budget: int,
    score_col: str,
    size_col: str,
    id_col: str = "doc_id",
    descending: bool = True,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Token-budget corpus selection: walk documents best-score-first
    (ties by id) and keep each one while the budget is not yet exhausted
    — a document is kept iff the total ``size_col`` of all
    strictly-better documents is ``< budget`` (so the first overflowing
    document is kept; SQL-replayable as
    ``SUM(size) OVER (ORDER BY score …, id) - size < budget``). The
    quality-threshold-free data-selection step of a pretraining
    pipeline: "take the best N tokens", not "score > 0.8".

    Distributed greedy prefix without a global sort:

    1. one pass for the exact score min/max (two scalars on the driver);
    2. rows tagged with an ORDER-PRESERVING score bucket
       (``np.digitize`` against fixed linspace edges — equal scores
       land in the same bucket, so cross-bucket order is exact and ties
       resolve inside one kernel);
    3. per-bucket SIZE sums reduced distributed (≤ ``num_buckets`` rows
       on the driver) → prefix offsets, broadcast via ``ray.put``;
    4. map-side prune: buckets whose offset already exceeds the budget
       never enter the shuffle — the all-to-all moves only ~budget
       worth of rows no matter the corpus size;
    5. per surviving bucket: sort, cumsum, keep while
       ``offset + cumsum_before < budget``.

    Requires a non-null numeric ``score_col``. Massive score ties all
    land in one bucket (exactness over balance) — if a single score
    value dominates the corpus, pre-jitter deterministically or accept
    the one heavy kernel."""
    import ray as _ray

    from ray.data.aggregate import Sum

    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")

    stats = ds.map_batches(
        lambda df: pd.DataFrame(
            {"mn": [df[score_col].min()], "mx": [df[score_col].max()]}
        ),
        batch_format="pandas",
    ).to_pandas()
    mn, mx = float(stats["mn"].min()), float(stats["mx"].max())
    edges = np.linspace(mn, mx, num_buckets + 1)[1:-1]

    # score_col may double as size_col — dedup the projection
    cols = list(dict.fromkeys([id_col, score_col, size_col]))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        s = df[score_col].to_numpy(dtype=np.float64)
        b = np.digitize(s, edges)
        if descending:
            b = (num_buckets - 1) - b
        return df[cols].assign(_bucket=b.astype(np.int32))

    tagged = ds.map_batches(tag, batch_format="pandas").materialize()

    hist = (
        tagged.map_batches(
            lambda df: df.groupby("_bucket", as_index=False)[
                size_col
            ].sum(),
            batch_format="pandas",
        )
        .groupby("_bucket")
        .aggregate(Sum(size_col, alias_name="sz"))
        .to_pandas()
    )
    sizes = (
        hist.set_index("_bucket")["sz"]
        .reindex(range(num_buckets), fill_value=0)
        .astype("int64")
    )
    offsets = sizes.cumsum().shift(fill_value=0).astype("int64")
    ref = _ray.put(offsets.to_dict())

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        offs = _ray.get(ref)
        base = df["_bucket"].map(offs).to_numpy(dtype=np.int64)
        return df.loc[base < budget]

    def select_bucket(g: pd.DataFrame) -> pd.DataFrame:
        offs = _ray.get(ref)
        base = int(offs[int(g["_bucket"].iloc[0])])
        g = g.sort_values(
            [score_col, id_col],
            ascending=[not descending, True],
            kind="mergesort",
        )
        sz = g[size_col].to_numpy(dtype=np.int64)
        before = base + np.cumsum(sz) - sz
        return g.loc[before < budget, cols]

    return (
        tagged.map_batches(prune, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(select_bucket, batch_format="pandas")
    )


def pack_sequences(
    ds: "ray.data.Dataset",
    capacity: int,
    shard_col: str = "shard",
    order_col: str = "rank",
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Greedy non-straddling sequence packing → Dataset (id, shard,
    seq_id, offset): walking each shard's documents in ``order_col``
    order, a document joins the current sequence if its ``size_col``
    still fits within ``capacity``, else it opens the next sequence
    (an oversized document gets a sequence alone). The packing step for
    fixed-length LM training batches — deterministic given the
    (reproducible) order, so shards can be re-packed identically after
    a resume.

    Shape: one bucket shuffle on the shard id, then one kernel per
    shard. The per-shard walk is inherently sequential (each placement
    depends on the running fill — no closed-form cumsum), but shards
    are many and individually bounded (a shard ≈ one training file), so
    the sequential unit parallelizes across the cluster exactly like
    the training job that consumes it."""
    import numpy as np

    from ..shuffle import bucket_tag

    if capacity <= 0:
        raise ValueError(f"capacity must be positive: {capacity}")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, shard_col, order_col, size_col]].copy()
        return out.assign(_bucket=bucket_tag(out, shard_col, 64))

    def pack_shard(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for shard, grp in g.groupby(shard_col, sort=False):
            grp = grp.sort_values(order_col, kind="mergesort")
            sizes = grp[size_col].to_numpy()
            seq = np.empty(len(grp), dtype=np.int64)
            off = np.empty(len(grp), dtype=np.int64)
            cur, fill = 0, 0
            for i, s in enumerate(sizes):
                s = int(s)
                if fill and fill + s > capacity:
                    cur += 1
                    fill = 0
                seq[i] = cur
                off[i] = fill
                fill += s
            frames.append(
                pd.DataFrame(
                    {
                        id_col: grp[id_col].to_numpy(),
                        shard_col: shard,
                        "seq_id": seq,
                        "offset": off,
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {id_col: [], shard_col: [], "seq_id": [], "offset": []}
            )
        return pd.concat(frames, ignore_index=True)

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pack_shard, batch_format="pandas")
    )


def source_mixture(
    ds: "ray.data.Dataset",
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "graft-mix",
    default_weight: float = 1.0,
) -> "ray.data.Dataset":
    """Deterministic corpus mixing: replicate each row by its source's
    epoch weight — weight 2.5 = every doc twice plus a deterministic
    50% of docs a third time — adding an ``epoch`` column (0-based copy
    index). The data-mixing step of a training pipeline (domain
    up/down-sampling), made REPRODUCIBLE: the fractional copy is chosen
    by the shared keyed-md5 rule (``md5(str(id) + ':' + salt)`` 8-hex
    prefix under a per-source threshold), a pure function of
    (id, salt) — resharding, cluster size and later corpus growth never
    change which docs repeat (same argument as ``hash_split``).

    Pure map-side (no shuffle); replication is one ``np.repeat`` per
    batch; the epoch index is a vectorized cumsum trick. Weights < 1
    downsample (keep a deterministic fraction), 0 drops the source.
    Negative weights raise."""
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for source {s!r}: {w}")
    if default_weight < 0:
        raise ValueError(f"negative default_weight: {default_weight}")

    def mix(df: pd.DataFrame) -> pd.DataFrame:
        w = (
            df[source_col]
            .map(weights)
            .fillna(default_weight)
            .to_numpy(np.float64)
        )
        base = np.floor(w).astype(np.int64)
        frac = w - base
        # 8-hex-prefix uniform draw vs per-row threshold floor(frac·2³²)
        # — int compare ≡ the SQL 8-char lexicographic hex compare
        hx = md5_hex_keyed(df[id_col], salt)
        u = hex_prefix_int(np.asarray(hx, dtype=object), 8)
        extra = u < np.floor(frac * float(1 << 32)).astype(np.int64)
        copies = base + extra.astype(np.int64)
        keep = copies > 0
        idx = np.repeat(np.flatnonzero(keep), copies[keep])
        out = df.iloc[idx].reset_index(drop=True)
        ck = copies[keep]
        out["epoch"] = (
            np.arange(int(ck.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(ck) - ck, ck)
        )
        return out

    return ds.map_batches(mix, batch_format="pandas")


def negative_sample(
    triples: "ray.data.Dataset",
    k: int = 2,
    salt: str = "graft-negrank",
    cols: tuple[str, str, str] = ("subj", "pred", "obj"),
    num_buckets: int = 64,
    keep_obj: bool = False,
    ents: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """KG-embedding training negatives: for every triple and
    ``j ∈ [0, k)``, corrupt the tail with a pseudo-random entity —
    ``idx = md5(s|p|o|j)[:10] % |E|`` over the GLOBAL entity set E
    (subjects ∪ objects) ranked by ``md5(ent:salt)`` order. Returns
    (subj, pred, neg_obj, neg_id). Deterministic and growth-stable the
    same way hash_split is: a pure function of the triple, j and E —
    and SQL-replayable via ROW_NUMBER over the same md5 order.
    Self-collisions (neg_obj == obj, expected k/|E| per triple) are
    KEPT — the standard uniform-corruption convention; filter after if
    the loss requires it.

    Scale shape: entity ranking reuses ``deterministic_shuffle``'s
    order-preserving histogram (no global sort); candidates join the
    rank table through one bucket shuffle — the entity table is never
    broadcast (web-scale entity counts flow through the shuffle)."""
    from ..shuffle import bindings_join

    if k < 1:
        raise ValueError(f"k must be ≥ 1: {k}")
    s, p, o = cols

    if ents is None:
        def ents_batch(df: pd.DataFrame) -> pd.DataFrame:
            e = pd.concat([df[s], df[o]], ignore_index=True)
            return pd.DataFrame({"ent": e}).drop_duplicates()

        def tag_ent(df: pd.DataFrame) -> pd.DataFrame:
            from ..shuffle import bucket_tag

            return df.assign(_bucket=bucket_tag(df, "ent", num_buckets))

        ents = (
            triples.map_batches(ents_batch, batch_format="pandas")
            .map_batches(tag_ent, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(
                lambda g: g.drop_duplicates(subset=["ent"])[["ent"]],
                batch_format="pandas",
            )
            .materialize()
        )
    # else: caller supplies the DISTINCT entity table (ent) — e.g.
    # transe_epoch, whose embedding table IS the entity set; skipping
    # the rebuild saves one shuffle per epoch
    n_ents = ents.count()
    if n_ents == 0:
        raise ValueError("negative_sample: no entities in input")
    ranked = deterministic_shuffle(ents, key_col="ent", salt=salt)

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        base = (
            df[s].astype(str) + "|" + df[p].astype(str) + "|"
            + df[o].astype(str)
        ).to_numpy(dtype=object)
        parts = []
        for j in range(k):
            keys = np.array([b + f"|{j}" for b in base], dtype=object)
            idx = hex_prefix_int(md5_hex(keys), 10) % n_ents
            frame = {
                s: df[s].to_numpy(),
                p: df[p].to_numpy(),
                "neg_id": np.int64(j),
                "rank": idx.astype(np.int64),
            }
            if keep_obj:
                frame[o] = df[o].to_numpy()
            parts.append(pd.DataFrame(frame))
        return pd.concat(parts, ignore_index=True)

    cand = triples.map_batches(candidates, batch_format="pandas")
    joined = bindings_join(cand, ranked, on=["rank"],
                           num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        frame = {
            s: df[s].to_numpy(),
            p: df[p].to_numpy(),
            "neg_obj": df["ent"].to_numpy(),
            "neg_id": df["neg_id"].astype(np.int64).to_numpy(),
        }
        if keep_obj:
            frame[o] = df[o].to_numpy()
        return pd.DataFrame(frame)

    return joined.map_batches(finish, batch_format="pandas")


def global_rank(
    ds: "ray.data.Dataset",
    score_col: str,
    id_col: str = "doc_id",
    descending: bool = False,
    ntiles: int | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Exact global rank by VALUE → (id, score, rank[, ntile]):
    ``rank`` is the 1-based position in the total (score [desc], id)
    order — SQL ``ROW_NUMBER() OVER (ORDER BY score, id)`` — and
    ``ntile`` (when requested) is SQL ``NTILE(n)`` over the same order
    (first ``total mod n`` tiles one row larger). The percentile-bucket
    assignment step of quality-score curricula.

    Same no-global-sort shape as ``deterministic_shuffle``/
    ``budget_select``: ORDER-PRESERVING score buckets (fixed linspace
    edges — equal scores land in one bucket, so cross-bucket order is
    exact), a ≤ num_buckets-row count histogram on the driver → prefix
    offsets, then one bucket shuffle with a vectorized per-bucket sort.
    Massive score ties all land in one bucket (exactness over balance —
    same documented seam as budget_select)."""
    import ray as _ray

    from ray.data.aggregate import Sum

    if ntiles is not None and ntiles < 1:
        raise ValueError(f"ntiles must be ≥ 1: {ntiles}")

    stats = ds.map_batches(
        lambda df: pd.DataFrame(
            {"mn": [df[score_col].min()], "mx": [df[score_col].max()]}
        ),
        batch_format="pandas",
    ).to_pandas()
    if "mn" not in stats.columns:
        raise ValueError("global_rank: no rows")
    mn, mx = float(stats["mn"].min()), float(stats["mx"].max())
    edges = np.linspace(mn, mx, num_buckets + 1)[1:-1]
    cols = list(dict.fromkeys([id_col, score_col]))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        s = df[score_col].to_numpy(dtype=np.float64)
        if np.isnan(s).any():
            # digitize would send NaN to the TOP bucket (bucket 0 after
            # the descending flip) and silently mis-rank — SQL NULL
            # ordering is a policy choice the caller must make upstream
            raise ValueError(
                f"global_rank: NaN in {score_col!r} — filter or fill "
                "nulls first (SQL NULLS FIRST/LAST is caller policy)"
            )
        b = np.digitize(s, edges)
        if descending:
            b = (num_buckets - 1) - b
        return df[cols].assign(_bucket=b.astype(np.int32))

    tagged = ds.map_batches(tag, batch_format="pandas").materialize()
    ref, total = _bucket_count_offsets(tagged, num_buckets)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        offs = _ray.get(ref)
        base = int(offs[int(g["_bucket"].iloc[0])])
        g = g.sort_values(
            [score_col, id_col],
            ascending=[not descending, True],
            kind="mergesort",
        )
        out = g[cols].copy()
        r = base + np.arange(1, len(g) + 1, dtype=np.int64)
        out["rank"] = r
        if ntiles is not None:
            q, rem = divmod(total, ntiles)
            if q == 0:
                # fewer rows than tiles: tile == rank (SQL semantics)
                out["ntile"] = r
            else:
                cut = rem * (q + 1)
                out["ntile"] = np.where(
                    r <= cut,
                    (r - 1) // (q + 1) + 1,
                    rem + (r - 1 - cut) // q + 1,
                ).astype(np.int64)
        return out

    return tagged.groupby("_bucket").map_groups(
        rank_bucket, batch_format="pandas"
    )


def grouped_rank(
    ds: "ray.data.Dataset",
    score_col: str,
    group_col: str,
    id_col: str = "doc_id",
    descending: bool = False,
    ntiles: int | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Exact PER-GROUP rank by value → (id, group, score, rank
    [, ntile]): ``rank`` is SQL ``ROW_NUMBER() OVER (PARTITION BY group
    ORDER BY score [DESC], id)`` and ``ntile`` is ``NTILE(n)`` over the
    same window — the CCNet-style per-language quality-bucket step.

    Same no-global-sort protocol as ``global_rank``, generalized to a
    composite (group, score-bucket) key: GLOBAL linspace bucket edges
    are order-preserving within every group, the histogram the driver
    sees is ≤ groups × num_buckets rows (reduced distributed first),
    and ONE composite-key shuffle sorts each group×bucket cell
    vectorized. A hot group spreads over num_buckets cells. Group
    cardinality must be bounded (languages, sources — the per-group
    totals dict is driver-held); null groups are dropped like SQL
    PARTITION BY + pandas groupby both do."""
    import ray as _ray

    from ray.data.aggregate import Sum

    if ntiles is not None and ntiles < 1:
        raise ValueError(f"ntiles must be ≥ 1: {ntiles}")

    stats = ds.map_batches(
        lambda df: pd.DataFrame(
            {"mn": [df[score_col].min()], "mx": [df[score_col].max()]}
        ),
        batch_format="pandas",
    ).to_pandas()
    if "mn" not in stats.columns:
        raise ValueError("grouped_rank: no rows")
    mn, mx = float(stats["mn"].min()), float(stats["mx"].max())
    edges = np.linspace(mn, mx, num_buckets + 1)[1:-1]
    cols = list(dict.fromkeys([id_col, group_col, score_col]))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[group_col].notna()]
        s = df[score_col].to_numpy(dtype=np.float64)
        if np.isnan(s).any():
            raise ValueError(
                f"grouped_rank: NaN in {score_col!r} — filter or fill "
                "nulls first (SQL NULLS FIRST/LAST is caller policy)"
            )
        b = np.digitize(s, edges)
        if descending:
            b = (num_buckets - 1) - b
        gb = df[group_col].astype(str) + "\x1f" + pd.Series(
            b, index=df.index).astype(str)
        return df[cols].assign(_gb=gb.to_numpy(dtype=object))

    tagged = ds.map_batches(tag, batch_format="pandas").materialize()

    hist = (
        tagged.map_batches(
            lambda df: df.groupby("_gb", as_index=False)
            .size().rename(columns={"size": "c"}),
            batch_format="pandas",
        )
        .groupby("_gb")
        .aggregate(Sum(on="c", alias_name="c"))
        .to_pandas()  # ≤ groups × num_buckets rows
    )
    if "c" not in hist.columns or not len(hist):
        raise ValueError("grouped_rank: no rows")
    parts = hist["_gb"].str.split("\x1f", n=1, expand=True)
    hist = hist.assign(_g=parts[0], _b=parts[1].astype(int)).sort_values(
        ["_g", "_b"])
    hist["base"] = hist.groupby("_g")["c"].cumsum() - hist["c"]
    offsets = dict(zip(hist["_gb"], hist["base"].astype(np.int64)))
    totals = hist.groupby("_g")["c"].sum().astype(np.int64).to_dict()
    ref = _ray.put((offsets, totals))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        offs, tots = _ray.get(ref)
        gb = g["_gb"].iloc[0]
        base = int(offs[gb])
        total = int(tots[gb.split("\x1f", 1)[0]])
        g = g.sort_values(
            [score_col, id_col],
            ascending=[not descending, True],
            kind="mergesort",
        )
        out = g[cols].copy()
        r = base + np.arange(1, len(g) + 1, dtype=np.int64)
        out["rank"] = r
        if ntiles is not None:
            q, rem = divmod(total, ntiles)
            if q == 0:
                out["ntile"] = r
            else:
                cut = rem * (q + 1)
                out["ntile"] = np.where(
                    r <= cut,
                    (r - 1) // (q + 1) + 1,
                    rem + (r - 1 - cut) // q + 1,
                ).astype(np.int64)
        return out

    return tagged.groupby("_gb").map_groups(
        rank_bucket, batch_format="pandas"
    )


def weighted_sample(
    docs: "ray.data.Dataset",
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "graft-wsample",
    num_buckets: int = 8,
) -> "ray.data.Dataset":
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis–Spirakis exponential-keys method (Efraimidis & Spirakis
    2006) with md5-derived uniforms — each row gets
    ``es_key = ln(u) / w`` where ``u ∈ (0,1)`` comes from the first 12
    hex digits of ``md5(id:salt)``; the k LARGEST keys (closest to 0)
    are exactly a weight-proportional sample without replacement, and
    the whole rule replays in SQL (same md5, same ln expression).
    Reproducible across reshardings (keyed on id, not position).

    Rows with weight ≤ 0 or null can never be drawn — dropped and
    counted in metrics ``weighted_sample.nonpositive``. → the selected
    rows with their ``es_key``, via the same partial-top-k combiner
    shape as ``group_topk`` (≤ k rows leave each batch)."""
    from .fasthash import hex_prefix_int, md5_hex_keyed
    from .stats import group_topk

    if k < 1:
        raise ValueError(f"k must be ≥ 1: {k}")

    def key_batch(df: pd.DataFrame) -> pd.DataFrame:
        w = pd.to_numeric(df[weight_col], errors="coerce")
        ok = (w > 0).fillna(False).to_numpy()
        bad = int((~ok).sum())
        if bad:
            from .. import metrics

            metrics.incr("weighted_sample.nonpositive", bad)
        df = df.loc[ok].copy()
        if df.empty:
            df["es_key"] = pd.Series(dtype="float64")
            df["_one"] = pd.Series(dtype="int8")
            return df
        hexes = md5_hex_keyed(df[id_col], salt)
        u = hex_prefix_int(hexes, 12).astype(np.float64)
        # (frac + 1) / 2^48: u ∈ (0, 1], never exactly 0 → ln finite
        u = (u + 1.0) / float(1 << 48)
        df["es_key"] = np.log(u) / pd.to_numeric(
            df[weight_col]
        ).to_numpy(np.float64)
        df["_one"] = np.int8(0)
        return df

    keyed = docs.map_batches(key_batch, batch_format="pandas")
    out = group_topk(
        keyed, key="_one", score_col="es_key", k=k, id_col=id_col,
        descending=True, num_buckets=num_buckets,
    )
    return out.map_batches(
        lambda df: df.drop(columns=["_one"]), batch_format="pandas"
    )
