"""TransE knowledge-graph embedding — one distributed training epoch.

Bordes et al., "Translating Embeddings for Modeling Multi-relational
Data" (NeurIPS 2013, public): entities and relations are d-vectors,
a triple (h, r, t) is scored by the L1 distance ‖h + r − t‖₁, and the
margin loss max(0, γ + d(h,r,t) − d(h,r,t′)) over corrupted-tail
negatives is minimized by SGD with per-epoch entity normalization.
The KG-construction tier's model-training leg: the same engine that
forges the graph trains its link-prediction embeddings.

Determinism + scale shape:

- **Init** is a pure md5 function of (salt, entity, dim): every worker
  — and the sequential test replay — regenerates identical vectors, no
  RNG state shipped (the stages/vectorize projection-matrix rule).
- **Negatives** come from ``stages/sampling.negative_sample`` (the
  md5-ranked corrupt-tail rule, growth-stable, never broadcast).
- **One epoch = full-batch subgradient, TWO entity-keyed shuffles**:
  (1) a tag-union-bucket lookup ships each training row's three entity
  vectors (h, t, t′) from the embedding table to the row — probes and
  lookups meet in one shuffle, the embedding table is never broadcast
  and never on the driver; (2) gradients scatter-add back per entity
  in one bucket-sum shuffle. Relations are ontology-sized: collected
  once behind a loud cap and broadcast (the rdfs/owl convention).
- **L1 subgradients are INTEGER count vectors** (sign components in
  {−1, 0, +1} summed over active triples), so the distributed
  accumulation is exact regardless of summation order; floats enter
  only at the final ``w − lr·g`` and the entity re-normalization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .fasthash import hex_prefix_int, md5_hex

__all__ = ["init_embeddings", "transe_epoch", "transe_rank_eval"]

_PREFIX = 10  # 40 hex bits → exact in doubles


def _vec_block(names: np.ndarray, dim: int, salt: str,
               normalize: bool) -> np.ndarray:
    """Deterministic init vectors for a batch of names → (n, dim)."""
    keys = np.array(
        [f"{salt}:{n}:{j}" for n in names for j in range(dim)],
        dtype=object,
    )
    u = (hex_prefix_int(md5_hex(keys), _PREFIX) + 0.5) / float(2 ** 40)
    m = (2.0 * u - 1.0) * (6.0 / np.sqrt(dim))
    vecs = m.reshape(len(names), dim)
    if normalize and len(vecs):
        nrm = np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs / np.where(nrm == 0, 1.0, nrm)
    return vecs


def init_embeddings(
    names: "ray.data.Dataset",
    dim: int,
    name_col: str = "ent",
    salt: str = "transe",
    normalize: bool = True,
) -> "ray.data.Dataset":
    """→ Dataset (<name_col>, embedding:list<float64>) — deterministic
    uniform(−6/√d, 6/√d) init (TransE §4), L2-normalized when
    ``normalize`` (entities yes, relations no). Pure md5 function of
    (salt, name, dim): identical on every node and in the test
    replay. Input names must be distinct (use the caller's dedup)."""
    if dim < 1:
        raise ValueError(f"dim must be ≥ 1: {dim}")

    def make(df: pd.DataFrame) -> pd.DataFrame:
        nm = df[name_col].astype(str).to_numpy(dtype=object)
        vecs = _vec_block(nm, dim, salt, normalize)
        # plain Python lists — ndarray elements become TensorArray
        # columns that break concat across None-filled union sides
        return pd.DataFrame({
            name_col: nm,
            "embedding": vecs.astype(np.float64).tolist(),
        })

    return names.map_batches(make, batch_format="pandas")


def transe_epoch(
    triples: "ray.data.Dataset",
    ent_emb: "ray.data.Dataset",
    rel_emb: pd.DataFrame,
    lr: float = 0.01,
    margin: float = 1.0,
    cols: tuple[str, str, str] = ("subj", "pred", "obj"),
    ent_col: str = "ent",
    num_buckets: int = 32,
    max_relations: int = 1_000_000,
) -> tuple["ray.data.Dataset", pd.DataFrame]:
    """One full-batch TransE epoch → (new_ent_emb Dataset,
    new_rel_emb DataFrame).

    ``ent_emb``: Dataset (ent, embedding) — entity-count-sized, flows
    through shuffles only. ``rel_emb``: pandas (pred, embedding) —
    ontology-sized, broadcast (guarded by ``max_relations``).
    Corrupted tails come from ``negative_sample(k=1)``; the margin
    subgradient updates h, r, t, t′ of every active pair; entities are
    re-normalized to unit L2 after the step (TransE's per-epoch
    constraint).

    Duplicate triples contribute ONCE per epoch (the row key is a pure
    function of the triple — KG set semantics, consistent with the
    store's canonicalize stage)."""
    import ray
    import ray.data as rd

    from ..shuffle import bucket_tag
    from .sampling import negative_sample

    if len(rel_emb) > max_relations:
        raise ValueError(
            f"relation table too large to broadcast: {len(rel_emb)} "
            f"> max_relations={max_relations}"
        )
    s, p, o = cols
    rel_map = {
        str(k): np.asarray(v, np.float64)
        for k, v in zip(rel_emb[p], rel_emb["embedding"])
    }
    rel_ref = ray.put(rel_map)
    dim = len(next(iter(rel_map.values())))

    negs = negative_sample(triples, k=1, cols=cols, keep_obj=True)

    # row key: pure function of the training row (stable across shuffles)
    def keyed_rows(df: pd.DataFrame) -> pd.DataFrame:
        rid = md5_hex(np.array(
            [f"{a}\x1f{b}\x1f{c}\x1f{d}" for a, b, c, d in
             zip(df[s], df[p], df[o], df["neg_obj"])],
            dtype=object,
        ))
        return pd.DataFrame({
            "rid": rid, s: df[s].astype(str), p: df[p].astype(str),
            o: df[o].astype(str), "neg": df["neg_obj"].astype(str),
        })

    rows = negs.map_batches(keyed_rows, batch_format="pandas") \
        .materialize()

    # ---- shuffle 1: ship (h, t, t′) vectors to each row -------------
    def probes(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat(
            [
                pd.DataFrame({"ent": df[s], "rid": df["rid"], "role": "h"}),
                pd.DataFrame({"ent": df[o], "rid": df["rid"], "role": "t"}),
                pd.DataFrame({"ent": df["neg"], "rid": df["rid"],
                              "role": "n"}),
            ],
            ignore_index=True,
        )
        out["embedding"] = None
        out["_side"] = np.int8(0)
        return out.assign(_bucket=bucket_tag(out, "ent", num_buckets))

    def lookup(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "ent": df[ent_col].astype(str),
            "rid": "", "role": "",
            "embedding": df["embedding"],
            "_side": np.int8(1),
        })
        return out.assign(_bucket=bucket_tag(out, "ent", num_buckets))

    def ship(g: pd.DataFrame) -> pd.DataFrame:
        pr = g[g["_side"] == 0]
        lk = g[g["_side"] == 1].drop_duplicates("ent")
        m = pr[["ent", "rid", "role"]].merge(
            lk[["ent", "embedding"]], on="ent", how="inner")
        return m[["rid", "role", "ent", "embedding"]]

    shipped = (
        rows.map_batches(probes, batch_format="pandas")
        .union(ent_emb.map_batches(lookup, batch_format="pandas"))
        .groupby("_bucket")
        .map_groups(ship, batch_format="pandas")
    )

    # ---- reassemble rows, compute integer subgradients ---------------
    def tag_rid(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_bucket=bucket_tag(df, "rid", num_buckets))

    rel_of = rows.map_batches(
        lambda df: pd.DataFrame(
            {"rid": df["rid"], "role": "r", "ent": df[p],
             "embedding": None}),
        batch_format="pandas",
    ).map_batches(tag_rid, batch_format="pandas")

    def grads(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per-bucket subgradients: pivot (rid × role),
        stack the role matrices, one batched sign computation."""
        rm = ray.get(rel_ref)
        empty = pd.DataFrame({
            "ent": pd.Series([], dtype=object),
            "g": pd.Series([], dtype=object),
            "_bucket": pd.Series([], dtype="int32")})
        w = g.drop_duplicates(["rid", "role"]).set_index(
            ["rid", "role"])[["ent", "embedding"]].unstack("role")
        need = [("ent", "h"), ("ent", "t"), ("ent", "n"), ("ent", "r"),
                ("embedding", "h"), ("embedding", "t"),
                ("embedding", "n")]
        if any(c not in w.columns for c in need):
            return empty
        w = w.dropna(subset=need)
        if not len(w):
            return empty
        H = np.stack(w[("embedding", "h")].to_numpy())
        T = np.stack(w[("embedding", "t")].to_numpy())
        N = np.stack(w[("embedding", "n")].to_numpy())
        R = np.stack(
            w[("ent", "r")].map(rm).to_numpy())
        dp = H + R - T
        dn = H + R - N
        act = (margin + np.abs(dp).sum(1) - np.abs(dn).sum(1)) > 0
        if not act.any():
            return empty
        sp = np.sign(dp[act]).astype(np.int64)
        sn = np.sign(dn[act]).astype(np.int64)
        he = w[("ent", "h")].to_numpy(dtype=object)[act]
        te = w[("ent", "t")].to_numpy(dtype=object)[act]
        ne = w[("ent", "n")].to_numpy(dtype=object)[act]
        re_ = w[("ent", "r")].to_numpy(dtype=object)[act]
        out = pd.DataFrame({
            "ent": np.concatenate([
                he, te, ne,
                np.array(["\x1frel\x1f" + r for r in re_],
                         dtype=object),
            ]),
            "g": (sp - sn).tolist() + (-sp).tolist() + sn.tolist()
                 + (sp - sn).tolist(),
        })
        # per-batch combiner: sum integer grads per key
        out = out.groupby("ent", as_index=False).agg(
            g=("g", lambda vs: np.sum(
                np.stack(vs.to_numpy()), axis=0).tolist()))
        out["_bucket"] = bucket_tag(out, "ent", num_buckets)
        return out

    grad_rows = (
        shipped.map_batches(tag_rid, batch_format="pandas")
        .union(rel_of)
        .groupby("_bucket")
        .map_groups(grads, batch_format="pandas")
    )

    # grads were bucketed by rid upstream; re-reduce per entity key
    def grad_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("ent", as_index=False).agg(
            g=("g", lambda vs: np.sum(
                np.stack(vs.to_numpy()), axis=0).tolist()))

    grad_final = grad_rows.groupby("_bucket").map_groups(
        grad_reduce, batch_format="pandas"
    ).materialize()

    # relation updates: ontology-sized slice to the driver
    rel_g = grad_final.map_batches(
        lambda df: df[df["ent"].str.startswith("\x1frel\x1f")],
        batch_format="pandas",
    ).to_pandas()
    new_rel = rel_emb.copy()
    upd = {r["ent"][len("\x1frel\x1f"):]: np.asarray(r["g"], np.float64)
           for _, r in rel_g.iterrows()}
    new_rel["embedding"] = [
        (np.asarray(v, np.float64)
         - lr * upd.get(str(k), np.zeros(dim))).tolist()
        for k, v in zip(new_rel[p], new_rel["embedding"])
    ]

    # ---- shuffle 2 (entity side): apply updates + renormalize --------
    def ent_probe(df: pd.DataFrame) -> pd.DataFrame:
        g = df[~df["ent"].str.startswith("\x1frel\x1f")]
        out = pd.DataFrame({
            "ent": g["ent"], "embedding": None, "g": g["g"],
            "_side": np.int8(1),
        })
        return out.assign(_bucket=bucket_tag(out, "ent", num_buckets))

    def ent_base(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "ent": df[ent_col].astype(str),
            "embedding": df["embedding"], "g": None,
            "_side": np.int8(0),
        })
        return out.assign(_bucket=bucket_tag(out, "ent", num_buckets))

    def apply_update(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["_side"] == 0]
        if not len(base):
            return pd.DataFrame({ent_col: pd.Series([], dtype=object),
                                 "embedding": pd.Series([], dtype=object)})
        gr = g[g["_side"] == 1]
        V = np.stack([np.asarray(v, np.float64)
                      for v in base["embedding"]])
        if len(gr):
            gm = pd.Series(list(gr["g"]), index=gr["ent"])
            hit = base["ent"].map(gm)
            mask = hit.notna().to_numpy()
            if mask.any():
                G = np.stack([np.asarray(v, np.float64)
                              for v in hit[mask]])
                V[mask] = V[mask] - lr * G
        nrm = np.linalg.norm(V, axis=1, keepdims=True)
        V = V / np.where(nrm == 0, 1.0, nrm)
        return pd.DataFrame({ent_col: base["ent"].to_numpy(),
                             "embedding": V.tolist()})

    new_ent = (
        ent_emb.map_batches(ent_base, batch_format="pandas")
        .union(grad_final.map_batches(ent_probe, batch_format="pandas"))
        .groupby("_bucket")
        .map_groups(apply_update, batch_format="pandas")
    )
    return new_ent, new_rel


def transe_rank_eval(
    test_triples: "ray.data.Dataset",
    ent_emb: "ray.data.Dataset",
    rel_emb: pd.DataFrame,
    known_triples: "ray.data.Dataset | None" = None,
    cols: tuple[str, str, str] = ("subj", "pred", "obj"),
    ent_col: str = "ent",
    num_buckets: int = 16,
    max_test: int = 100_000,
    max_filter: int = 10_000_000,
) -> "ray.data.Dataset":
    """Filtered link-prediction ranks (TransE §5 protocol) →
    Dataset (subj, pred, obj, rank:int64).

    For each test triple (h, r, t), ``rank`` = 1 + the number of
    candidate entities e whose corrupted-tail score ‖h + r − e‖₁
    beats the true tail's — excluding e = t and (in the *filtered*
    setting) every e with (h, r, e) ∈ ``known_triples``. Ties break
    lexicographically on the entity name (deterministic). MRR /
    Hits@k are trivial driver-side reductions over the result.

    Scale shape: the ENTITY TABLE STREAMS — each embedding block
    scores all test translations in one numpy broadcast and emits a
    test-sized count partial; partials reduce in one bucket shuffle.
    Only test-sized state (translation matrix, filter sets) is
    broadcast, behind loud ``max_test`` / ``max_filter`` caps —
    eval sets are presentation-sized by design, the corpus is not."""
    import ray
    import ray.data as rd

    from ..shuffle import bucket_tag

    s, p, o = cols
    n_test = test_triples.count()
    if n_test == 0:
        raise ValueError("transe_rank_eval: empty test set")
    if n_test > max_test:
        raise ValueError(
            f"test set too large to broadcast: {n_test} > "
            f"max_test={max_test}")
    test = test_triples.to_pandas()
    test = pd.DataFrame({
        s: test[s].astype(str), p: test[p].astype(str),
        o: test[o].astype(str)})
    rel_map = {
        str(k): np.asarray(v, np.float64)
        for k, v in zip(rel_emb[p], rel_emb["embedding"])
    }
    missing_r = sorted(set(test[p]) - set(rel_map))
    if missing_r:
        raise ValueError(
            f"test relations without embeddings: {missing_r[:5]}")

    # ---- test-sided vectors: semi-join ent_emb on heads ∪ tails ----
    need = set(test[s]) | set(test[o])
    need_ref = ray.put(need)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        nm = df[ent_col].astype(str)
        m = nm.isin(ray.get(need_ref)).to_numpy()
        return pd.DataFrame({"ent": nm.to_numpy()[m],
                             "embedding": df["embedding"].to_numpy()[m]})

    side = ent_emb.map_batches(pick, batch_format="pandas").to_pandas()
    vec = {e: np.asarray(v, np.float64)
           for e, v in zip(side["ent"], side["embedding"])}
    missing_e = sorted(need - set(vec))
    if missing_e:
        raise ValueError(
            f"test entities without embeddings: {missing_e[:5]}")

    T = np.stack([vec[h] + rel_map[r]
                  for h, r in zip(test[s], test[p])])
    tails = test[o].to_numpy(dtype=object)
    dt = np.abs(T - np.stack([vec[t] for t in tails])).sum(axis=1)

    # ---- filtered setting: known tails per test (h, r) --------------
    excl: dict[int, set] = {}
    if known_triples is not None:
        pairs = {(h, r) for h, r in zip(test[s], test[p])}
        pairs_ref = ray.put(pairs)

        def known_pick(df: pd.DataFrame) -> pd.DataFrame:
            pr = ray.get(pairs_ref)
            hh = df[s].astype(str).to_numpy(dtype=object)
            rr = df[p].astype(str).to_numpy(dtype=object)
            m = np.fromiter(((a, b) in pr for a, b in zip(hh, rr)),
                            bool, len(hh))
            return pd.DataFrame({
                s: hh[m], p: rr[m],
                o: df[o].astype(str).to_numpy(dtype=object)[m],
            }).drop_duplicates()

        kn = known_triples.map_batches(
            known_pick, batch_format="pandas")
        n_kn = kn.count()
        if n_kn > max_filter:
            raise ValueError(
                f"filter set too large to broadcast: {n_kn} > "
                f"max_filter={max_filter}")
        kf = kn.to_pandas().drop_duplicates()
        by_pair: dict[tuple, set] = {}
        for h, r, t in kf.itertuples(index=False):
            by_pair.setdefault((h, r), set()).add(t)
        for i, (h, r) in enumerate(zip(test[s], test[p])):
            e = by_pair.get((h, r))
            if e:
                excl[i] = e

    state_ref = ray.put((T, dt, tails, excl))

    # ---- stream the entity table: per-block count partials ----------
    def count_block(df: pd.DataFrame) -> pd.DataFrame:
        T_, dt_, tails_, excl_ = ray.get(state_ref)
        names = df[ent_col].astype(str).to_numpy(dtype=object)
        E = np.stack([np.asarray(v, np.float64)
                      for v in df["embedding"]])
        # (n_test, m) L1 distances in one broadcast
        D = np.abs(T_[:, None, :] - E[None, :, :]).sum(axis=2)
        beats = D < dt_[:, None]
        # exact ties (measure-zero generically): lexicographic on name
        ti, tj = np.nonzero(D == dt_[:, None])
        for a, b in zip(ti, tj):
            if names[b] < tails_[a]:
                beats[a, b] = True
        col_of = {n: j for j, n in enumerate(names)}
        for i, t in enumerate(tails_):
            j = col_of.get(t)
            if j is not None:
                beats[i, j] = False
        for i, ents in excl_.items():
            hit = [col_of[e] for e in ents if e in col_of]
            if hit:
                beats[i, hit] = False
        cnt = beats.sum(axis=1).astype(np.int64)
        out = pd.DataFrame({"ti": np.arange(len(cnt), dtype=np.int64),
                            "cnt": cnt})
        out = out[out["cnt"] > 0]
        return out.assign(_bucket=bucket_tag(out, "ti", num_buckets))

    partial = ent_emb.map_batches(count_block, batch_format="pandas")
    summed = partial.groupby("_bucket").map_groups(
        lambda g: g.groupby("ti", as_index=False).agg(
            cnt=("cnt", "sum")),
        batch_format="pandas",
    ).to_pandas()

    rank = np.ones(len(test), dtype=np.int64)
    if len(summed):
        rank[summed["ti"].to_numpy()] += summed["cnt"].to_numpy()
    out = test.copy()
    out["rank"] = rank
    return rd.from_pandas(out)
