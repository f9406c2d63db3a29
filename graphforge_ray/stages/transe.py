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
- **One epoch = full-batch subgradient, THREE bucket shuffles**:
  (1) a tag-union-bucket lookup ships each training row's three entity
  vectors (h, t, t′) from the embedding table to the row — probes and
  lookups meet in one shuffle, the embedding table is never broadcast
  and never on the driver (the relation NAME rides the h-probe row,
  so no separate relation side); (2) rows regroup by row key to
  compute subgradients, emitting per-bucket integer partials; (3) the
  apply shuffle joins partials to the embedding table and folds the
  per-entity reduce into its kernel (no separate reduce shuffle).
  Relations are ontology-sized: broadcast behind a loud cap, their
  per-bucket gradient partials summed driver-side (the rdfs/owl
  convention). Vectors travel as fixed-width BYTES rows (pickling
  float lists measured 53 s → this layout 22 s on the sf0.1 bench).
- **L1 subgradients are INTEGER count vectors** (sign components in
  {−1, 0, +1} summed over active triples), so the distributed
  accumulation is exact regardless of summation order; floats enter
  only at the final ``w − lr·g`` and the entity re-normalization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .fasthash import hex_prefix_int, md5_hex

__all__ = ["distinct_entities", "init_embeddings",
           "warm_init_embeddings", "transe_epoch", "transe_rank_eval"]

_PREFIX = 10  # 40 hex bits → exact in doubles


def _enc_rows(V: np.ndarray) -> list:
    """(n, d) matrix → one fixed-width bytes object per row (the
    shuffle-cheap vector encoding; see transe_epoch)."""
    return [r.tobytes() for r in np.ascontiguousarray(V)]


def _dec_rows(col: np.ndarray, dtype, dim: int) -> np.ndarray:
    """Inverse of _enc_rows over an object array of bytes → (n, d)."""
    if not len(col):
        return np.zeros((0, dim), dtype)
    return np.frombuffer(b"".join(col), dtype=dtype).reshape(-1, dim)


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


def distinct_entities(
    triples: "ray.data.Dataset",
    cols: tuple[str, str, str] = ("subj", "pred", "obj"),
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distinct subjects ∪ objects → Dataset (ent). Per-batch
    drop_duplicates combiner, then ONE coarse bucket shuffle with a
    vectorized per-bucket dedup — never a per-key groupby (the
    measured-16×-slower Ray per-key aggregate path)."""
    from ..shuffle import bucket_tag

    s, _, o = cols

    def ents_batch(df: pd.DataFrame) -> pd.DataFrame:
        e = pd.concat([df[s], df[o]], ignore_index=True)
        out = pd.DataFrame({"ent": e}).drop_duplicates()
        return out.assign(_bucket=bucket_tag(out, "ent", num_buckets))

    return (
        triples.map_batches(ents_batch, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: g.drop_duplicates("ent")[["ent"]],
            batch_format="pandas",
        )
    )


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
    store's canonicalize stage). Corrupted tails are drawn from the
    EMBEDDING TABLE's entity set (normally exactly the triples'
    entities; a warm-start table with extra entities widens the
    negative vocabulary accordingly)."""
    import ray
    import ray.data as rd

    from ..shuffle import bucket_tag, snap_lineage
    from .sampling import negative_sample

    # consumed by BOTH shuffles (vector lookup + update base) — snap so
    # the second consumer replays blocks, not the upstream plan
    ent_emb = snap_lineage(ent_emb)

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

    # the embedding table IS the distinct entity set — hand it to
    # negative_sample so the per-epoch entity rebuild shuffle is skipped
    ent_names = ent_emb.map_batches(
        lambda df: pd.DataFrame(
            {"ent": df[ent_col].astype(str).to_numpy()}),
        batch_format="pandas",
    )
    negs = negative_sample(triples, k=1, cols=cols, keep_obj=True,
                           ents=ent_names)

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

    # snap, not bare materialize: rows feeds probes AND rel_of, and
    # grads/apply chain 3 more shuffles on top (deep-DAG replay lesson)
    rows = snap_lineage(
        negs.map_batches(keyed_rows, batch_format="pandas"))

    # Vectors travel through shuffles as FIXED-WIDTH BYTES (one small
    # bytes object per row), never as Python lists: shuffling 16-float
    # lists pickles 16 boxed floats per row (measured the sf0.1 epoch
    # at 53 s); bytes rows + frombuffer decode cut the epoch to a
    # third. Public columns stay list<float64> at the API boundary.

    # ---- shuffle 1: ship (h, t, t′) vectors to each row -------------
    # the relation NAME rides the h-probe row ("rel" column), so the
    # gradient shuffle needs no separate relation-row union side
    def probes(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat(
            [
                pd.DataFrame({"ent": df[s], "rid": df["rid"],
                              "role": "h", "rel": df[p]}),
                pd.DataFrame({"ent": df[o], "rid": df["rid"],
                              "role": "t", "rel": ""}),
                pd.DataFrame({"ent": df["neg"], "rid": df["rid"],
                              "role": "n", "rel": ""}),
            ],
            ignore_index=True,
        )
        out["embedding"] = b""
        out["_side"] = np.int8(0)
        return out.assign(_bucket=bucket_tag(out, "ent", num_buckets))

    def lookup(df: pd.DataFrame) -> pd.DataFrame:
        V = np.asarray(df["embedding"].tolist(), np.float64)
        out = pd.DataFrame({
            "ent": df[ent_col].astype(str),
            "rid": "", "role": "", "rel": "",
            "embedding": _enc_rows(V),
            "_side": np.int8(1),
        })
        return out.assign(_bucket=bucket_tag(out, "ent", num_buckets))

    def ship(g: pd.DataFrame) -> pd.DataFrame:
        pr = g[g["_side"] == 0]
        lk = g[g["_side"] == 1].drop_duplicates("ent")
        m = pr[["ent", "rid", "role", "rel"]].merge(
            lk[["ent", "embedding"]], on="ent", how="inner")
        return m[["rid", "role", "rel", "ent", "embedding"]]

    shipped = (
        rows.map_batches(probes, batch_format="pandas")
        .union(ent_emb.map_batches(lookup, batch_format="pandas"))
        .groupby("_bucket")
        .map_groups(ship, batch_format="pandas")
    )

    # ---- reassemble rows, compute integer subgradients ---------------
    def tag_rid(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_bucket=bucket_tag(df, "rid", num_buckets))

    _GEMPTY = pd.DataFrame({
        "ent": pd.Series([], dtype=object),
        "g": pd.Series([], dtype=object),
        "_bucket": pd.Series([], dtype="int32")})

    def _scatter_sum(ents: np.ndarray, G: np.ndarray) -> pd.DataFrame:
        """Exact integer scatter-add per entity key → (ent, g:bytes)."""
        codes, uniq = pd.factorize(ents)
        M = np.zeros((len(uniq), G.shape[1]), np.int64)
        np.add.at(M, codes, G)
        return pd.DataFrame({"ent": uniq, "g": _enc_rows(M)})

    def grads(g: pd.DataFrame) -> pd.DataFrame:
        """Per-bucket subgradients: role-scatter by rid code, decode
        bytes matrices, one batched sign computation, integer
        scatter-add combiner."""
        rm = ray.get(rel_ref)
        g = g.drop_duplicates(["rid", "role"])
        codes, _rids = pd.factorize(g["rid"].to_numpy())
        n = len(_rids)
        role_ix = {"h": 0, "t": 1, "n": 2}
        have = np.zeros((n, 3), bool)
        ent_at = np.empty((n, 3), object)
        byt = np.empty((n, 3), object)
        rel_at = np.empty(n, object)
        rl = g["role"].to_numpy()
        en = g["ent"].to_numpy(dtype=object)
        eb = g["embedding"].to_numpy(dtype=object)
        rc = g["rel"].to_numpy(dtype=object)
        for r_, k_ in role_ix.items():
            msel = rl == r_
            have[codes[msel], k_] = True
            ent_at[codes[msel], k_] = en[msel]
            byt[codes[msel], k_] = eb[msel]
            if r_ == "h":
                rel_at[codes[msel]] = rc[msel]
        ok = have.all(axis=1)
        if not ok.any():
            return _GEMPTY
        H = _dec_rows(byt[ok, 0], np.float64, dim)
        T = _dec_rows(byt[ok, 1], np.float64, dim)
        N = _dec_rows(byt[ok, 2], np.float64, dim)
        rcodes, rnames = pd.factorize(rel_at[ok])
        R = np.stack([rm[x] for x in rnames])[rcodes]
        dp = H + R - T
        dn = H + R - N
        act = (margin + np.abs(dp).sum(1) - np.abs(dn).sum(1)) > 0
        if not act.any():
            return _GEMPTY
        sp = np.sign(dp[act]).astype(np.int64)
        sn = np.sign(dn[act]).astype(np.int64)
        keys = np.concatenate([
            ent_at[ok, 0][act], ent_at[ok, 1][act], ent_at[ok, 2][act],
            np.array(["\x1frel\x1f" + r for r in rel_at[ok][act]],
                     dtype=object),
        ])
        G = np.concatenate([sp - sn, -sp, sn, sp - sn])
        out = _scatter_sum(keys, G)
        out["_bucket"] = bucket_tag(out, "ent", num_buckets)
        return out

    # grad partials PER RID-BUCKET — the per-entity reduce is folded
    # into the apply shuffle (one fewer all-to-all; the apply kernel
    # scatter-sums partials before stepping)
    grad_final = snap_lineage(
        shipped.map_batches(tag_rid, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(grads, batch_format="pandas")
    )

    # relation updates: per-bucket partials summed driver-side
    # (relation-count × num_buckets rows — ontology-sized)
    rel_g = grad_final.map_batches(
        lambda df: df[df["ent"].str.startswith("\x1frel\x1f")],
        batch_format="pandas",
    ).to_pandas()
    upd: dict = {}
    if len(rel_g):
        Gr = _dec_rows(rel_g["g"].to_numpy(dtype=object),
                       np.int64, dim)
        for e, v in zip(rel_g["ent"], Gr):
            k = e[len("\x1frel\x1f"):]
            upd[k] = upd.get(k, np.zeros(dim, np.int64)) + v
    new_rel = rel_emb.copy()
    new_rel["embedding"] = [
        (np.asarray(v, np.float64)
         - lr * upd.get(str(k), np.zeros(dim))).tolist()
        for k, v in zip(new_rel[p], new_rel["embedding"])
    ]

    # ---- shuffle 2 (entity side): apply updates + renormalize --------
    def ent_probe(df: pd.DataFrame) -> pd.DataFrame:
        g = df[~df["ent"].str.startswith("\x1frel\x1f")]
        out = pd.DataFrame({
            "ent": g["ent"], "embedding": b"", "g": g["g"],
            "_side": np.int8(1),
        })
        return out.assign(_bucket=bucket_tag(out, "ent", num_buckets))

    def ent_base(df: pd.DataFrame) -> pd.DataFrame:
        V = np.asarray(df["embedding"].tolist(), np.float64)
        out = pd.DataFrame({
            "ent": df[ent_col].astype(str),
            "embedding": _enc_rows(V), "g": b"",
            "_side": np.int8(0),
        })
        return out.assign(_bucket=bucket_tag(out, "ent", num_buckets))

    def apply_update(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["_side"] == 0]
        if not len(base):
            return pd.DataFrame({ent_col: pd.Series([], dtype=object),
                                 "embedding": pd.Series([], dtype=object)})
        gr = g[g["_side"] == 1]
        V = _dec_rows(base["embedding"].to_numpy(dtype=object),
                      np.float64, dim).copy()
        if len(gr):
            # per-rid-bucket partials: exact integer scatter-sum per
            # entity (the reduce folded out of its own shuffle)
            Gp = _dec_rows(gr["g"].to_numpy(dtype=object),
                           np.int64, dim)
            gcodes, guniq = pd.factorize(
                gr["ent"].to_numpy(dtype=object))
            M = np.zeros((len(guniq), dim), np.int64)
            np.add.at(M, gcodes, Gp)
            idx = pd.Index(guniq).get_indexer(base["ent"])
            mask = idx >= 0
            if mask.any():
                V[mask] = V[mask] - lr * M[idx[mask]]
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


def warm_init_embeddings(
    names: "ray.data.Dataset",
    prev: "ray.data.Dataset",
    dim: int,
    name_col: str = "ent",
    salt: str = "transe",
    normalize: bool = True,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Incremental-KG warm start: every name in ``names`` gets its
    vector from ``prev`` (a trained (name, embedding) table) when
    present, else the deterministic md5 init — ONE tag-union-bucket
    shuffle (the snapshot-delta convention: yesterday's training is
    never thrown away because today's graph gained entities).
    Vectors from ``prev`` pass through UNCHANGED (no re-normalization:
    a warm vector is already the training's output); fresh vectors
    follow ``init_embeddings``' rule exactly."""
    if dim < 1:
        raise ValueError(f"dim must be ≥ 1: {dim}")
    from ..shuffle import bucket_tag

    def tag_names(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "ent": df[name_col].astype(str).to_numpy(dtype=object),
            "emb": b"", "_side": np.int8(0),
        })
        return out.assign(_bucket=bucket_tag(out, "ent", num_buckets))

    def tag_prev(df: pd.DataFrame) -> pd.DataFrame:
        V = np.asarray(df["embedding"].tolist(), np.float64)
        if V.ndim != 2 or V.shape[1] != dim:
            raise ValueError(
                f"prev embeddings have dim {V.shape[-1]}, expected "
                f"{dim}")
        out = pd.DataFrame({
            "ent": df[name_col].astype(str).to_numpy(dtype=object),
            "emb": _enc_rows(V), "_side": np.int8(1),
        })
        return out.assign(_bucket=bucket_tag(out, "ent", num_buckets))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        want = g.loc[g["_side"] == 0, ["ent"]].drop_duplicates("ent")
        if not len(want):
            return pd.DataFrame({
                name_col: pd.Series([], dtype=object),
                "embedding": pd.Series([], dtype=object)})
        old = g[g["_side"] == 1].drop_duplicates("ent")
        m = want.merge(old[["ent", "emb"]], on="ent", how="left")
        hit = m["emb"].notna().to_numpy()
        nm = m["ent"].to_numpy(dtype=object)
        out = np.empty((len(m), dim), np.float64)
        if hit.any():
            out[hit] = _dec_rows(
                m.loc[hit, "emb"].to_numpy(dtype=object),
                np.float64, dim)
        if (~hit).any():
            out[~hit] = _vec_block(nm[~hit], dim, salt, normalize)
        return pd.DataFrame({name_col: nm,
                             "embedding": out.tolist()})

    return (
        names.map_batches(tag_names, batch_format="pandas")
        .union(prev.map_batches(tag_prev, batch_format="pandas"))
        .groupby("_bucket")
        .map_groups(pick, batch_format="pandas")
    )
