"""Similarity search over an embedding column (``list<float>``).

- ``ann_cosine_topk`` — exact brute-force cosine top-k: the query matrix
  is broadcast once (``ray.put``), each batch does one numpy matmul and
  keeps its local top-k, a tiny per-qid merge finishes. Per-batch
  partials bound the shuffle at (num_batches × k) rows.
- ``lsh_ann_topk`` — the scale path: random-hyperplane signs bucket the
  vectors; only buckets within ``probe`` Hamming distance of the query's
  bucket are scanned. Approximate; same output schema.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _as_matrix(col, dtype=np.float32) -> np.ndarray:
    """list<float> column → (n, d) matrix."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    offs = arr.offsets.to_numpy()
    d = offs[1] - offs[0] if len(offs) > 1 else flat.size
    return flat.reshape(-1, int(d))


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def ann_cosine_topk(ds, queries: np.ndarray, k: int = 10,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    dtype=np.float32):
    """→ Dataset (query_id, vec_id, score) — exact cosine top-k per query
    row of ``queries`` (shape (q, d)). ``dtype=np.float64`` for
    oracle-exact runs."""
    q = _normalize(np.asarray(queries, dtype=dtype))
    q_ref = ray.put(q)

    # stateless task: the broadcast query matrix resolves zero-copy from
    # the local object store per batch, so tasks schedule elastically on
    # every CPU (a fixed-width actor pool capped this stage at 2 workers)
    def score(b: pa.Table) -> pa.Table:
        qt = ray.get(q_ref).T               # (d, q)
        m = _normalize(_as_matrix(b[vec_col], dtype))
        ids = b[id_col].to_numpy()
        sims = m @ qt                       # (n, q)
        kk = min(k, sims.shape[0])
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            top = np.argpartition(-s, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int32))
            out_id.append(ids[top])
            out_s.append(s[top].astype(np.float64))
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s)),
        })

    partials = ds.map_batches(score, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        return g.reset_index(drop=True)

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def ivf_ann_topk(ds, queries: np.ndarray, k: int = 10, n_lists: int = 16,
                 n_probe: int = 4, kmeans_iters: int = 3, seed: int = 5,
                 sample_size: int = 4096,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 centroids: np.ndarray | None = None, dtype=np.float32):
    """IVF (inverted-file) ANN — the classic scale path: k-means
    centroids trained distributed (per-batch partial sums → driver
    update), vectors assigned to their nearest list, queries scan only
    the ``n_probe`` nearest lists. Approximate; → (query_id, vec_id,
    score).

    Centroid init is a deterministic seeded sample; training is
    ``kmeans_iters`` rounds of map_batches partial (sum, count) per
    centroid — the canonical pre-aggregated distributed k-means.
    Pass ``centroids`` (with ``kmeans_iters=0``) to pin the lists —
    with ``dtype=np.float64`` that makes the whole pipeline
    DuckDB-reproducible (the oracle inlines the same centroids)."""
    q = _normalize(np.asarray(queries, dtype=dtype))

    import pyarrow as pa2
    if centroids is not None:
        cent = _normalize(np.asarray(centroids, dtype=dtype))
    else:
        # centroid-init sample must be UNIFORM over the dataset (a plain
        # ``limit(n)`` reads the first n rows — the first blocks only,
        # which biases centroids to one docid range): seeded per-row
        # Bernoulli oversample at 2× the target, then a seeded
        # driver-side subsample.
        n_total = ds.count()
        frac = min(1.0, (2.0 * sample_size) / max(n_total, 1))
        batches = list(ds.random_sample(frac, seed=seed)
                       .select_columns([vec_col])
                       .iter_batches(batch_size=None, batch_format="pyarrow"))
        M0 = _normalize(np.concatenate(
            [_as_matrix(b[vec_col], dtype) for b in batches]))
        rng = np.random.default_rng(seed)
        if M0.shape[0] > sample_size:
            M0 = M0[rng.choice(M0.shape[0], size=sample_size, replace=False)]
        cent = M0[rng.choice(M0.shape[0], size=min(n_lists, M0.shape[0]),
                             replace=False)]

    for _ in range(kmeans_iters):
        cent_ref = ray.put(cent)

        def partial(b: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _normalize(_as_matrix(b[vec_col], c.dtype))
            assign = (m @ c.T).argmax(axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=c.shape[0])
            return pa.table({
                "cid": pa.array(np.arange(c.shape[0], dtype=np.int32)),
                "vsum": pa.array(sums.tolist(),
                                 pa2.list_(pa2.from_numpy_dtype(c.dtype))),
                "n": pa.array(counts.astype(np.int64)),
            })

        parts = pa.concat_tables(
            ds.map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow"))
        sums = np.zeros_like(cent)
        counts = np.zeros(cent.shape[0], dtype=np.int64)
        for cid, vs, n in zip(parts["cid"].to_numpy(),
                              parts["vsum"].to_pylist(),
                              parts["n"].to_numpy()):
            sums[cid] += np.asarray(vs, dtype=cent.dtype)
            counts[cid] += n
        nz = counts > 0
        cent[nz] = _normalize(sums[nz] / counts[nz, None])

    cent_ref = ray.put(cent)
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]   # (nq, n_probe)
    probe_ref = ray.put(probes)
    q_ref = ray.put(q)

    # stateless task form (see ann_cosine_topk.score): no pool-width cap
    def score(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        qm = ray.get(q_ref)
        probes_l = ray.get(probe_ref)
        m = _normalize(_as_matrix(b[vec_col], c.dtype))
        ids = b[id_col].to_numpy()
        assign = (m @ c.T).argmax(axis=1)
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            cand = np.isin(assign, probes_l[qi])
            if not cand.any():
                continue
            s = m[cand] @ qm[qi]
            kk = min(k, s.size)
            top = np.argpartition(-s, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int32))
            out_id.append(ids[cand][top])
            out_s.append(s[top].astype(np.float64))
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int32()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s)),
        })

    partials = ds.map_batches(score, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        return g.reset_index(drop=True)

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def lsh_ann_topk(ds, queries: np.ndarray, k: int = 10, planes: int = 12,
                 probe_hamming: int = 1, seed: int = 11,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 dtype=np.float32):
    """Random-hyperplane LSH ANN: bucket = sign pattern of ``planes``
    projections; scan only buckets within ``probe_hamming`` of each
    query bucket. → Dataset (query_id, vec_id, score), approximate."""
    q = _normalize(np.asarray(queries, dtype=dtype))
    rng = np.random.default_rng(seed)
    d = q.shape[1]
    # float64 keeps the sign decisions reproducible in the DuckDB oracle
    H = rng.standard_normal((d, planes)).astype(dtype)

    def bucket_of(m: np.ndarray) -> np.ndarray:
        signs = (m @ H) > 0
        return (signs.astype(np.uint32)
                << np.arange(planes, dtype=np.uint32)).sum(axis=1)

    q_buckets = bucket_of(q)
    # all buckets within probe distance of any query bucket (every
    # bit-flip combination up to probe_hamming)
    from itertools import combinations
    wanted: set[int] = set()
    for qb in q_buckets.tolist():
        for r in range(probe_hamming + 1):
            for bits in combinations(range(planes), r):
                m = 0
                for b in bits:
                    m |= 1 << b
                wanted.add(qb ^ m)
    wanted_ref = ray.put(np.array(sorted(wanted), dtype=np.uint32))
    q_ref = ray.put(q)

    # stateless task form (see ann_cosine_topk.score): no pool-width cap
    def score(b: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        wanted_l = ray.get(wanted_ref)
        m = _normalize(_as_matrix(b[vec_col], dtype=dtype))
        ids = b[id_col].to_numpy()
        bk = bucket_of(m)
        keep = np.isin(bk, wanted_l)
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int32()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        m, ids, bk = m[keep], ids[keep], bk[keep]
        sims = m @ qm.T
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            # only candidates whose bucket probes this query's bucket
            mask = (bk ^ q_buckets[qi]).astype(np.uint32)
            ham = np.zeros(mask.size, dtype=np.int32)
            mm = mask.copy()
            while mm.any():
                ham += (mm & 1).astype(np.int32)
                mm >>= 1
            cand = ham <= probe_hamming
            if not cand.any():
                continue
            s = sims[cand, qi]
            kk = min(k, s.size)
            top = np.argpartition(-s, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int32))
            out_id.append(ids[cand][top])
            out_s.append(s[top].astype(np.float64))
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int32()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s)),
        })

    partials = ds.map_batches(score, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        return g.reset_index(drop=True)

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def sq8_quantize(m: np.ndarray):
    """Symmetric int8 scalar quantization: per-vector scale =
    max(|v|)/127, code = floor(v/scale + 0.5) (round-half-up — the
    SQL-mirrorable rounding). Zero vectors get scale 0 and all-zero
    codes. → (codes int64 (n,d), scales float64 (n,))."""
    m = np.asarray(m, np.float64)
    s = np.abs(m).max(axis=1) / 127.0
    safe = np.where(s == 0.0, 1.0, s)
    codes = np.floor(m / safe[:, None] + 0.5).astype(np.int64)
    codes[s == 0.0] = 0
    return codes, s


def sq8_ann_topk(ds, queries: np.ndarray, k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
    """→ Dataset (query_id, vec_id, score): approximate dot-product
    top-k over INT8 scalar-quantized vectors — score =
    (Σ code_v·code_q) · scale_v · scale_q. The SQ8 memory tier every
    vector store ships (4× smaller residency than float32, 8× than
    float64; integer SIMD matmuls); recall loss is bounded by the
    per-vector quantization step. The integer dot is EXACT and the two
    scale multiplies are ordered identically on both sides, so the
    whole approximate pipeline is still bit-reproducible — the SQL
    oracle checks the quantized math itself, not a tolerance band.

    Same stateless shape as ``ann_cosine_topk``: codes+scales of the
    query side broadcast once; per-batch integer matmul + top-k cut;
    per-query driver merge."""
    q = np.asarray(queries, np.float64)
    qc, qs = sq8_quantize(q)
    q_ref = ray.put((qc, qs))

    def score(b: pa.Table) -> pa.Table:
        qc_l, qs_l = ray.get(q_ref)
        m = _as_matrix(b[vec_col], np.float64)
        vc, vs = sq8_quantize(m)
        ids = b[id_col].to_numpy()
        dots = vc @ qc_l.T                         # (n, q) int64 exact
        sims = dots.astype(np.float64) * vs[:, None] * qs_l[None, :]
        kk = min(k, sims.shape[0])
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            top = np.argpartition(-s, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int32))
            out_id.append(ids[top])
            out_s.append(s[top])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s)),
        })

    partials = ds.map_batches(score, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        return g.reset_index(drop=True)

    return partials.groupby("query_id").map_groups(merge,
                                                   batch_format="pandas")


def label_centroids(ds, vec_col: str = "embedding",
                    label_col: str = "label") -> pa.Table:
    """→ Arrow (label, dim, mean) sorted by (label, dim 1-based):
    per-label element-wise centroid of an embedding column — the
    cluster-statistics op behind k-means init audits / per-class
    embedding drift checks. Each component is quantized to the 1e-6
    integer grid BEFORE summing (floor(v*1e6+0.5), matching the SQL
    oracle literally), so partial sums associate exactly under any
    batch order; per-batch partials are (label, dim, int-sum, n) rows
    — labels × dims per batch, never vectors — folded by one tiny
    groupby."""
    def partial(b: pa.Table) -> pa.Table:
        m = np.floor(_as_matrix(b[vec_col], np.float64) * 1e6 + 0.5) \
            .astype(np.int64)
        labels = np.asarray(b[label_col].to_numpy(zero_copy_only=False),
                            np.int64)
        uniq = np.unique(labels)
        d = m.shape[1]
        out_l, out_dim, out_s, out_n = [], [], [], []
        for lb in uniq:
            rows = m[labels == lb]
            out_l.append(np.full(d, lb, np.int64))
            out_dim.append(np.arange(1, d + 1, dtype=np.int64))
            out_s.append(rows.sum(axis=0))
            out_n.append(np.full(d, rows.shape[0], np.int64))
        return pa.table({
            "key": pa.array((np.concatenate(out_l) << 20)
                            | np.concatenate(out_dim)),
            "s": pa.array(np.concatenate(out_s)),
            "n": pa.array(np.concatenate(out_n))})

    t = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("key").sum(["s", "n"]).to_pandas()
    key = t["key"].to_numpy(np.int64)
    s = t["sum(s)"].to_numpy(np.int64)
    n = t["sum(n)"].to_numpy(np.int64)
    order = np.argsort(key)
    key, s, n = key[order], s[order], n[order]
    mean = np.floor((s / (n * 1e6)) * 1e6 + 0.5) / 1e6
    return pa.table({
        "label": pa.array(key >> 20),
        "dim": pa.array(key & ((1 << 20) - 1)),
        "mean": pa.array(mean, pa.float64())})


def maxsim_topk(ds, queries: np.ndarray, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                doc_col: str = "doc_id") -> pa.Table:
    """ColBERT-style late interaction: documents are BAGS of vectors
    (``doc_col`` groups rows), score(doc) = Σ_q max_{v∈doc} cos(q, v)
    over the query's vector bag. → Arrow (doc_id, score) top-k, score
    desc then doc_id asc.

    Shape: one broadcast of the query matrix; per batch a single
    matmul emits (doc, q)-max PARTIALS (a batch may hold only part of
    a doc's bag — maxima fold associatively across batches), then one
    packed-key groupby of the tiny partial table, a driver-side sum of
    per-query maxima 6-dp-quantized so the final Σ is order-independent
    (oracle contract), and the top-k cut. Vectors never co-locate: max
    is the only cross-row op and it merges by key."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)
    nq = q.shape[0]

    def partial(b: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _normalize(_as_matrix(b[vec_col], np.float64))
        docs = np.asarray(b[doc_col].to_numpy(zero_copy_only=False),
                          np.int64)
        sims = m @ qm.T                              # (n, nq)
        order = np.argsort(docs, kind="mergesort")
        d_s, s_s = docs[order], sims[order]
        new = np.empty(d_s.size, dtype=bool)
        if d_s.size:
            new[0] = True
            new[1:] = d_s[1:] != d_s[:-1]
        starts = np.flatnonzero(new)
        mx = np.maximum.reduceat(s_s, starts, axis=0)  # (n_docs, nq)
        uniq = d_s[starts]
        key = (np.repeat(uniq, nq) * np.int64(nq)
               + np.tile(np.arange(nq, dtype=np.int64), uniq.size))
        return pa.table({"key": pa.array(key),
                         "mx": pa.array(mx.reshape(-1))})

    t = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("key").max("mx").to_pandas()
    key = t["key"].to_numpy(np.int64)
    # per-(doc, q) maxima quantized to 1e-6 INTEGERS before the Σ so the
    # per-doc sum is order-independent (the oracle's sum order is not)
    mx6 = np.floor(t["max(mx)"].to_numpy(np.float64) * 1e6 + 0.5) \
        .astype(np.int64)
    doc = key // nq
    import pandas as pd
    score = pd.Series(mx6).groupby(pd.Series(doc)).sum()
    out = score.reset_index()
    out.columns = ["doc_id", "s6"]
    out = out.sort_values(["s6", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(k)
    return pa.table({
        "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
        "score": pa.array(out["s6"].to_numpy(np.int64) / 1e6,
                          pa.float64()),
    })


def mmr_rerank(ds, qvec: np.ndarray, k: int = 5, lambda_: float = 0.7,
               cand_k: int = 20, vec_col: str = "embedding",
               id_col: str = "vec_id") -> pa.Table:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein, SIGIR'98): greedily pick argmax of
    ``λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`` from the exact cosine
    top-``cand_k`` candidates — the embedding-space sibling of the
    intent-aware xQuAD/PM2 rerankers. → Arrow (rank, id, score).

    Distribution shape: candidate retrieval is the distributed exact
    top-k (``ann_cosine_topk``); the greedy loop runs driver-side over
    the cand_k² sim matrix — candidate-sized, like the fusion ops.
    rel and pairwise sims are 6-dp rounded BEFORE the loop so every
    comparison (including ties, broken by id asc) is bit-reproducible
    in the unrolled SQL mirror; the ``cand_k`` boundary itself is cut
    on the ROUNDED score too (with id tie-break), fetching a small
    over-sample so rounded ties straddling the raw-score cut resolve
    identically on both sides."""
    import pyarrow.compute as pc

    from .text import round6

    def _empty() -> pa.Table:
        return pa.table({"rank": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})

    q = np.asarray(qvec, dtype=np.float64).reshape(1, -1)
    # over-fetch so the r6-rounded candidate cut (the oracle's cut) is
    # insensitive to raw-vs-rounded ordering at the cand_k boundary
    ann = ann_cosine_topk(ds, q, k=cand_k + 8,
                          dtype=np.float64).to_pandas()
    if ann.empty:
        return _empty()
    ann["r6"] = round6(ann["score"].to_numpy())
    ann = ann.sort_values(["r6", id_col], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True) \
        .head(cand_k)
    cand_ids = ann[id_col].to_numpy()
    rel = dict(zip(cand_ids.tolist(), ann["r6"].tolist()))

    want = pa.array(np.asarray(cand_ids, dtype=np.int64))

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(pc.cast(b[id_col], pa.int64()), want))

    batches = [
        b for b in ds.map_batches(keep, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows]
    if not batches:
        return _empty()
    ct = pa.concat_tables(batches)
    ids = ct[id_col].to_pylist()
    V = _normalize(_as_matrix(ct[vec_col], np.float64))
    sims = round6((V @ V.T).ravel()).reshape(len(ids), len(ids))
    pos = {int(i): j for j, i in enumerate(ids)}

    selected: list[int] = []
    scores: list[float] = []
    remaining = [int(i) for i in cand_ids]
    while remaining and len(selected) < k:
        best, best_sc = None, None
        for d in remaining:            # id-asc-stable: remaining keeps
            r = rel[d]                 # the (r6 desc, id asc) order, so
            if selected:               # strict > keeps the first max
                pen = max(sims[pos[d], pos[s]] for s in selected)
                sc = lambda_ * r - (1.0 - lambda_) * pen
            else:
                sc = lambda_ * r
            if best is None or sc > best_sc or (sc == best_sc
                                                and d < best):
                best, best_sc = d, sc
        selected.append(best)
        scores.append(best_sc)
        remaining.remove(best)
    return pa.table({
        "rank": pa.array(np.arange(1, len(selected) + 1, dtype=np.int64)),
        id_col: pa.array(selected, pa.int64()),
        "score": pa.array(round6(np.asarray(scores, dtype=np.float64))),
    })
