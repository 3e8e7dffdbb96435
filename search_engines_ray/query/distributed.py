"""Distributed batch query evaluation over the Parquet index with Ray Data.

The driver-side ``QueryEngine`` fetches a handful of posting lists per
query — right for interactive use. This module is the *batch* path: score
a whole query set against a huge index as one ZERO-SHUFFLE Ray job:

  one task per salt (= contiguous docid range; every term's postings
  for that range live in one parquet row, so the task's local
  bucket/row-group-pruned scan holds the COMPLETE inputs for its docs)
    → vectorized leaf math per posting row, dense per-salt group-sum on
      packed int64 keys ``qcode << 44 | docid`` (never string keys)
    → exact per-salt top-k cut (salt ranges are disjoint)
    → driver merge of the tiny candidate tables: attach external ids,
      exact (score desc, external_id asc) top-k per qid.

Scale notes: the postings read prunes to the buckets the query terms
hash to; doclens are docid-range-sharded (``_ShardedDoclens``): workers
load only the pid ranges their posting runs touch, cached per process —
no O(n_docs) broadcast anywhere. External ids are fetched for the final
candidate set via a filtered forward scan. The packed key leaves 44 bits
for docids and 19 for queries per batch.

Entry points: ``bm25_batch_search`` (bag-of-words #SUM),
``bm25_structured_batch_search`` (#SUM over term + positional leaves,
multi-field — each field scores with its own df/doclen/avglen),
``indri_batch_search`` (bag-of-words #AND in log space) and
``indri_structured_batch_search`` (#WSUM spines over #AND/#WAND trees —
log-linear subtrees mixed arithmetically in the final stage).
All scoring stages are STATELESS tasks with process-global caches —
no fixed actor-pool width to cap throughput at cluster scale.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..analysis.tokenizer import Analyzer, analyzer_for_mode
from ..index.build import POSTINGS_DIR, term_bucket
from ..index.reader import IndexReader
from ..index.varbyte import decode_postings
from .eval import expand_wildcards
from .models import BM25Model

_DOC_BITS = 44
_DOC_MASK = (1 << _DOC_BITS) - 1

# process-global doclen shard cache: Ray reuses worker processes, so
# shards loaded for one batch serve every later batch scheduled on the
# same worker. Key = (index_dir, field, pid); capped FIFO so a worker
# never holds more than _MAX_SHARDS pid ranges resident.
_SHARD_CACHE: dict = {}
_MAX_SHARDS = 128


def _doclen_shard(index_dir: str, field: str, pid: int,
                  token: float) -> np.ndarray:
    # token = build identity (stats.json mtime): a rebuilt index at the
    # same path must not serve a surviving worker's stale shards
    key = (index_dir, field, pid, token)
    arr = _SHARD_CACHE.get(key)
    if arr is None:
        arr = IndexReader(index_dir).doclen_shard(field, pid)
        if len(_SHARD_CACHE) >= _MAX_SHARDS:
            _SHARD_CACHE.pop(next(iter(_SHARD_CACHE)))
        _SHARD_CACHE[key] = arr
    return arr


class _ShardedDoclens:
    """Docid-range-sharded doclen lookup: a posting run's docids map to a
    handful of contiguous pid ranges (the build's salt layout keeps runs
    docid-range-local), so each scoring worker touches few shards and the
    process cache amortizes them across batches. Replaces the dense
    ``ray.put(doclens)`` broadcast, which is O(n_docs) memory per node —
    4 TB at the 10^12-doc design point."""

    def __init__(self, index_dir: str, field: str, pid_offsets: np.ndarray,
                 token: float = 0.0):
        self.index_dir = index_dir
        self.field = field
        self.offsets = pid_offsets
        self.token = token

    def get(self, docids: np.ndarray) -> np.ndarray:
        out = np.empty(docids.size, dtype=np.int32)
        pids = np.searchsorted(self.offsets, docids, side="right") - 1
        for p in np.unique(pids):
            m = pids == p
            shard = _doclen_shard(self.index_dir, self.field, int(p),
                                  self.token)
            out[m] = shard[docids[m] - self.offsets[p]]
        return out



# dense-accumulate cap for _group_sum_entries: nq_present × docid-span
# cells per salt task; two float64 arrays at the cap ≈ 512 MB, inside a
# worker's heap. Past it (very wide docid ranges × many queries) the
# sort-based fallback runs in O(n log n) of the posting count instead.
_DENSE_CAP = 1 << 25


def _group_sum_entries(entries, need_zero_candidates: bool = False):
    """Sum per-(query, docid) contributions inside ONE salt task.

    ``entries``: list of ``(qcode, ascending docid array, float64 vals)``.
    Returns ``(qc, docid, sums)`` sorted by ``(qc, docid)``.

    Fast path exploits the salt contract — every entry's docids fall in
    one contiguous range — with a dense ``np.bincount`` over
    ``qslot*span + (docid-base)``: ~20× faster than sorting packed
    int64 keys (``np.unique``/``argsort`` on millions of keys dominated
    the r2 per-salt profile). ``need_zero_candidates`` keeps docs whose
    summed value is exactly 0.0 (BM25 idf-clamped terms) at the cost of
    a second bincount, preserving the reference's candidate semantics
    (a matched doc is a candidate regardless of score)."""
    entries = [(qc, d, v) for qc, d, v in entries if d.size]
    if not entries:
        e = np.empty(0, np.int64)
        return e, e.copy(), np.empty(0, np.float64)
    qs = sorted({qc for qc, _, _ in entries})
    qslot = {q: i for i, q in enumerate(qs)}
    base = min(int(d[0]) for _, d, _ in entries)
    span = max(int(d[-1]) for _, d, _ in entries) + 1 - base
    ncells = len(qs) * span
    vals = np.concatenate([v for _, _, v in entries])
    if ncells <= _DENSE_CAP:
        lk = np.concatenate([
            np.int64(qslot[qc] * span - base) + d.astype(np.int64)
            for qc, d, _ in entries])
        dense = np.bincount(lk, weights=vals, minlength=ncells)
        if need_zero_candidates:
            nzi = np.flatnonzero(np.bincount(lk, minlength=ncells))
        else:
            nzi = np.flatnonzero(dense)
        slot, docid = np.divmod(nzi, span)
        return (np.asarray(qs, dtype=np.int64)[slot], docid + base,
                dense[nzi])
    gk = np.concatenate([
        (np.int64(qc) << _DOC_BITS) | d.astype(np.int64)
        for qc, d, _ in entries])
    order = np.argsort(gk)
    gs, vs = gk[order], vals[order]
    flag = np.empty(gs.size, np.bool_)
    flag[0] = True
    np.not_equal(gs[1:], gs[:-1], out=flag[1:])
    idx = np.flatnonzero(flag)
    uniq = gs[idx]
    return (uniq >> _DOC_BITS), (uniq & _DOC_MASK), np.add.reduceat(vs, idx)


def _query_slices(qc: np.ndarray):
    """(start, end) runs of equal qcode; ``qc`` must be ascending (both
    ``_group_sum_entries`` paths return it sorted)."""
    bounds = np.flatnonzero(np.diff(qc)) + 1
    return zip(np.concatenate(([0], bounds)),
               np.concatenate((bounds, [qc.size])))


def _topk_cut_sorted(qc: np.ndarray, sums: np.ndarray, k: int) -> np.ndarray:
    """Exact per-query top-k keep mask over one salt's disjoint docid
    range; ties at the kth score are kept (the global cut in
    ``_emit_ranked`` resolves them by external id)."""
    keep = np.ones(qc.size, np.bool_)
    for lo, hi in _query_slices(qc):
        if hi - lo > k:
            sq = sums[lo:hi]
            kth = np.partition(sq, -k)[-k]
            keep[lo:hi] = sq >= kth
    return keep


def _emit_ranked(cands: pa.Table, qids: list[str], k: int,
                 reader: IndexReader) -> pa.Table:
    """Unpack packed keys, attach external ids (filtered forward scan),
    apply the reference ordering (score desc, externalId asc) per qid."""
    if cands.num_rows == 0:
        return _empty()
    gk = cands["gkey"].to_numpy()
    sc = cands["score"].to_numpy()
    qc = (gk >> _DOC_BITS).astype(np.int64)
    docid = (gk & _DOC_MASK).astype(np.int64)
    eids = reader.external_ids_for(docid)
    out_qid, out_eid, out_rank, out_score = [], [], [], []
    for q in range(len(qids)):
        m = qc == q
        if not m.any():
            continue
        order = np.lexsort((eids[m], -sc[m]))[:k]
        out_qid.extend([qids[q]] * order.size)
        out_eid.extend(eids[m][order].tolist())
        out_rank.extend(range(1, order.size + 1))
        out_score.extend(sc[m][order].tolist())
    return pa.table({
        "qid": pa.array(out_qid, pa.string()),
        "external_id": pa.array(out_eid, pa.string()),
        "rank": pa.array(np.asarray(out_rank, dtype=np.int32)),
        "score": pa.array(out_score, pa.float64()),
    })


def bm25_batch_search(index_dir: str, queries: list[tuple[str, str]],
                      model=None, k: int = 100,
                      field: str = "body") -> pa.Table:
    """Score a bag-of-words query batch — BM25 by default, or Lucene
    ClassicSimilarity when ``model`` is a ``TFIDFModel`` (same per-salt
    zero-shuffle plumbing, different per-term kernel; classic idf is
    strictly positive so the zero-idf candidate path never triggers);
    → (qid, external_id, rank, score), reference ordering per qid."""
    from .models import TFIDFModel
    model = model or BM25Model()
    classic = isinstance(model, TFIDFModel)
    reader = IndexReader(index_dir)
    an = analyzer_for_mode(reader.stats.get("analyzer", "lucene"))

    qids = _check_unique_qids(queries)
    qcode = {qid: i for i, qid in enumerate(qids)}
    # term -> [(qcode, multiplicity)]: a repeated query term scores per
    # occurrence, as #SUM over duplicate args does
    term_queries: dict[str, list[tuple[int, int]]] = {}
    for qid, q in queries:
        terms: list[str] = []
        for tok in q.split():
            terms.extend(an.analyze_query_token(tok))
        for t in set(terms):
            term_queries.setdefault(t, []).append((qcode[qid], terms.count(t)))
    if not term_queries:
        return _empty()

    buckets = sorted({term_bucket(t, reader.num_buckets) for t in term_queries})
    base = os.path.join(index_dir, POSTINGS_DIR)
    paths: list[str] = []
    for b in buckets:
        d = os.path.join(base, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        return _empty()

    # broadcast small sides once (ray.put), read per task — never per
    # batch; doclens are NOT broadcast: workers load docid-range shards
    # on demand (see _ShardedDoclens)
    tq_ref = ray.put(term_queries)
    df_ref = ray.put(_global_dfs(index_dir, reader, list(term_queries), field))
    N = reader.n_docs
    avglen = reader.avg_len(field)
    pid_offsets = reader.pid_offsets
    dl_token = reader.stats_token
    k1, b = (0.0, 0.0) if classic else (model.k1, model.b)
    terms_list = sorted(term_queries)

    # ---- per-salt scoring, ZERO shuffle (r2→r3 redesign): salt is the
    # SAME contiguous docid range for every term (build.py salt_of_pid),
    # so one task per salt holds the complete postings of every query
    # term for its range — (query, doc) scores are FINAL inside the
    # task, the per-query top-k cut is exact (disjoint ranges), and the
    # packed-key groupby that used to move the decoded posting rows
    # (~90 MB per 20-query batch at 200k docs) is gone. Each task runs
    # its own column- and row-group-pruned pyarrow scan (term/field/salt
    # filters hit parquet row-group stats; the dataset metadata handle
    # is process-cached). Parallelism = merge_salts, which steps with
    # corpus size (thousands at the 10^12-doc design point).
    def score_salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        from ..util import proc_cached
        tq = ray.get(tq_ref)
        global_df = ray.get(df_ref)
        dlens = _ShardedDoclens(index_dir, field, pid_offsets, dl_token)
        dset = proc_cached(("postings_dset", index_dir, dl_token,
                            tuple(paths)),
                           lambda: pads.dataset(paths, format="parquet"))
        out: list[pa.Table] = []
        for s in batch["salt"].to_pylist():
            t = dset.to_table(
                columns=["term", "docid_blob", "tf_blob"],
                filter=(pc.field("term").isin(terms_list)
                        & (pc.field("field") == field)
                        & (pc.field("salt") == s)))
            entries, any_zero_idf = [], False
            for term, db, tb in zip(t["term"].to_pylist(),
                                    t["docid_blob"].to_pylist(),
                                    t["tf_blob"].to_pylist()):
                docids, tfs, _ = decode_postings(db, tb, None)
                df = global_df[term]
                dl = dlens.get(docids).astype(np.float64)
                tf = tfs.astype(np.float64)
                if classic:
                    idf = 1.0 + np.log(N / (df + 1.0))
                    sc = (np.sqrt(tf) * (idf * idf)
                          / np.sqrt(np.maximum(dl, 1.0)))
                else:
                    idf = max(0.0, np.log((N - df + 0.5) / (df + 0.5)))
                    any_zero_idf |= idf == 0.0
                    sc = idf * (tf / (tf + k1 * ((1.0 - b)
                                                 + b * dl / avglen)))
                for qc, mult in tq[term]:
                    entries.append((qc, docids,
                                    sc if mult == 1 else sc * mult))
            qc_a, docid, sums = _group_sum_entries(
                entries, need_zero_candidates=any_zero_idf)
            if qc_a.size:
                keep = _topk_cut_sorted(qc_a, sums, k)
                out.append(pa.table({
                    "gkey": pa.array((qc_a[keep] << _DOC_BITS)
                                     | docid[keep]),
                    "score": pa.array(sums[keep])}))
        return pa.concat_tables(out) if out else _partial_empty()

    cands = _run_salt_tasks(score_salt, reader)
    return _emit_ranked(cands, qids, k, reader)


def _run_salt_tasks(score_salt, reader: IndexReader) -> pa.Table:
    """One stateless task per salt (docid range); the tiny candidate
    tables (≤ salts × queries × k rows) concat on the driver."""
    n_salts = int(reader.stats.get("merge_salts", 4))
    desc = ray.data.from_items([{"salt": s} for s in range(n_salts)],
                               override_num_blocks=n_salts)
    batches = list(
        desc.map_batches(score_salt, batch_format="pyarrow", batch_size=1)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    batches = [b for b in batches if b.num_rows]
    return pa.concat_tables(batches) if batches else _partial_empty()


def _global_term_stats(index_dir: str, reader: IndexReader, terms: list[str],
                       field: str) -> dict[str, tuple[int, int]]:
    """Global (df, ctf) per term = sums over salt runs — a metadata-only
    parquet scan (no blob decode)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    base = os.path.join(index_dir, POSTINGS_DIR)
    paths = []
    for b in sorted({term_bucket(t, reader.num_buckets) for t in terms}):
        d = os.path.join(base, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        return {}
    t = pads.dataset(paths, format="parquet").to_table(
        columns=["term", "df", "ctf"],
        filter=(pc.field("term").isin(terms) & (pc.field("field") == field)))
    out: dict[str, tuple[int, int]] = {}
    for term, df, ctf in zip(t["term"].to_pylist(), t["df"].to_pylist(),
                             t["ctf"].to_pylist()):
        d0, c0 = out.get(term, (0, 0))
        out[term] = (d0 + df, c0 + ctf)
    return out


def _global_dfs(index_dir: str, reader: IndexReader, terms: list[str],
                field: str) -> dict[str, int]:
    return {t: df for t, (df, _) in
            _global_term_stats(index_dir, reader, terms, field).items()}


def bm25_msm_batch_search(index_dir: str,
                          queries: list[tuple[str, str, int]],
                          model: BM25Model | None = None, k: int = 100,
                          field: str = "body") -> pa.Table:
    """Distributed #MSM/n (minimum-should-match) — ``queries`` =
    [(qid, bag-of-words, n)]: BM25 #SUM restricted to docs matching
    ≥ n clauses (repeated terms count per clause, like the engine).

    Same zero-shuffle per-salt shape as ``bm25_batch_search`` plus a
    SECOND bincount group-sum of clause-indicator entries over the
    identical key set (``need_zero_candidates=True`` on both, so the
    two groupings align element-wise); the cnt ≥ n mask applies before
    the per-salt top-k cut. Docs live in exactly one salt, so local
    clause counts are complete — the filter is exact with no extra
    exchange."""
    model = model or BM25Model()
    reader = IndexReader(index_dir)
    an = analyzer_for_mode(reader.stats.get("analyzer", "lucene"))

    qids = _check_unique_qids([(q[0], q[1]) for q in queries])
    qcode = {qid: i for i, qid in enumerate(qids)}
    n_req = np.ones(len(qids), np.int64)
    term_queries: dict[str, list[tuple[int, int]]] = {}
    for qid, q, n in queries:
        terms: list[str] = []
        for tok in q.split():
            terms.extend(an.analyze_query_token(tok))
        n_req[qcode[qid]] = max(1, min(int(n), len(terms))) if terms else 1
        for t in set(terms):
            term_queries.setdefault(t, []).append((qcode[qid], terms.count(t)))
    if not term_queries:
        return _empty()
    terms_list = sorted(term_queries)
    paths = tuple(reader._bucket_paths(terms_list))
    if not paths:
        return _empty()

    tq_ref = ray.put(term_queries)
    df_ref = ray.put(_global_dfs(index_dir, reader, terms_list, field))
    N = reader.n_docs
    avglen = reader.avg_len(field)
    pid_offsets = reader.pid_offsets
    dl_token = reader.stats_token
    k1, b = model.k1, model.b
    nreq_ref = ray.put(n_req)

    def score_salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        from ..util import proc_cached
        tq = ray.get(tq_ref)
        global_df = ray.get(df_ref)
        nreq = ray.get(nreq_ref)
        dlens = _ShardedDoclens(index_dir, field, pid_offsets, dl_token)
        dset = proc_cached(("postings_dset", index_dir, dl_token,
                            tuple(paths)),
                           lambda: pads.dataset(paths, format="parquet"))
        out: list[pa.Table] = []
        for s in batch["salt"].to_pylist():
            t = dset.to_table(
                columns=["term", "docid_blob", "tf_blob"],
                filter=(pc.field("term").isin(terms_list)
                        & (pc.field("field") == field)
                        & (pc.field("salt") == s)))
            sc_entries, cnt_entries = [], []
            for term, db, tb in zip(t["term"].to_pylist(),
                                    t["docid_blob"].to_pylist(),
                                    t["tf_blob"].to_pylist()):
                docids, tfs, _ = decode_postings(db, tb, None)
                df = global_df[term]
                idf = max(0.0, np.log((N - df + 0.5) / (df + 0.5)))
                dl = dlens.get(docids).astype(np.float64)
                tf = tfs.astype(np.float64)
                sc = idf * (tf / (tf + k1 * ((1.0 - b) + b * dl / avglen)))
                ones = np.ones(docids.size, np.float64)
                for qc, mult in tq[term]:
                    sc_entries.append((qc, docids,
                                       sc if mult == 1 else sc * mult))
                    cnt_entries.append((qc, docids,
                                        ones if mult == 1 else ones * mult))
            qc_a, docid, sums = _group_sum_entries(
                sc_entries, need_zero_candidates=True)
            _qc2, _d2, cnts = _group_sum_entries(
                cnt_entries, need_zero_candidates=True)
            ok = cnts >= nreq[qc_a]
            qc_a, docid, sums = qc_a[ok], docid[ok], sums[ok]
            if qc_a.size:
                keep = _topk_cut_sorted(qc_a, sums, k)
                out.append(pa.table({
                    "gkey": pa.array((qc_a[keep] << _DOC_BITS)
                                     | docid[keep]),
                    "score": pa.array(sums[keep])}))
        return pa.concat_tables(out) if out else _partial_empty()

    return _emit_ranked(_run_salt_tasks(score_salt, reader),
                        qids, k, reader)


def bm25f_batch_search(index_dir: str, queries: list[tuple[str, str]],
                       weights: dict[str, float],
                       field_b: dict[str, float] | float = 0.75,
                       k1: float = 1.2, k: int = 100) -> pa.Table:
    """Distributed BM25F (query/bm25f.py math at batch scale): → (qid,
    external_id, rank, score), reference ordering per qid.

    Same zero-shuffle per-salt factorization as ``bm25_batch_search``,
    with one extra wrinkle: BM25F's idf uses the UNION document
    frequency (docs holding the term in ANY scored field), which no
    per-field metadata sum can produce — so phase A runs one tiny task
    per salt counting ``|∪_f docids(t, f, salt)|`` per term (salt
    ranges are disjoint, so the global union df is the plain sum) and
    phase B re-scans the same row-group-pruned postings (page-cache
    warm from A) to pool ``w_f·tf/B_f`` across fields per doc and
    score. Only (term, count) rows and the final per-salt top-k
    candidates ever reach the driver."""
    reader = IndexReader(index_dir)
    an = analyzer_for_mode(reader.stats.get("analyzer", "lucene"))
    fields = sorted(weights)
    if not isinstance(field_b, dict):
        field_b = {f: float(field_b) for f in fields}

    qids = _check_unique_qids(queries)
    qcode = {qid: i for i, qid in enumerate(qids)}
    term_queries: dict[str, list[tuple[int, int]]] = {}
    for qid, q in queries:
        terms: list[str] = []
        for tok in q.split():
            terms.extend(an.analyze_query_token(tok))
        for t in set(terms):
            term_queries.setdefault(t, []).append((qcode[qid], terms.count(t)))
    if not term_queries:
        return _empty()
    terms_list = sorted(term_queries)

    paths = tuple(reader._bucket_paths(terms_list))
    if not paths:
        return _empty()
    N = reader.n_docs
    avglen = {f: reader.avg_len(f) for f in fields}
    bvals = {f: field_b[f] for f in fields}
    wvals = {f: float(weights[f]) for f in fields}
    pid_offsets = reader.pid_offsets
    dl_token = reader.stats_token

    def scan_salt(dset, s: int):
        """per-(term, field) decoded postings of one salt, both fields."""
        import pyarrow.compute as pc
        t = dset.to_table(
            columns=["term", "field", "docid_blob", "tf_blob"],
            filter=(pc.field("term").isin(terms_list)
                    & pc.field("field").isin(fields)
                    & (pc.field("salt") == int(s))))
        for term, fld, db, tb in zip(t["term"].to_pylist(),
                                     t["field"].to_pylist(),
                                     t["docid_blob"].to_pylist(),
                                     t["tf_blob"].to_pylist()):
            docids, tfs, _ = decode_postings(db, tb, None)
            yield term, fld, docids, tfs

    def _dset():
        import pyarrow.dataset as pads
        from ..util import proc_cached
        return proc_cached(("postings_dset", index_dir, dl_token, paths),
                           lambda: pads.dataset(list(paths),
                                                format="parquet"))

    # ---- phase A: per-salt union-df partials (tiny rows up) ----
    @ray.remote
    def union_count_salt(s: int) -> pa.Table:
        per_term: dict[str, list[np.ndarray]] = {}
        for term, _, docids, _tfs in scan_salt(_dset(), s):
            per_term.setdefault(term, []).append(docids)
        ts = sorted(per_term)
        return pa.table({
            "term": pa.array(ts, pa.string()),
            "cnt": pa.array([int(np.unique(np.concatenate(per_term[t])).size)
                             if len(per_term[t]) > 1 else per_term[t][0].size
                             for t in ts], pa.int64())})

    n_salts = int(reader.stats.get("merge_salts", 4))
    union_df: dict[str, int] = {}
    for st in ray.get([union_count_salt.remote(s) for s in range(n_salts)]):
        for t, c in zip(st["term"].to_pylist(), st["cnt"].to_pylist()):
            union_df[t] = union_df.get(t, 0) + int(c)
    df_ref = ray.put(union_df)
    tq_ref = ray.put(term_queries)

    # ---- phase B: pooled-tf scoring per salt ----
    def score_salt(batch: pa.Table) -> pa.Table:
        tq = ray.get(tq_ref)
        gdf = ray.get(df_ref)
        dlens = {f: _ShardedDoclens(index_dir, f, pid_offsets, dl_token)
                 for f in fields}
        dset = _dset()
        out: list[pa.Table] = []
        for s in batch["salt"].to_pylist():
            contribs: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
            for term, fld, docids, tfs in scan_salt(dset, s):
                dl = dlens[fld].get(docids).astype(np.float64)
                B = (1.0 - bvals[fld]) + bvals[fld] * dl / avglen[fld]
                contribs.setdefault(term, []).append(
                    (docids, wvals[fld] * tfs.astype(np.float64) / B))
            entries, any_zero_idf = [], False
            for term, parts in contribs.items():
                if len(parts) == 1:
                    docids, tft = parts[0]
                else:   # pool w_f·tf/B_f across fields per doc
                    dc = np.concatenate([p[0] for p in parts])
                    cc = np.concatenate([p[1] for p in parts])
                    order = np.argsort(dc, kind="stable")
                    dc, cc = dc[order], cc[order]
                    starts = np.flatnonzero(
                        np.concatenate(([True], dc[1:] != dc[:-1])))
                    docids = dc[starts]
                    tft = np.add.reduceat(cc, starts)
                df = gdf[term]
                idf = max(0.0, np.log((N - df + 0.5) / (df + 0.5)))
                any_zero_idf |= idf == 0.0
                sc = idf * tft / (k1 + tft)
                for qc, mult in tq[term]:
                    entries.append((qc, docids,
                                    sc if mult == 1 else sc * mult))
            qc_a, docid, sums = _group_sum_entries(
                entries, need_zero_candidates=any_zero_idf)
            if qc_a.size:
                keep = _topk_cut_sorted(qc_a, sums, k)
                out.append(pa.table({
                    "gkey": pa.array((qc_a[keep] << _DOC_BITS)
                                     | docid[keep]),
                    "score": pa.array(sums[keep])}))
        return pa.concat_tables(out) if out else _partial_empty()

    return _emit_ranked(_run_salt_tasks(score_salt, reader),
                        qids, k, reader)


def bm25_grid_search(index_dir: str, queries: list[tuple[str, str]],
                     grid: list[tuple[float, float]], k: int = 100,
                     field: str = "body") -> pa.Table:
    """BM25 (k1, b) hyper-parameter sweep in ONE pass over the postings:
    parameter tuning re-reads nothing — each salt task decodes every
    query term's (docids, tf) run once, then every grid point re-weights
    the SAME arrays (idf and doclen are parameter-independent), so the
    sweep costs one batch search plus G cheap vectorized re-weightings
    instead of G full scans. Slots pack (grid × query) into the existing
    ``gkey = slot<<44 | docid`` keys; the per-slot top-k cut stays exact
    (disjoint salt docid ranges). → (k1, b, qid, external_id, rank,
    score), reference ordering per (grid point, qid)."""
    reader = IndexReader(index_dir)
    an = analyzer_for_mode(reader.stats.get("analyzer", "lucene"))

    qids = _check_unique_qids(queries)
    qcode = {qid: i for i, qid in enumerate(qids)}
    nq = len(qids)
    term_queries: dict[str, list[tuple[int, int]]] = {}
    for qid, q in queries:
        terms: list[str] = []
        for tok in q.split():
            terms.extend(an.analyze_query_token(tok))
        for t in set(terms):
            term_queries.setdefault(t, []).append((qcode[qid], terms.count(t)))
    empty = pa.table({"k1": pa.array([], pa.float64()),
                      "b": pa.array([], pa.float64()),
                      "qid": pa.array([], pa.string()),
                      "external_id": pa.array([], pa.string()),
                      "rank": pa.array([], pa.int32()),
                      "score": pa.array([], pa.float64())})
    if not term_queries or not grid:
        return empty

    buckets = sorted({term_bucket(t, reader.num_buckets) for t in term_queries})
    base = os.path.join(index_dir, POSTINGS_DIR)
    paths: list[str] = []
    for bkt in buckets:
        d = os.path.join(base, f"bucket={bkt}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        return empty

    tq_ref = ray.put(term_queries)
    df_ref = ray.put(_global_dfs(index_dir, reader, list(term_queries), field))
    N = reader.n_docs
    avglen = reader.avg_len(field)
    pid_offsets = reader.pid_offsets
    dl_token = reader.stats_token
    terms_list = sorted(term_queries)
    grid_t = tuple((float(g[0]), float(g[1])) for g in grid)

    def score_salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        from ..util import proc_cached
        tq = ray.get(tq_ref)
        global_df = ray.get(df_ref)
        dlens = _ShardedDoclens(index_dir, field, pid_offsets, dl_token)
        dset = proc_cached(("postings_dset", index_dir, dl_token,
                            tuple(paths)),
                           lambda: pads.dataset(paths, format="parquet"))
        out: list[pa.Table] = []
        for s in batch["salt"].to_pylist():
            t = dset.to_table(
                columns=["term", "docid_blob", "tf_blob"],
                filter=(pc.field("term").isin(terms_list)
                        & (pc.field("field") == field)
                        & (pc.field("salt") == s)))
            entries, any_zero_idf = [], False
            for term, db, tb in zip(t["term"].to_pylist(),
                                    t["docid_blob"].to_pylist(),
                                    t["tf_blob"].to_pylist()):
                docids, tfs, _ = decode_postings(db, tb, None)
                df = global_df[term]
                idf = max(0.0, np.log((N - df + 0.5) / (df + 0.5)))
                any_zero_idf |= idf == 0.0
                dl = dlens.get(docids).astype(np.float64)
                tf = tfs.astype(np.float64)
                for g, (k1, b) in enumerate(grid_t):
                    sc = idf * (tf / (tf + k1 * ((1.0 - b) + b * dl / avglen)))
                    for qc, mult in tq[term]:
                        entries.append((g * nq + qc, docids,
                                        sc if mult == 1 else sc * mult))
            qc_a, docid, sums = _group_sum_entries(
                entries, need_zero_candidates=any_zero_idf)
            if qc_a.size:
                keep = _topk_cut_sorted(qc_a, sums, k)
                out.append(pa.table({
                    "gkey": pa.array((qc_a[keep] << _DOC_BITS)
                                     | docid[keep]),
                    "score": pa.array(sums[keep])}))
        return pa.concat_tables(out) if out else _partial_empty()

    slot_labels = [f"{g}\x00{qid}" for g in range(len(grid_t))
                   for qid in qids]
    ranked = _emit_ranked(_run_salt_tasks(score_salt, reader),
                          slot_labels, k, reader)
    gi = [int(lbl.split("\x00", 1)[0]) for lbl in ranked["qid"].to_pylist()]
    return pa.table({
        "k1": pa.array([grid_t[i][0] for i in gi], pa.float64()),
        "b": pa.array([grid_t[i][1] for i in gi], pa.float64()),
        "qid": pa.array([lbl.split("\x00", 1)[1]
                         for lbl in ranked["qid"].to_pylist()], pa.string()),
        "external_id": ranked["external_id"],
        "rank": ranked["rank"],
        "score": ranked["score"],
    })


def bm25_champion_search(index_dir: str, queries: list[tuple[str, str]],
                         m: int = 128, k: int = 100,
                         field: str = "body") -> pa.Table:
    """Champion-list approximate top-k (Manning IIR §7.1.3): candidates
    are the union of each query term's GLOBAL top-``m`` postings by
    (tf desc, docid asc); candidates then score EXACTLY (full tf of
    every query term, corpus-wide df/doclens), so only the candidate-
    generation step is approximate. Two salt-task rounds: phase A
    returns each salt's local top-m (term, docid, tf) triples — the
    global top-m per term is a subset of the locals' union, so the
    driver merge is exact over ≤ salts × terms × m tiny rows; phase B
    re-scans with the merged candidate set in the task closure and
    masks each term's decoded postings to it. At the 10^12-doc design
    point phase A's output is the CHAMPION SUBLIST you would persist
    next to the index (it never changes between queries for fixed m) —
    the second scan then prices like ``bm25_batch_search`` over lists
    shrunk to ≤ m entries. → (qid, external_id, rank, score)."""
    model = BM25Model()
    reader = IndexReader(index_dir)
    an = analyzer_for_mode(reader.stats.get("analyzer", "lucene"))

    qids = _check_unique_qids(queries)
    qcode = {qid: i for i, qid in enumerate(qids)}
    term_queries: dict[str, list[tuple[int, int]]] = {}
    for qid, q in queries:
        terms: list[str] = []
        for tok in q.split():
            terms.extend(an.analyze_query_token(tok))
        for t in set(terms):
            term_queries.setdefault(t, []).append((qcode[qid], terms.count(t)))
    if not term_queries:
        return _empty()

    buckets = sorted({term_bucket(t, reader.num_buckets) for t in term_queries})
    base = os.path.join(index_dir, POSTINGS_DIR)
    paths: list[str] = []
    for bkt in buckets:
        d = os.path.join(base, f"bucket={bkt}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        return _empty()

    terms_list = sorted(term_queries)
    N = reader.n_docs
    avglen = reader.avg_len(field)
    pid_offsets = reader.pid_offsets
    dl_token = reader.stats_token
    k1, b = model.k1, model.b

    def _scan_salt(s: int, dset):
        import pyarrow.compute as pc
        return dset.to_table(
            columns=["term", "docid_blob", "tf_blob"],
            filter=(pc.field("term").isin(terms_list)
                    & (pc.field("field") == field)
                    & (pc.field("salt") == s)))

    def _dset():
        import pyarrow.dataset as pads
        from ..util import proc_cached
        return proc_cached(("postings_dset", index_dir, dl_token,
                            tuple(paths)),
                           lambda: pads.dataset(paths, format="parquet"))

    # ---- phase A: per-salt local champions (tf desc, docid asc) ----
    def local_champs(batch: pa.Table) -> pa.Table:
        out: list[pa.Table] = []
        for s in batch["salt"].to_pylist():
            t = _scan_salt(s, _dset())
            terms_o, docs_o, tfs_o = [], [], []
            for term, db, tb in zip(t["term"].to_pylist(),
                                    t["docid_blob"].to_pylist(),
                                    t["tf_blob"].to_pylist()):
                docids, tfs, _ = decode_postings(db, tb, None)
                if docids.size > m:
                    sel = np.lexsort((docids, -tfs))[:m]
                    docids, tfs = docids[sel], tfs[sel]
                terms_o.extend([term] * docids.size)
                docs_o.append(docids)
                tfs_o.append(tfs.astype(np.int64))
            if terms_o:
                out.append(pa.table({
                    "term": pa.array(terms_o, pa.string()),
                    "docid": pa.array(np.concatenate(docs_o)),
                    "tf": pa.array(np.concatenate(tfs_o))}))
        return (pa.concat_tables(out) if out else
                pa.table({"term": pa.array([], pa.string()),
                          "docid": pa.array([], pa.int64()),
                          "tf": pa.array([], pa.int64())}))

    locs = _run_salt_tasks_table(local_champs, reader)
    cands: list[np.ndarray] = []
    lt = locs["term"].to_pylist()
    ld = locs["docid"].to_numpy() if locs.num_rows else np.empty(0, np.int64)
    lf = locs["tf"].to_numpy() if locs.num_rows else np.empty(0, np.int64)
    for term in terms_list:
        mask = np.asarray([x == term for x in lt], bool)
        d, f = ld[mask], lf[mask]
        if d.size > m:
            sel = np.lexsort((d, -f))[:m]
            d = d[sel]
        cands.append(d)
    cand_set = np.unique(np.concatenate(cands)) if cands else \
        np.empty(0, np.int64)

    # ---- phase B: exact scoring of the candidate set ----
    df_ref = ray.put(_global_dfs(index_dir, reader, terms_list, field))
    tq_ref = ray.put(term_queries)
    cand_ref = ray.put(cand_set)

    def score_salt(batch: pa.Table) -> pa.Table:
        tq = ray.get(tq_ref)
        global_df = ray.get(df_ref)
        allowed = ray.get(cand_ref)
        if allowed.size == 0:
            return _partial_empty()
        dlens = _ShardedDoclens(index_dir, field, pid_offsets, dl_token)
        out: list[pa.Table] = []
        for s in batch["salt"].to_pylist():
            t = _scan_salt(s, _dset())
            entries, any_zero_idf = [], False
            for term, db, tb in zip(t["term"].to_pylist(),
                                    t["docid_blob"].to_pylist(),
                                    t["tf_blob"].to_pylist()):
                docids, tfs, _ = decode_postings(db, tb, None)
                pos = np.searchsorted(allowed, docids)
                pos = np.minimum(pos, allowed.size - 1)
                keep = allowed[pos] == docids
                docids, tfs = docids[keep], tfs[keep]
                if docids.size == 0:
                    continue
                df = global_df[term]
                idf = max(0.0, np.log((N - df + 0.5) / (df + 0.5)))
                any_zero_idf |= idf == 0.0
                dl = dlens.get(docids).astype(np.float64)
                tf = tfs.astype(np.float64)
                sc = idf * (tf / (tf + k1 * ((1.0 - b) + b * dl / avglen)))
                for qc, mult in tq[term]:
                    entries.append((qc, docids,
                                    sc if mult == 1 else sc * mult))
            qc_a, docid, sums = _group_sum_entries(
                entries, need_zero_candidates=any_zero_idf)
            if qc_a.size:
                keep2 = _topk_cut_sorted(qc_a, sums, k)
                out.append(pa.table({
                    "gkey": pa.array((qc_a[keep2] << _DOC_BITS)
                                     | docid[keep2]),
                    "score": pa.array(sums[keep2])}))
        return pa.concat_tables(out) if out else _partial_empty()

    return _emit_ranked(_run_salt_tasks(score_salt, reader), qids, k, reader)


def _run_salt_tasks_table(fn, reader: IndexReader) -> pa.Table:
    """Like ``_run_salt_tasks`` but for arbitrary (non-gkey) schemas."""
    n_salts = int(reader.stats.get("merge_salts", 4))
    desc = ray.data.from_items([{"salt": s} for s in range(n_salts)],
                               override_num_blocks=n_salts)
    batches = [bt for bt in
               desc.map_batches(fn, batch_format="pyarrow", batch_size=1)
               .iter_batches(batch_size=None, batch_format="pyarrow")
               if bt.num_rows]
    return (pa.concat_tables(batches) if batches else
            pa.table({"term": pa.array([], pa.string()),
                      "docid": pa.array([], pa.int64()),
                      "tf": pa.array([], pa.int64())}))


def indri_batch_search(index_dir: str, queries: list[tuple[str, str]],
                       model=None, k: int = 100,
                       field: str = "body") -> pa.Table:
    """Distributed Indri query-likelihood (Dirichlet + Jelinek-Mercer mix,
    ``QrySopScore.java:140-161``) for bag-of-words ``#AND`` batches.

    Indri's geometric mean needs a *default score* for every query term a
    candidate doc lacks (``QrySopAnd.java:97-107``) — naively an outer
    join. In log space it factors into a groupby-sum:

        log score(d) = (1/k_q) · [ Σ_matched m_t·(log s_t(tf,dl) − log s_t(0,dl))
                                   + Σ_all-terms m_t·log s_t(0,dl) ]

    The first sum is a per-posting partial (same packed-key shuffle as
    the BM25 path); the second depends only on (query, doclen), so the
    final aggregation stage computes it per candidate from the sharded
    doclens. Candidates are exactly the match-min set (docs with ≥1
    matched term), as in the reference's DAAT loop."""
    from .models import IndriModel
    model = model or IndriModel()
    reader = IndexReader(index_dir)
    an = analyzer_for_mode(reader.stats.get("analyzer", "lucene"))

    qids = _check_unique_qids(queries)
    qcode = {qid: i for i, qid in enumerate(qids)}
    term_queries: dict[str, list[tuple[int, int]]] = {}
    q_terms: list[list[tuple[str, int]]] = [[] for _ in qids]  # per qcode
    for qid, q in queries:
        toks: list[str] = []
        for tok in q.split():
            toks.extend(an.analyze_query_token(tok))
        for t in sorted(set(toks)):
            term_queries.setdefault(t, []).append((qcode[qid], toks.count(t)))
            q_terms[qcode[qid]].append((t, toks.count(t)))
    if not term_queries:
        return _empty()

    paths = reader._bucket_paths(list(term_queries))
    if not paths:
        return _empty()

    stats = _global_term_stats(index_dir, reader, list(term_queries), field)
    clen = max(reader.sum_field_lengths(field), 1)
    mle = {t: stats.get(t, (0, 0))[1] / clen for t in term_queries}
    mu, lam = model.mu, model.lambda_
    pid_offsets = reader.pid_offsets
    dl_token = reader.stats_token
    tq_ref = ray.put(term_queries)
    mle_ref = ray.put(mle)
    # per qcode: (mle array, mult array, k_q = total arg count)
    q_info = [(np.array([mle[t] for t, _ in ts], dtype=np.float64),
               np.array([m for _, m in ts], dtype=np.float64),
               float(sum(m for _, m in ts)))
              for ts in q_terms]
    qinfo_ref = ray.put(q_info)
    terms_list = sorted(term_queries)

    def _s(tf, dl, m):
        return (1.0 - lam) * (tf + mu * m) / (dl + mu) + lam * m

    # per-salt scoring, zero shuffle (see bm25_batch_search): the match
    # set and every matched log-partial for a docid range are complete
    # inside one salt task, so the default-score correction and the
    # exact per-query cut both run there — the packed-key groupby and
    # the separate final-aggregate stage are gone.
    def score_salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        from ..util import proc_cached
        dlens = _ShardedDoclens(index_dir, field, pid_offsets, dl_token)
        tq = ray.get(tq_ref)
        mle_m = ray.get(mle_ref)
        qi = ray.get(qinfo_ref)
        dset = proc_cached(("postings_dset", index_dir, dl_token,
                            tuple(paths)),
                           lambda: pads.dataset(paths, format="parquet"))
        out: list[pa.Table] = []
        for s_salt in batch["salt"].to_pylist():
            t = dset.to_table(
                columns=["term", "docid_blob", "tf_blob"],
                filter=(pc.field("term").isin(terms_list)
                        & (pc.field("field") == field)
                        & (pc.field("salt") == s_salt)))
            entries = []
            with np.errstate(divide="ignore"):
                for term, db, tb in zip(t["term"].to_pylist(),
                                        t["docid_blob"].to_pylist(),
                                        t["tf_blob"].to_pylist()):
                    docids, tfs, _ = decode_postings(db, tb, None)
                    dl = dlens.get(docids).astype(np.float64)
                    m = mle_m[term]
                    # matched partials are strictly > 0 (s is monotone
                    # in tf), so the dense group-sum's nonzero set IS
                    # the match-min candidate set
                    part = (np.log(_s(tfs.astype(np.float64), dl, m))
                            - np.log(_s(0.0, dl, m)))
                    for qc, mult in tq[term]:
                        entries.append((qc, docids,
                                        part if mult == 1 else part * mult))
            qc_a, docid, agg = _group_sum_entries(entries)
            if not qc_a.size:
                continue
            dl = dlens.get(docid).astype(np.float64)
            final = np.empty(qc_a.size, dtype=np.float64)
            keep = np.ones(qc_a.size, dtype=bool)
            with np.errstate(divide="ignore"):
                for lo, hi in _query_slices(qc_a):
                    mles, mults, kq = qi[int(qc_a[lo])]
                    corr = np.zeros(hi - lo, dtype=np.float64)
                    dlq = dl[lo:hi]
                    for mlv, mv in zip(mles, mults):
                        corr += mv * np.log(_s(0.0, dlq, mlv))
                    final[lo:hi] = np.exp((agg[lo:hi] + corr) / kq)
                    sq = final[lo:hi]
                    if sq.size > k:
                        kth = np.partition(sq, -k)[-k]
                        keep[lo:hi] = sq >= kth
            out.append(pa.table({
                "gkey": pa.array((qc_a[keep] << _DOC_BITS) | docid[keep]),
                "score": pa.array(final[keep])}))
        return pa.concat_tables(out) if out else _partial_empty()

    return _emit_ranked(_run_salt_tasks(score_salt, reader),
                        qids, k, reader)


def _check_unique_qids(queries: list[tuple[str, str]]) -> list[str]:
    """Batch qids key the packed qcode space — a repeated qid would
    silently merge two queries' term sets under one code (ADVICE r1)."""
    from collections import Counter
    qids = [qid for qid, _ in queries]
    dups = sorted(q for q, c in Counter(qids).items() if c > 1)
    if dups:
        raise ValueError(f"duplicate qids in query batch: {dups}")
    return qids


def _partial_empty() -> pa.Table:
    return pa.table({"gkey": pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())})


def _empty() -> pa.Table:
    return pa.table({"qid": pa.array([], pa.string()),
                     "external_id": pa.array([], pa.string()),
                     "rank": pa.array([], pa.int32()),
                     "score": pa.array([], pa.float64())})


# ---------------------------------------------------------- structured

def _derive_lists(reader: IndexReader, iop_plans_by_field: dict):
    """Phase A of the distributed structured paths: evaluate every Iop
    subtree (#NEAR/#WINDOW/#SYN) per salt and return
    ``({salt: ObjectRef[pa.Table]}, {leaf: (df, ctf)})``.

    Partitioning contract: salt = contiguous docid range, one postings
    row per (term, salt), so ONE TASK PER SALT holds ALL argument
    terms' postings for its docid range — each task runs its own
    column/row-group-pruned local pyarrow scan (term/field/salt filters
    hit parquet row-group stats) and the driver's positional kernels
    (``eval_iop_tree``: two-pointer #NEAR, min/max-head #WINDOW, #SYN
    union) unchanged. ZERO shuffle. A derived list's GLOBAL df/ctf
    (what the reference scores with, ``QryIop.java:139-151``) is the
    sum over its salt runs — the small driver-side aggregate returned
    alongside; only that (leaf, df, ctf) side ever reaches the driver.

    r3→r4 (ADVICE r3, medium): phase B used to ``map_batches`` over a
    materialized derived *dataset* assuming one block per salt — Ray
    Data's dynamic block splitting can split a large salt's output, so
    two tasks would both score that salt's plain terms and each would
    hold only part of its Iop rows (duplicated candidates with partial
    sums; ``_emit_ranked`` never re-aggregates). Derived rows now
    travel as ONE object-store table per salt (raw task,
    ``num_returns=2``) and phase B is driven by salt descriptors
    (``_run_salt_tasks``) fetching ``derived_refs[s]`` — exactly-once
    per salt by construction. Raw tasks, not Dataset: the Dataset API
    cannot hand a downstream stage per-key block refs across the
    global-stats barrier.

    The task is a CLOSURE (re-exported per call), not a module-level
    remote fn: this package pickles by value (``__init__.py``), so a
    plan instance shipped in a separate ``ray.put`` payload would carry
    its own copy of the node classes and fail ``eval_iop_tree``'s
    ``isinstance`` against the kernels' copy — one closure payload
    keeps plans and kernels class-consistent."""
    from .eval import InvList, eval_iop_tree
    from .plan import TermNode

    index_dir = reader.index_dir
    dl_token = reader.stats_token
    if not any(plans for plans in iop_plans_by_field.values()):
        return {}, {}
    terms_by_field: dict[str, list[str]] = {}
    for fld, plans in iop_plans_by_field.items():
        acc: set[str] = set()
        for plan in plans.values():
            stack = [plan]
            while stack:
                n = stack.pop()
                if isinstance(n, TermNode):
                    acc.add(n.term)
                else:
                    stack.extend(n.args)
        terms_by_field[fld] = sorted(acc)
    all_terms = sorted({t for ts in terms_by_field.values() for t in ts})
    paths = tuple(reader._bucket_paths(all_terms)) if all_terms else ()
    field_items = sorted((fld, sorted(plans.items()))
                         for fld, plans in iop_plans_by_field.items())
    n_salts = int(reader.stats.get("merge_salts", 4))

    @ray.remote(num_returns=2)
    def derive_salt(s: int):
        """→ (stats_table, derived_table) for ONE salt: the tiny
        (leaf, df, ctf) side the driver sums for global stats, and the
        blob side (leaf, field, docid_blob, tf_blob) that stays in the
        object store until the matching phase-B salt task fetches it."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        from ..index.varbyte import encode_postings
        from ..util import proc_cached
        dset = proc_cached(("postings_dset", index_dir, dl_token, paths),
                           lambda: pads.dataset(list(paths),
                                                format="parquet")) \
            if paths else None
        rows = {c: [] for c in ("leaf", "field", "df", "ctf",
                                "docid_blob", "tf_blob")}
        for fld, items in field_items:
            if dset is None:
                continue
            t = dset.to_table(
                columns=["term", "docid_blob", "tf_blob", "pos_blob"],
                filter=(pc.field("term").isin(terms_by_field[fld])
                        & (pc.field("field") == fld)
                        & (pc.field("salt") == int(s))))
            cache = {}
            for trm, db, tb, pb in zip(t["term"].to_pylist(),
                                       t["docid_blob"].to_pylist(),
                                       t["tf_blob"].to_pylist(),
                                       t["pos_blob"].to_pylist()):
                d, tf, p = decode_postings(db, tb, pb)
                cache[(trm, fld)] = InvList(
                    d, tf, p if p is not None else np.empty(0, np.int32),
                    int(d.size), int(tf.sum()), fld)
            for key, plan in items:
                inv = eval_iop_tree(plan, cache)
                if inv.df == 0:
                    continue
                db2, tb2, _ = encode_postings(
                    inv.docids, inv.tfs, np.empty(0, np.int64))
                rows["leaf"].append(key)
                rows["field"].append(fld)
                rows["df"].append(int(inv.df))
                rows["ctf"].append(int(inv.ctf))
                rows["docid_blob"].append(db2)
                rows["tf_blob"].append(tb2)
        stats_tbl = pa.table({
            "leaf": pa.array(rows["leaf"], pa.string()),
            "df": pa.array(rows["df"], pa.int64()),
            "ctf": pa.array(rows["ctf"], pa.int64())})
        derived_tbl = pa.table({
            "leaf": pa.array(rows["leaf"], pa.string()),
            "field": pa.array(rows["field"], pa.string()),
            "docid_blob": pa.array(rows["docid_blob"], pa.binary()),
            "tf_blob": pa.array(rows["tf_blob"], pa.binary())})
        return stats_tbl, derived_tbl

    pairs = {s: derive_salt.remote(s) for s in range(n_salts)}
    stats: dict[str, tuple[int, int]] = {}
    for s in range(n_salts):
        st = ray.get(pairs[s][0])
        for lf, dfv, ctfv in zip(st["leaf"].to_pylist(),
                                 st["df"].to_pylist(),
                                 st["ctf"].to_pylist()):
            d0, c0 = stats.get(lf, (0, 0))
            stats[lf] = (d0 + dfv, c0 + ctfv)
    return {s: pairs[s][1] for s in range(n_salts)}, stats


def bm25_structured_batch_search(index_dir: str,
                                 queries: list[tuple[str, str]],
                                 model: BM25Model | None = None,
                                 k: int = 100,
                                 field: str = "body") -> pa.Table:
    """Distributed structured BM25: ``#SUM`` over TERM and positional
    (``#NEAR/n`` / ``#WINDOW/n`` / ``#SYN``) leaves — the reference's
    BoW + SDM-shaped query set (``queries2.txt``), batch-scored as one
    Ray Data pipeline.

    Partitioning contract: a positional operator is docid-local, and the
    index stores each term's postings as ONE row per salt where salt =
    contiguous docid range (build.py step 5). ONE TASK PER SALT
    (phase A, ``_derive_lists``) therefore holds, for its docid range,
    ALL argument terms' postings — it runs the driver's own Iop kernels
    (``eval_iop_tree``: two-pointer #NEAR, min/max-head #WINDOW, #SYN
    union) unchanged, emitting derived posting runs into the object
    store keyed by salt. Phase parallelism equals ``merge_salts``,
    which auto-sizes with the corpus (build.py ``docs_per_salt``; at
    cluster scale salts number in the thousands). A derived list's
    df/ctf (what the reference scores with, ``QryIop.java:139-151``)
    is the SUM over its salt runs — a tiny driver-side aggregation
    between the phases.

    Phase B is one task per salt again (``_run_salt_tasks``): it
    fetches the salt's derived rows whole, reads the salt's plain-term
    postings locally (column/row-group-pruned scan), and finishes the
    (query, doc) #SUM with an exact per-salt top-k cut — zero shuffle
    end to end. Rank- and score-identical to ``QueryEngine.search``
    per query (tests/test_query_engine.py).
    """
    from .models import BM25Model as _BM25
    from .parser import QueryParser
    from .plan import IopNode, ScoreNode, SopNode, TermNode

    model = model or _BM25()
    reader = IndexReader(index_dir)
    an = analyzer_for_mode(reader.stats.get("analyzer", "lucene"))
    parser = QueryParser(an, default_field=field)

    qids = _check_unique_qids(queries)
    qcode = {qid: i for i, qid in enumerate(qids)}

    def leaves_of(plan):
        """Flatten a parsed plan to #SUM leaves (TermNode | IopNode)."""
        if plan is None:
            return []
        if isinstance(plan, ScoreNode):
            return [plan.child]
        if isinstance(plan, (TermNode, IopNode)):
            return [plan]
        if isinstance(plan, SopNode) and plan.op == "sum":
            out = []
            for a in plan.args:
                out.extend(leaves_of(a))
            return out
        raise ValueError(
            "distributed structured path supports #SUM over term/"
            f"positional leaves only; got #{getattr(plan, 'op', plan)} "
            "(deeper trees stay on the driver path)")

    # leaf key → [(qcode, mult)]; term key = "t:<field>:<term>", iop key
    # = "i:<field>:<repr>" — per-field keys let one batch mix fields
    # (each field scores with its OWN df/doclen/avglen stats, matching
    # the reference's per-field model — QryParser.java:156-158)
    term_leaves: dict[str, list[tuple[int, int]]] = {}
    iop_plans_by_field: dict[str, dict[str, "IopNode"]] = {}
    iop_leaves: dict[str, list[tuple[int, int]]] = {}
    for qid, q in queries:
        # same plan-time wildcard/fuzzy/regexp -> #SYN rewrite as the
        # driver engine, so wildcards mean the same thing on this path
        plan = expand_wildcards(parser.parse(q, "#sum"), reader)
        counts: dict[str, int] = {}
        for leaf in leaves_of(plan):
            if isinstance(leaf, TermNode):
                key = f"t:{leaf.field}:{leaf.term}"
            else:
                fld = leaf.field_name
                key = f"i:{fld}:{leaf!r}"
                iop_plans_by_field.setdefault(fld, {})[key] = leaf
            counts[key] = counts.get(key, 0) + 1
        for key, m in counts.items():
            dst = term_leaves if key.startswith("t:") else iop_leaves
            dst.setdefault(key, []).append((qcode[qid], m))
    # field → its plain terms
    terms_by_field: dict[str, list[str]] = {}
    for key in term_leaves:
        _, fld, trm = key.split(":", 2)
        terms_by_field.setdefault(fld, []).append(trm)
    if not term_leaves and not iop_leaves:
        return _empty()

    N = reader.n_docs
    avglens = {f: reader.avg_len(f)
               for f in set(terms_by_field) | set(iop_plans_by_field)}
    pid_offsets = reader.pid_offsets
    dl_token = reader.stats_token
    k1, b = model.k1, model.b

    # ---- phase A: derived lists, one task per salt, zero shuffle ----
    derived_refs, dstats = _derive_lists(reader, iop_plans_by_field)
    ddf = {lf: d for lf, (d, _) in dstats.items()}

    # global plain-term stats (metadata-only scan) + per-field read sets
    tstats_by_field: dict[str, dict[str, int]] = {}
    paths_by_field: dict[str, tuple[list[str], tuple[str, ...]]] = {}
    for tfld, tlist in sorted(terms_by_field.items()):
        plain = sorted(set(tlist))
        paths_f = reader._bucket_paths(plain)
        if not paths_f:
            continue
        paths_by_field[tfld] = (plain, tuple(paths_f))
        tstats_by_field[tfld] = {
            t: d for t, (d, _) in _global_term_stats(
                index_dir, reader, plain, tfld).items()}

    def _idf(df: int) -> float:
        return max(0.0, float(np.log((N - df + 0.5) / (df + 0.5))))

    # idf-clamped leaves score 0 but still create candidates — only then
    # does the dense group-sum need its zero-candidate bincount
    any_zero_idf = any(
        _idf(d) == 0.0
        for dmap in ([ddf] + list(tstats_by_field.values()))
        for d in dmap.values() if d > 0)

    il_ref = ray.put(iop_leaves)
    ddf_ref = ray.put(ddf)
    tl_ref = ray.put(term_leaves)
    ts_ref = ray.put(tstats_by_field)
    pb_ref = ray.put(paths_by_field)

    # ---- phase B: one task per salt descriptor (_run_salt_tasks) —
    # the salt's derived rows are fetched whole from the object store
    # (derived_refs[s]) and plain-term postings for that docid range
    # are read LOCALLY, so the (query, doc) sums are final inside the
    # task — exact per-salt top-k cut, no packed-key groupby (see
    # bm25_batch_search). Descriptor-driven, so each salt is scored
    # exactly once regardless of block splitting (ADVICE r3). ----
    def score_salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        from ..util import proc_cached
        il = ray.get(il_ref)
        ddf_l = ray.get(ddf_ref)
        tl = ray.get(tl_ref)
        ts = ray.get(ts_ref)
        pb = ray.get(pb_ref)
        dlens_by: dict[str, _ShardedDoclens] = {}

        def dlens(fld: str) -> _ShardedDoclens:
            dl = dlens_by.get(fld)
            if dl is None:
                dl = dlens_by[fld] = _ShardedDoclens(
                    index_dir, fld, pid_offsets, dl_token)
            return dl

        def bm25_leaf(fld, df, docids, tfs):
            idf = max(0.0, float(np.log((N - df + 0.5) / (df + 0.5))))
            dl = dlens(fld).get(docids).astype(np.float64)
            tf = tfs.astype(np.float64)
            return idf * (tf / (tf + k1 * ((1.0 - b)
                                           + b * dl / avglens[fld])))

        out: list[pa.Table] = []
        for s in batch["salt"].to_pylist():
            entries = []
            bt = ray.get(derived_refs[s]) if s in derived_refs else None
            if bt is not None and bt.num_rows:
                for lf, fldv, db, tb in zip(bt["leaf"].to_pylist(),
                                            bt["field"].to_pylist(),
                                            bt["docid_blob"].to_pylist(),
                                            bt["tf_blob"].to_pylist()):
                    d, tf, _ = decode_postings(db, tb, None)
                    sc = bm25_leaf(fldv, ddf_l[lf], d, tf)
                    for qc, mult in il[lf]:
                        entries.append((qc, d,
                                        sc if mult == 1 else sc * mult))
            for fld, (plain, paths_f) in sorted(pb.items()):
                dset = proc_cached(
                    ("postings_dset", index_dir, dl_token, paths_f),
                    lambda p=paths_f: pads.dataset(list(p),
                                                   format="parquet"))
                t = dset.to_table(
                    columns=["term", "docid_blob", "tf_blob"],
                    filter=(pc.field("term").isin(plain)
                            & (pc.field("field") == fld)
                            & (pc.field("salt") == int(s))))
                for trm, db2, tb2 in zip(t["term"].to_pylist(),
                                         t["docid_blob"].to_pylist(),
                                         t["tf_blob"].to_pylist()):
                    d, tf, _ = decode_postings(db2, tb2, None)
                    sc = bm25_leaf(fld, ts[fld].get(trm, 0), d, tf)
                    for qc, mult in tl[f"t:{fld}:{trm}"]:
                        entries.append((qc, d,
                                        sc if mult == 1 else sc * mult))
            qc_a, docid, sums = _group_sum_entries(
                entries, need_zero_candidates=any_zero_idf)
            if qc_a.size:
                keep = _topk_cut_sorted(qc_a, sums, k)
                out.append(pa.table({
                    "gkey": pa.array((qc_a[keep] << _DOC_BITS)
                                     | docid[keep]),
                    "score": pa.array(sums[keep])}))
        return pa.concat_tables(out) if out else _partial_empty()

    return _emit_ranked(_run_salt_tasks(score_salt, reader),
                        qids, k, reader)


def indri_structured_batch_search(index_dir: str,
                                  queries: list[tuple[str, str]],
                                  model=None, k: int = 100,
                                  field: str = "body") -> pa.Table:
    """Distributed structured Indri: trees of ``#AND`` / ``#WAND`` over
    TERM and positional leaves — the reference's SDM query class
    (``dm.pl``; e.g. ``#wand(0.7 #and(a b) 0.2 #and(#near/1(a b)) 0.1
    #and(#window/8(a b)))``).

    Geometric-mean trees are log-linear: flattening the tree multiplies
    weights along the path, so

        log score(d) = Σ_leaves c_l · log s_l(d)
                     = Σ_matched c_l·(log s_l(tf,dl) − log s_l(0,dl))
                       + Σ_all-leaves c_l·log s_l(0,dl)

    where ``c_l`` is the folded coefficient (1/k per #AND level, w/Σw
    per #WAND level). The first sum is the dense per-salt group-sum
    over posting rows (terms + the salt's derived positional lists,
    phase A = ``_derive_lists``); the second is the per-candidate
    default-score correction computed from sharded doclens inside the
    same salt task, using each leaf's mle = ctf/collection_len
    (DERIVED ctf for positional leaves — ``QryIop.java:139-151``).

    ``#WSUM`` (arithmetic mean, ``QrySopWsum``) is not log-linear, but
    it factors per SUBTREE: a #WSUM spine (nested #WSUM flattens
    linearly: outer weights multiply) over J log-linear subtrees gives

        score(d) = Σ_j W_j · exp( S_j(d) + corr_j(dl) )

    with ``S_j`` the subtree's matched-leaf group-sum and ``corr_j``
    its all-leaves default correction; a doc that matches no leaf of
    subtree j contributes its pure default ``W_j·exp(corr_j)``. The
    packed key carries ``(qcode·J + j)`` in the high bits, and because
    a salt is a disjoint docid range, every subtree sum for a doc is
    complete inside its salt task — the arithmetic mix and the exact
    per-query cut run there too, zero shuffle. #WSUM below a
    #AND/#WAND (log of a sum — not factorizable) still raises to the
    driver path. Rank- and score-identical to ``QueryEngine.search``."""
    from .models import IndriModel
    from .parser import QueryParser
    from .plan import IopNode, ScoreNode, SopNode, TermNode

    model = model or IndriModel()
    reader = IndexReader(index_dir)
    an = analyzer_for_mode(reader.stats.get("analyzer", "lucene"))
    parser = QueryParser(an, default_field=field)
    mu, lam = model.mu, model.lambda_

    qids = _check_unique_qids(queries)
    iop_plans: dict = {}

    def flatten(plan, coef, acc):
        if isinstance(plan, ScoreNode):
            flatten(plan.child, coef, acc)
        elif isinstance(plan, TermNode):
            if plan.field != field:
                raise ValueError(
                    f"distributed Indri scores field {field!r} only; "
                    f"leaf uses {plan.field!r} — use the driver path")
            acc["t:" + plan.term] = acc.get("t:" + plan.term, 0.0) + coef
        elif isinstance(plan, IopNode):
            if plan.field_name != field:
                raise ValueError(
                    f"distributed Indri scores field {field!r} only; "
                    f"leaf uses {plan.field_name!r} — use the driver path")
            key = "i:" + repr(plan)
            iop_plans[key] = plan
            acc[key] = acc.get(key, 0.0) + coef
        elif isinstance(plan, SopNode) and plan.op == "and":
            for a in plan.args:
                flatten(a, coef / len(plan.args), acc)
        elif isinstance(plan, SopNode) and plan.op == "wand":
            sw = plan.sum_weight
            for a, w in zip(plan.args, plan.weights):
                flatten(a, coef * w / sw, acc)
        else:
            raise ValueError(
                "distributed Indri supports #WSUM spines over #AND/#WAND "
                f"trees over term/positional leaves; got "
                f"#{getattr(plan, 'op', plan)}")

    def spine(plan, w, out):
        """Split the top-level #WSUM spine (nested #WSUM multiplies the
        normalized outer weight) into (W_j, log-linear subtree) pairs."""
        if isinstance(plan, ScoreNode):
            spine(plan.child, w, out)
        elif isinstance(plan, SopNode) and plan.op == "wsum":
            sw = plan.sum_weight
            for a, aw in zip(plan.args, plan.weights):
                spine(a, w * aw / sw, out)
        else:
            out.append((w, plan))

    # per qcode: [(W_j, leaf key → coefficient)]
    q_subtrees: list[list[tuple[float, dict]]] = []
    for qid, q in queries:
        subs: list[tuple[float, dict]] = []
        plan = expand_wildcards(parser.parse(q, "#and"), reader)
        if plan is not None:
            parts: list = []
            spine(plan, 1.0, parts)
            for w, sub in parts:
                acc: dict = {}
                flatten(sub, 1.0, acc)
                subs.append((w, acc))
        q_subtrees.append(subs)
    all_leaves = sorted({lf for subs in q_subtrees
                         for _, acc in subs for lf in acc})
    if not all_leaves:
        return _empty()
    # subtree index j packs into the key's high bits next to qcode
    n_sub = max((len(s) for s in q_subtrees), default=1) or 1
    # gq = qc·n_sub + j must stay within the 19 bits above _DOC_BITS
    if len(qids) * n_sub >= (1 << (63 - _DOC_BITS)):
        raise ValueError("query batch × #WSUM subtree count overflows "
                         "the packed key space — split the batch")
    # leaf → [(gq, coef)] routing for the partial stage
    leaf_targets: dict[str, list[tuple[int, float]]] = {}
    for qc, subs in enumerate(q_subtrees):
        for j, (_, acc) in enumerate(subs):
            for lf, c in acc.items():
                leaf_targets.setdefault(lf, []).append((qc * n_sub + j, c))

    plain_terms = sorted({lf[2:] for lf in all_leaves if lf.startswith("t:")})

    # ---- phase A: derived lists + their (df, ctf), per salt ----
    derived_refs, dstats = _derive_lists(
        reader, {field: iop_plans} if iop_plans else {})

    clen = max(reader.sum_field_lengths(field), 1)
    tstats = _global_term_stats(index_dir, reader, plain_terms, field) \
        if plain_terms else {}
    mle_of = {("t:" + t): tstats.get(t, (0, 0))[1] / clen
              for t in plain_terms}
    mle_of.update({lf: c / clen for lf, (_, c) in dstats.items()})
    # leaves absent from the index entirely (no postings): mle = 0
    for lf in all_leaves:
        mle_of.setdefault(lf, 0.0)

    pid_offsets = reader.pid_offsets
    dl_token = reader.stats_token
    lt_ref = ray.put(leaf_targets)
    mle_ref = ray.put(mle_of)
    # per qcode: [(W_j, mle array, coef array)] over each subtree's
    # leaves (the default-score correction inputs)
    q_info = [[(w,
                np.array([mle_of[lf] for lf in sorted(acc)], dtype=np.float64),
                np.array([acc[lf] for lf in sorted(acc)], dtype=np.float64))
               for w, acc in subs]
              for subs in q_subtrees]
    qinfo_ref = ray.put(q_info)

    def _s(tf, dl, m):
        return (1.0 - lam) * (tf + mu * m) / (dl + mu) + lam * m

    tpaths = tuple(reader._bucket_paths(plain_terms)) if plain_terms else ()
    plain_sorted = sorted(plain_terms)

    # ---- phase B: one task per salt descriptor (_run_salt_tasks;
    # exactly-once per salt — ADVICE r3): the salt's derived rows come
    # whole from the object store (derived_refs[s]), plain-term
    # postings for its docid range are read LOCALLY, the matched
    # log-partials are summed by the dense group-sum, and the #WSUM
    # default-score mix + exact per-query cut run inside the task —
    # the packed-key groupby and the (qcode,docid) partition gymnastics
    # of the r2 design are gone.
    def score_salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        from ..util import proc_cached
        dlens = _ShardedDoclens(index_dir, field, pid_offsets, dl_token)
        lt = ray.get(lt_ref)
        mles_m = ray.get(mle_ref)
        qi = ray.get(qinfo_ref)
        dset = proc_cached(
            ("postings_dset", index_dir, dl_token, tpaths),
            lambda: pads.dataset(list(tpaths), format="parquet")) \
            if tpaths else None
        out: list[pa.Table] = []
        with np.errstate(divide="ignore", invalid="ignore"):
            for s in batch["salt"].to_pylist():
                entries = []

                def add(lf, docids, tfs):
                    if docids.size == 0:
                        return
                    dl = dlens.get(docids).astype(np.float64)
                    m = mles_m[lf]
                    part = (np.log(_s(tfs.astype(np.float64), dl, m))
                            - np.log(_s(0.0, dl, m)))
                    for gq, coef in lt[lf]:
                        entries.append((gq, docids, part * coef))

                bt = ray.get(derived_refs[s]) \
                    if s in derived_refs else None
                if bt is not None and bt.num_rows:
                    for lf, db, tb in zip(bt["leaf"].to_pylist(),
                                          bt["docid_blob"].to_pylist(),
                                          bt["tf_blob"].to_pylist()):
                        d, tf, _ = decode_postings(db, tb, None)
                        add(lf, d, tf)
                if dset is not None:
                    t = dset.to_table(
                        columns=["term", "docid_blob", "tf_blob"],
                        filter=(pc.field("term").isin(plain_sorted)
                                & (pc.field("field") == field)
                                & (pc.field("salt") == int(s))))
                    for trm, db2, tb2 in zip(t["term"].to_pylist(),
                                             t["docid_blob"].to_pylist(),
                                             t["tf_blob"].to_pylist()):
                        d, tf, _ = decode_postings(db2, tb2, None)
                        add("t:" + trm, d, tf)
                gq_a, docid, agg = _group_sum_entries(entries)
                if not gq_a.size:
                    continue
                qc_a = gq_a // n_sub
                j_a = gq_a % n_sub
                out_keys: list[np.ndarray] = []
                out_scores: list[np.ndarray] = []
                for lo, hi in _query_slices(qc_a):
                    q = int(qc_a[lo])
                    subs = qi[q]
                    if len(subs) == 1 and subs[0][0] == 1.0:
                        # pure log-linear tree: rows are already unique
                        # per candidate — final = exp(S + corr)
                        _, mlv_arr, coefs = subs[0]
                        cand = docid[lo:hi]
                        dlq = dlens.get(cand).astype(np.float64)
                        corr = np.zeros(dlq.size, dtype=np.float64)
                        for mlv, cv in zip(mlv_arr, coefs):
                            corr += cv * np.log(_s(0.0, dlq, mlv))
                        final = np.exp(agg[lo:hi] + corr)
                    else:
                        # #WSUM spine: candidates = docs with ≥1 subtree
                        # row; start from the all-defaults baseline
                        # Σ_j W_j·exp(corr_j(dl)), then swap in
                        # exp(S_j + corr_j) for each matched row
                        cand, cidx = np.unique(docid[lo:hi],
                                               return_inverse=True)
                        dlq = dlens.get(cand).astype(np.float64)
                        final = np.zeros(cand.size, dtype=np.float64)
                        aggq, jq = agg[lo:hi], j_a[lo:hi]
                        for j, (w, mlv_arr, coefs) in enumerate(subs):
                            corr = np.zeros(cand.size, dtype=np.float64)
                            for mlv, cv in zip(mlv_arr, coefs):
                                corr += cv * np.log(_s(0.0, dlq, mlv))
                            base = w * np.exp(corr)
                            final += base
                            rmsk = jq == j
                            ridx = cidx[rmsk]
                            final[ridx] += (w * np.exp(aggq[rmsk]
                                                       + corr[ridx])
                                            - base[ridx])
                    if cand.size > k:
                        kth = np.partition(final, -k)[-k]
                        keepq = final >= kth
                        cand, final = cand[keepq], final[keepq]
                    out_keys.append((np.int64(q) << _DOC_BITS) | cand)
                    out_scores.append(final)
                if out_keys:
                    out.append(pa.table({
                        "gkey": pa.array(np.concatenate(out_keys)),
                        "score": pa.array(np.concatenate(out_scores))}))
        return pa.concat_tables(out) if out else _partial_empty()

    return _emit_ranked(_run_salt_tasks(score_salt, reader),
                        qids, k, reader)
