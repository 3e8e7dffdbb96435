"""Driver-contract pipelines (``__ray_entry__.queries()``) and their
DuckDB oracle SQL, kept side by side so names and semantics stay in sync.

Each oracle-checked pipeline uses the *simple* analyzer mode
(``[a-z0-9]+`` runs on lowercased text) so DuckDB's
``string_split_regex(lower(text), '[^a-z0-9]+')`` reproduces tokenization
exactly; floats are rounded to 6 dp on both sides AFTER ranking. Ranked
pipelines order by (raw score desc, id asc) before rounding, so both
sides cut the same top-k set.

Rows-only pipelines (positional operators, PRF, sketch dedup, LSH ANN,
multimodal) exercise the full-analyzer engine; their correctness lives in
the pytest oracle suite (tests/oracle.py) instead.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..analysis.tokenizer import LUCENE_STOP_WORDS, simple_tokenize
from ..functions.text import round6
from ..index.build import IndexBuildConfig, build_index
from ..index.reader import IndexReader
from ..query.eval import QueryEngine
from ..query.models import (
    BM25Model, IndriModel, RankedBooleanModel, UnrankedBooleanModel,
)
from .corpus import pages_from_documents

_IDX_ROOT = "/tmp/se_ray_indexes"

SIMPLE_TOKS_SQL = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
                   "x -> len(x) > 0)")
_STOPLIST_SQL = "(" + ",".join(f"'{w}'" for w in sorted(LUCENE_STOP_WORDS)) + ")"
# tokens with 1-based positions (simple mode = dense positions)
POS_TOK_SQL = (f"select doc_id, unnest({SIMPLE_TOKS_SQL}) as term, "
               f"generate_subscripts({SIMPLE_TOKS_SQL}, 1) as pos from documents")


def get_index(sf_dir: str, mode: str, fields: dict | None = None) -> IndexReader:
    """Build (or resume) the index for one sf_dir + analyzer mode (+
    optional field map, e.g. body+url); cached on disk so repeated
    queries() calls are cheap."""
    fields = fields or {"body": "text"}
    tag = hashlib.md5(
        f"{sf_dir}|{sorted(fields.items())}".encode()).hexdigest()[:8]
    path = os.path.join(_IDX_ROOT, f"{tag}_{mode}")
    os.makedirs(path, exist_ok=True)
    import ray
    # leave headroom for the read/write task stages: an actor pool that
    # reserves every session CPU starves them and the pipeline stalls
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    cfg = IndexBuildConfig(num_buckets=16, docid_partitions=16,
                           analyzer=mode, fields=fields,
                           tokenize_concurrency=max(1, min(ncpu - 2, 8)))
    build_index(pages_from_documents(sf_dir), path, cfg,
                input_token=sf_dir, resume=True)
    return IndexReader(path)


def _docid_of_external(ext_ids: list[str]) -> np.ndarray:
    """external_id 'http://docs.example.com/00000042' → doc_id 42."""
    return np.array([int(e.rsplit("/", 1)[1]) for e in ext_ids], dtype=np.int64)


def _ranked_to_table(res: pa.Table, k: int | None = None) -> pa.Table:
    ids = _docid_of_external(res["external_id"].to_pylist())
    scores = round6(res["score"].to_pylist())
    if k is not None:
        ids, scores = ids[:k], scores[:k]
    return pa.table({"doc_id": pa.array(ids), "score": pa.array(scores)})


# ------------------------------------------------------------------ queries

def q_doc_token_counts(sf_dir: str):
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        n = [len(simple_tokenize(t or "")) for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": pa.array(np.asarray(n, dtype=np.int64))})
    return ds.map_batches(fn, batch_format="pyarrow")


SQL_DOC_TOKEN_COUNTS = f"""
select doc_id, len({SIMPLE_TOKS_SQL})::bigint as n_tokens from documents
"""


def q_term_df_ctf_top50(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        df: dict[str, int] = {}
        ctf: dict[str, int] = {}
        for t in b["text"].to_pylist():
            toks = simple_tokenize(t or "")
            for w in toks:
                ctf[w] = ctf.get(w, 0) + 1
            for w in set(toks):
                df[w] = df.get(w, 0) + 1
        terms = sorted(ctf)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "df": pa.array([df[t] for t in terms], pa.int64()),
            "ctf": pa.array([ctf[t] for t in terms], pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df", alias_name="df"),
                                   Sum("ctf", alias_name="ctf"))

    # per-partition top-50 cut BEFORE the driver collect: the groupby
    # output has unique terms, so a row outside its block's top 50 by
    # (ctf desc, term asc) cannot be in the global top 50 — the driver
    # merges ≤ 50×num_blocks rows, never the whole vocabulary
    def block_top50(bt: pa.Table) -> pa.Table:
        bdf = bt.to_pandas().sort_values(["ctf", "term"],
                                         ascending=[False, True]).head(50)
        return pa.Table.from_pandas(bdf.reset_index(drop=True),
                                    preserve_index=False)

    parts = pa.concat_tables(
        agg.map_batches(block_top50, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    pdf = parts.to_pandas().sort_values(["ctf", "term"],
                                        ascending=[False, True]).head(50)
    return pa.Table.from_pandas(pdf.reset_index(drop=True), preserve_index=False)


SQL_TERM_DF_CTF_TOP50 = f"""
with tok as (
  select doc_id, unnest({SIMPLE_TOKS_SQL}) as term from documents)
select term, count(distinct doc_id)::bigint as df, count(*)::bigint as ctf
from tok group by term order by ctf desc, term asc limit 50
"""


# "dup" is the one low-df term in the synthetic vocabulary; the others
# exercise the idf floor (df > N/2 → idf clamped to 0 on both sides)
BM25_QUERY_TERMS = ("dup", "line", "hash")


def q_index_bm25_top10(sf_dir: str):
    reader = get_index(sf_dir, "simple")
    engine = QueryEngine(reader, BM25Model(k1=1.2, b=0.75))
    res = engine.search(" ".join(BM25_QUERY_TERMS), k=10)
    return _ranked_to_table(res)


SQL_INDEX_BM25_TOP10 = f"""
with tok as (
  select doc_id, unnest({SIMPLE_TOKS_SQL}) as term from documents),
doclen as (select doc_id, count(*)::double as dl from tok group by doc_id),
stats as (select
  (select count(*) from documents)::double as n,
  (select count(*) from doclen)::double as dc,
  (select sum(dl) from doclen)::double as suml),
tfs as (select doc_id, term, count(*)::double as tf from tok
        where term in ('dup','line','hash') group by doc_id, term),
dfs as (select term, count(*)::double as df from tfs group by term),
scored as (
  select tfs.doc_id,
         sum(greatest(0.0, ln((stats.n - dfs.df + 0.5)/(dfs.df + 0.5)))
             * (tfs.tf / (tfs.tf + 1.2*((1.0-0.75) + 0.75*doclen.dl/(stats.suml/stats.dc)))))
           as raw
  from tfs
  join dfs on tfs.term = dfs.term
  join doclen on tfs.doc_id = doclen.doc_id
  cross join stats
  group by tfs.doc_id)
select doc_id, floor(raw*1000000 + 0.5)/1000000 as score from scored
order by raw desc, doc_id asc limit 10
"""


def q_index_bm25_maxscore_top10(sf_dir: str):
    """Same query + oracle as ``index_bm25_top10`` but scored through the
    MaxScore/block-max pruned path (query/maxscore.py) — the oracle match
    proves pruning is exact, not approximate."""
    from ..query.maxscore import bm25_maxscore_search
    reader = get_index(sf_dir, "simple")
    res = bm25_maxscore_search(reader, " ".join(BM25_QUERY_TERMS), k=10,
                               model=BM25Model(k1=1.2, b=0.75))
    return _ranked_to_table(res)


def q_bm25_multifield_top10(sf_dir: str):
    """BM25 #SUM over leaves in TWO fields (body + url) — the
    reference's multi-field model (``QryParser.java:156-158`` field
    whitelist; per-field df/doclen/avglen stats). The url field is the
    tokenized page url, so per-field statistics differ sharply from
    body. Oracle: DuckDB reconstructs the deterministic page url from
    doc_id and scores each field with its own stats."""
    reader = get_index(sf_dir, "simple",
                       fields={"body": "text", "url": "url"})
    engine = QueryEngine(reader, BM25Model(k1=1.2, b=0.75))
    res = engine.search("#sum(dup 00000007.url 00000008.url)", k=10)
    return _ranked_to_table(res)


SQL_BM25_MULTIFIELD_TOP10 = f"""
with tok as (
  select doc_id, unnest({SIMPLE_TOKS_SQL}) as term from documents),
utok as (
  select doc_id, unnest(list_filter(string_split_regex(
    lower('http://docs.example.com/' || printf('%08d', doc_id)),
    '[^a-z0-9]+'), x -> len(x) > 0)) as term from documents),
n as (select count(*)::double as v from documents),
bdl as (select doc_id, count(*)::double as dl from tok group by doc_id),
bstats as (select (select count(*) from bdl)::double as dc,
                  (select sum(dl) from bdl)::double as suml),
udl as (select doc_id, count(*)::double as dl from utok group by doc_id),
ustats as (select (select count(*) from udl)::double as dc,
                  (select sum(dl) from udl)::double as suml),
btf as (select doc_id, term, count(*)::double as tf from tok
        where term = 'dup' group by doc_id, term),
bdf as (select term, count(*)::double as df from btf group by term),
utf as (select doc_id, term, count(*)::double as tf from utok
        where term in ('00000007','00000008') group by doc_id, term),
udf as (select term, count(*)::double as df from utf group by term),
bscore as (
  select btf.doc_id,
         sum(greatest(0.0, ln((n.v - bdf.df + 0.5)/(bdf.df + 0.5)))
             * (btf.tf / (btf.tf + 1.2*((1.0-0.75)
                + 0.75*bdl.dl/(bstats.suml/bstats.dc))))) as s
  from btf join bdf using (term) join bdl using (doc_id)
  cross join n cross join bstats group by btf.doc_id),
uscore as (
  select utf.doc_id,
         sum(greatest(0.0, ln((n.v - udf.df + 0.5)/(udf.df + 0.5)))
             * (utf.tf / (utf.tf + 1.2*((1.0-0.75)
                + 0.75*udl.dl/(ustats.suml/ustats.dc))))) as s
  from utf join udf using (term) join udl using (doc_id)
  cross join n cross join ustats group by utf.doc_id),
scored as (
  select coalesce(b.doc_id, u.doc_id) as doc_id,
         coalesce(b.s, 0.0) + coalesce(u.s, 0.0) as raw
  from bscore b full outer join uscore u on b.doc_id = u.doc_id)
select doc_id, floor(raw*1000000 + 0.5)/1000000 as score from scored
order by raw desc, doc_id asc limit 10
"""


INDRI_QUERY_TERMS = ("dup", "sort", "merge")


def q_index_indri_top10(sf_dir: str):
    reader = get_index(sf_dir, "simple")
    engine = QueryEngine(reader, IndriModel(mu=2500, lambda_=0.4))
    res = engine.search(" ".join(INDRI_QUERY_TERMS), k=10)
    return _ranked_to_table(res)


SQL_INDEX_INDRI_TOP10 = f"""
with tok as (
  select doc_id, unnest({SIMPLE_TOKS_SQL}) as term from documents),
doclen as (select doc_id, count(*)::double as dl from tok group by doc_id),
suml as (select sum(dl)::double as v from doclen),
qterms as (select * from (values ('dup'),('sort'),('merge')) t(term)),
ctfs as (select term, count(*)::double as ctf from tok
         where term in (select term from qterms) group by term),
tfs as (select doc_id, term, count(*)::double as tf from tok
        where term in (select term from qterms) group by doc_id, term),
cands as (select distinct doc_id from tfs),
cells as (
  select c.doc_id, q.term,
         coalesce(tfs.tf, 0.0) as tf, ctfs.ctf, doclen.dl
  from cands c cross join qterms q
  join ctfs on ctfs.term = q.term
  join doclen on doclen.doc_id = c.doc_id
  left join tfs on tfs.doc_id = c.doc_id and tfs.term = q.term),
scored as (
  select doc_id,
         product(pow((1.0-0.4)*(tf + 2500.0*(ctf/suml.v))/(dl + 2500.0)
                     + 0.4*(ctf/suml.v), 1.0/3.0)) as raw
  from cells cross join suml group by doc_id)
select doc_id, floor(raw*1000000 + 0.5)/1000000 as score from scored
order by raw desc, doc_id asc limit 10
"""


def q_indri_batch_distributed(sf_dir: str):
    """Same query + oracle as ``index_indri_top10`` but scored through
    the distributed log-space Indri path (query/distributed.py) — the
    oracle match proves the groupby-sum factorization is exact."""
    from ..query.distributed import indri_batch_search
    reader = get_index(sf_dir, "simple")
    res = indri_batch_search(reader.index_dir,
                             [("q", " ".join(INDRI_QUERY_TERMS))],
                             IndriModel(mu=2500, lambda_=0.4), k=10)
    return _ranked_to_table(res.drop_columns(["qid"]))


_INDRI_LEAF_SQL = ("((1.0-0.4)*(tf + 2500.0*(ctf/suml.v))/(dl + 2500.0) "
                   "+ 0.4*(ctf/suml.v))")
_WOP_CTE_SQL = f"""
with tok as (
  select doc_id, unnest({SIMPLE_TOKS_SQL}) as term from documents),
doclen as (select doc_id, count(*)::double as dl from tok group by doc_id),
suml as (select sum(dl)::double as v from doclen),
qterms as (select * from (values ('dup', 0.6),('sort', 0.4)) t(term, w)),
ctfs as (select term, count(*)::double as ctf from tok
         where term in (select term from qterms) group by term),
tfs as (select doc_id, term, count(*)::double as tf from tok
        where term in (select term from qterms) group by doc_id, term),
cands as (select distinct doc_id from tfs),
cells as (
  select c.doc_id, q.term, q.w,
         coalesce(tfs.tf, 0.0) as tf, ctfs.ctf, doclen.dl
  from cands c cross join qterms q
  join ctfs on ctfs.term = q.term
  join doclen on doclen.doc_id = c.doc_id
  left join tfs on tfs.doc_id = c.doc_id and tfs.term = q.term)
"""

WOP_QUERY = "#wsum( 0.6 dup 0.4 sort )"


def q_wsum_indri_top10(sf_dir: str):
    """Indri #WSUM (weighted arithmetic mean with default-score fill,
    QrySopWSum.java:24-70) — oracle-checked."""
    reader = get_index(sf_dir, "simple")
    engine = QueryEngine(reader, IndriModel(mu=2500, lambda_=0.4))
    res = engine.search(WOP_QUERY, k=10)
    return _ranked_to_table(res)


SQL_WSUM_INDRI_TOP10 = f"""
{_WOP_CTE_SQL},
scored as (
  select doc_id, sum((w/1.0) * {_INDRI_LEAF_SQL}) as raw
  from cells cross join suml group by doc_id)
select doc_id, floor(raw*1000000 + 0.5)/1000000 as score from scored
order by raw desc, doc_id asc limit 10
"""


def q_wand_indri_top10(sf_dir: str):
    """Indri #WAND (weighted geometric mean with default-score fill,
    QrySopWAnd.java:20-62) — oracle-checked."""
    reader = get_index(sf_dir, "simple")
    engine = QueryEngine(reader, IndriModel(mu=2500, lambda_=0.4))
    res = engine.search("#wand( 0.6 dup 0.4 sort )", k=10)
    return _ranked_to_table(res)


SQL_WAND_INDRI_TOP10 = f"""
{_WOP_CTE_SQL},
scored as (
  select doc_id, product(pow({_INDRI_LEAF_SQL}, w/1.0)) as raw
  from cells cross join suml group by doc_id)
select doc_id, floor(raw*1000000 + 0.5)/1000000 as score from scored
order by raw desc, doc_id asc limit 10
"""


def q_wand_structured_distributed(sf_dir: str):
    """Same #WAND query + oracle as ``wand_indri_top10`` but scored via
    the distributed log-linear structured Indri path — the oracle match
    proves the tree flattening is exact."""
    from ..query.distributed import indri_structured_batch_search
    reader = get_index(sf_dir, "simple")
    res = indri_structured_batch_search(
        reader.index_dir, [("q", "#wand( 0.6 dup 0.4 sort )")],
        IndriModel(mu=2500, lambda_=0.4), k=10)
    return _ranked_to_table(res.drop_columns(["qid"]))


def q_sdm_structured_distributed(sf_dir: str):
    """Full SDM tree (#WAND of #AND / #NEAR / #WINDOW) distributed —
    rows-only (greedy positional tf not SQL-expressible); exactness vs
    the driver engine in tests/test_query_engine.py."""
    from ..query.distributed import indri_structured_batch_search
    reader = get_index(sf_dir, "lucene")
    return indri_structured_batch_search(
        reader.index_dir,
        [("sdm", "#wand( 0.7 #and( fast sort ) 0.2 #and( #near/1( fast"
                 " sort ) ) 0.1 #and( #window/8( fast sort ) ) )")],
        IndriModel(mu=2500, lambda_=0.4), k=100)


def q_ranked_and(sf_dir: str):
    reader = get_index(sf_dir, "simple")
    engine = QueryEngine(reader, RankedBooleanModel())
    res = engine.search("#and(fast sort)", k=10**9)
    return _ranked_to_table(res)


SQL_RANKED_AND = f"""
with tok as (
  select doc_id, unnest({SIMPLE_TOKS_SQL}) as term from documents),
tfs as (select doc_id, term, count(*)::double as tf from tok
        where term in ('fast','sort') group by doc_id, term)
select doc_id, floor(min(tf)*1000000 + 0.5)/1000000 as score from tfs
group by doc_id having count(distinct term) = 2
"""


def q_ranked_or(sf_dir: str):
    reader = get_index(sf_dir, "simple")
    engine = QueryEngine(reader, RankedBooleanModel())
    res = engine.search("#or(fast sort)", k=10**9)
    return _ranked_to_table(res)


SQL_RANKED_OR = f"""
with tok as (
  select doc_id, unnest({SIMPLE_TOKS_SQL}) as term from documents),
tfs as (select doc_id, term, count(*)::double as tf from tok
        where term in ('fast','sort') group by doc_id, term)
select doc_id, floor(max(tf)*1000000 + 0.5)/1000000 as score from tfs group by doc_id
"""


def q_unranked_and_count(sf_dir: str):
    reader = get_index(sf_dir, "simple")
    engine = QueryEngine(reader, UnrankedBooleanModel())
    res = engine.search("#and(fast sort merge)", k=10**9)
    return pa.table({"n_matches": pa.array([res.num_rows], pa.int64())})


SQL_UNRANKED_AND_COUNT = f"""
with tok as (
  select doc_id, unnest({SIMPLE_TOKS_SQL}) as term from documents)
select count(*)::bigint as n_matches from (
  select doc_id from tok where term in ('fast','sort','merge')
  group by doc_id having count(distinct term) = 3)
"""


def q_syn_ranked(sf_dir: str):
    """#SYN under ranked boolean: score = summed tf of the synonyms
    (QryIopSyn union semantics -> leaf tf scoring)."""
    reader = get_index(sf_dir, "simple")
    engine = QueryEngine(reader, RankedBooleanModel())
    res = engine.search("#syn(fast quick)", k=10**9)
    return _ranked_to_table(res)


SQL_SYN_RANKED = f"""
with tok as (
  select doc_id, unnest({SIMPLE_TOKS_SQL}) as term from documents)
select doc_id, floor(count(*)::double*1000000 + 0.5)/1000000 as score
from tok where term in ('fast','quick') group by doc_id
"""


def q_unranked_near_count(sf_dir: str):
    """#NEAR/1 existence is SQL-checkable: adjacency self-join on dense
    positions (the tf-bearing consume semantics stay pytest-oracle-
    checked; this gates the match set)."""
    reader = get_index(sf_dir, "simple")
    engine = QueryEngine(reader, UnrankedBooleanModel())
    res = engine.search("#near/1(fast sort)", k=10**9)
    return pa.table({"n_matches": pa.array([res.num_rows], pa.int64())})


SQL_UNRANKED_NEAR_COUNT = f"""
with tok as ({POS_TOK_SQL})
select count(*)::bigint as n_matches from (
  select distinct a.doc_id from tok a join tok b
    on a.doc_id = b.doc_id and b.pos = a.pos + 1
  where a.term = 'fast' and b.term = 'sort')
"""


def q_unranked_window_count(sf_dir: str):
    """#WINDOW/3 existence: any position pair with |pa-pb| < 3."""
    reader = get_index(sf_dir, "simple")
    engine = QueryEngine(reader, UnrankedBooleanModel())
    res = engine.search("#window/3(hash join)", k=10**9)
    return pa.table({"n_matches": pa.array([res.num_rows], pa.int64())})


SQL_UNRANKED_WINDOW_COUNT = f"""
with tok as ({POS_TOK_SQL})
select count(*)::bigint as n_matches from (
  select distinct a.doc_id from tok a join tok b
    on a.doc_id = b.doc_id and abs(a.pos - b.pos) < 3
  where a.term = 'hash' and b.term = 'join')
"""


def q_exact_dedup(sf_dir: str):
    import ray.data as rd
    from ..functions.dedup import exact_dedup
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return exact_dedup(ds)


SQL_EXACT_DEDUP = """
select md5(text) as content_hash, min(doc_id)::bigint as canonical_id,
       count(*)::bigint as n_dups
from documents group by text
"""


def q_lang_counts(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n"))


SQL_LANG_COUNTS = "select lang, count(*)::bigint as n from documents group by lang"


def q_quality_scores(sf_dir: str):
    import ray.data as rd
    from ..functions.text import quality_batch
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(lambda b: quality_batch(b), batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_tokens", "alpha_ratio",
                               "stopword_ratio", "mean_token_len"])


SQL_QUALITY_SCORES = f"""
with t as (select doc_id, text, {SIMPLE_TOKS_SQL} as toks from documents)
select doc_id,
  len(toks)::bigint as n_tokens,
  floor((case when len(text) > 0
        then len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::double / len(text)
        else 0.0 end)*1000000 + 0.5)/1000000 as alpha_ratio,
  floor((case when len(toks) > 0
        then len(list_filter(toks, x -> x in {_STOPLIST_SQL}))::double / len(toks)
        else 0.0 end)*1000000 + 0.5)/1000000 as stopword_ratio,
  floor((case when len(toks) > 0
        then list_aggregate(list_transform(toks, x -> len(x)), 'sum')::double / len(toks)
        else 0.0 end)*1000000 + 0.5)/1000000 as mean_token_len
from t
"""


def q_ann_cosine_top10(sf_dir: str):
    import ray.data as rd
    from ..functions.similarity import ann_cosine_topk
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qvec = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)[None, :]
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ann_cosine_topk(ds, qvec, k=10, dtype=np.float64).to_pandas()
    out = out.sort_values(["score", "vec_id"], ascending=[False, True],
                          kind="mergesort")
    return pa.table({
        "vec_id": pa.array(out["vec_id"].to_numpy(), pa.int64()),
        "score": pa.array(round6(out["score"].to_numpy())),
    })


SQL_ANN_COSINE_TOP10 = """
with q as (select embedding::DOUBLE[] as qv from embeddings where vec_id = 0)
select vec_id,
       floor(list_cosine_similarity(embedding::DOUBLE[], q.qv)*1000000 + 0.5)/1000000
         as score
from embeddings, q
order by list_cosine_similarity(embedding::DOUBLE[], q.qv) desc, vec_id asc
limit 10
"""


def q_top_docs_by_chars(sf_dir: str):
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    ds = ds.filter(expr="lang == 'en'")

    # per-block partial top-20 before the driver merge — the driver
    # never holds the full filtered table (at 100× scale the old
    # ``to_pandas()`` here is an OOM)
    def block_top20(bt: pa.Table) -> pa.Table:
        bdf = bt.to_pandas().sort_values(["n_chars", "doc_id"],
                                         ascending=[False, True]).head(20)
        return pa.Table.from_pandas(bdf.reset_index(drop=True),
                                    preserve_index=False)

    parts = pa.concat_tables(
        ds.map_batches(block_top20, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    pdf = parts.to_pandas().sort_values(["n_chars", "doc_id"],
                                        ascending=[False, True]).head(20)
    return pa.table({"doc_id": pa.array(pdf["doc_id"].to_numpy(), pa.int64()),
                     "n_chars": pa.array(pdf["n_chars"].to_numpy(), pa.int64())})


SQL_TOP_DOCS_BY_CHARS = """
select doc_id, n_chars from documents where lang = 'en'
order by n_chars desc, doc_id asc limit 20
"""


# ---------------------------------------------------------------- rows-only

def q_near_search(sf_dir: str):
    reader = get_index(sf_dir, "lucene")
    engine = QueryEngine(reader, BM25Model())
    return engine.search("#sum(#near/2(fast sort) merge)", k=100)


def q_structured_batch_distributed(sf_dir: str):
    """#NEAR/#WINDOW/#SYN evaluated distributed (per-salt co-group →
    derived lists → BM25 scoring); rank-identical to the driver engine
    (greedy positional tf is not SQL-expressible → rows-only here,
    engine-vs-engine equality in tests/test_query_engine.py)."""
    from ..query.distributed import bm25_structured_batch_search
    reader = get_index(sf_dir, "lucene")
    return bm25_structured_batch_search(
        reader.index_dir,
        [("near", "#sum(#near/2(fast sort) merge)"),
         ("window", "#sum(#window/8(hash join) table)"),
         ("syn", "#sum(#syn(fast quick) dup)")], k=100)


def q_window_search(sf_dir: str):
    reader = get_index(sf_dir, "lucene")
    engine = QueryEngine(reader, BM25Model())
    return engine.search("#sum(#window/8(fast sort) merge)", k=100)


def q_syn_search(sf_dir: str):
    reader = get_index(sf_dir, "lucene")
    engine = QueryEngine(reader, RankedBooleanModel())
    return engine.search("#or(#syn(fast quick) merge)", k=100)


def q_sdm_wand_search(sf_dir: str):
    reader = get_index(sf_dir, "lucene")
    engine = QueryEngine(reader, IndriModel(mu=2500, lambda_=0.4))
    q = ("#wand( 0.7 #and( fast sort ) 0.2 #and( #near/1( fast sort ) ) "
         "0.1 #and( #window/8( fast sort ) ) )")
    return engine.search(q, k=100)


def q_prf_expansion(sf_dir: str):
    from .prf import prf_search
    reader = get_index(sf_dir, "lucene")
    engine = QueryEngine(reader, IndriModel(mu=2500, lambda_=0.4))
    res, expanded = prf_search(engine, "fast sort", fb_docs=10, fb_terms=5,
                               fb_mu=0.0, fb_orig_weight=0.5, k=100)
    return res


def q_prf_terms_fb_mu0(sf_dir: str):
    """PRF expansion-term weights at fb_mu=0 over the SIMPLE index —
    p(t|d) = tf/dl, weight(t) = Σ_d p(t|d)·score_d·ln(clen/ctf): pure
    arithmetic over tf/doclen/ctf, hence SQL-expressible (the
    full-analyzer PRF pipeline stays rows-only as ``prf_expansion``).
    Initial ranking = the oracle-checked BM25 top-10."""
    from .prf import expansion_terms
    reader = get_index(sf_dir, "simple")
    engine = QueryEngine(reader, BM25Model(k1=1.2, b=0.75))
    initial = engine.search(" ".join(BM25_QUERY_TERMS), k=10)
    ids = initial["external_id"].to_pylist()
    scores = initial["score"].to_pylist()
    internal = [reader.internal_docid(e) for e in ids]
    best = expansion_terms(reader, list(zip(internal, scores)),
                           fb_docs=10, fb_terms=5, fb_mu=0.0)
    return pa.table({
        "term": pa.array([t for t, _ in best], pa.string()),
        "weight": pa.array(round6([w for _, w in best])),
    })


SQL_PRF_TERMS_FB_MU0 = f"""
with tok as (
  select doc_id, unnest({SIMPLE_TOKS_SQL}) as term from documents),
doclen as (select doc_id, count(*)::double as dl from tok group by doc_id),
stats as (select
  (select count(*) from documents)::double as n,
  (select count(*) from doclen)::double as dc,
  (select sum(dl) from doclen)::double as suml),
qtfs as (select doc_id, term, count(*)::double as tf from tok
         where term in ('dup','line','hash') group by doc_id, term),
qdfs as (select term, count(*)::double as df from qtfs group by term),
scored as (
  select qtfs.doc_id,
         sum(greatest(0.0, ln((stats.n - qdfs.df + 0.5)/(qdfs.df + 0.5)))
             * (qtfs.tf / (qtfs.tf + 1.2*((1.0-0.75)
                + 0.75*doclen.dl/(stats.suml/stats.dc))))) as raw
  from qtfs join qdfs using (term) join doclen using (doc_id)
  cross join stats group by qtfs.doc_id),
topd as (select doc_id, raw as score from scored
         order by raw desc, doc_id asc limit 10),
ttf as (select t.doc_id, t.term, count(*)::double as tf
        from tok t join topd using (doc_id) group by t.doc_id, t.term),
ctf as (select term, count(*)::double as ctf from tok
        where term in (select distinct term from ttf) group by term),
wt as (select ttf.term,
         sum((ttf.tf / doclen.dl) * topd.score
             * ln(stats.suml / ctf.ctf)) as w
       from ttf join topd using (doc_id) join doclen using (doc_id)
       join ctf using (term) cross join stats
       group by ttf.term)
select term, floor(w*1000000 + 0.5)/1000000 as weight from wt
order by w desc, term asc limit 5
"""


def q_bm25_multifield_distributed(sf_dir: str):
    """The multi-field BM25 query scored through the DISTRIBUTED
    structured path (per-field df/doclen/avglen routing in
    ``bm25_structured_batch_search``) — same oracle as the driver-path
    ``bm25_multifield_top10``."""
    from ..query.distributed import bm25_structured_batch_search
    reader = get_index(sf_dir, "simple",
                       fields={"body": "text", "url": "url"})
    res = bm25_structured_batch_search(
        reader.index_dir, [("1", "#sum(dup 00000007.url 00000008.url)")],
        BM25Model(k1=1.2, b=0.75), k=10)
    return _ranked_to_table(res)


def q_bm25_batch_distributed(sf_dir: str):
    from ..query.distributed import bm25_batch_search
    reader = get_index(sf_dir, "lucene")
    return bm25_batch_search(reader.index_dir,
                             [("1", "fast sort merge"), ("2", "hash join"),
                              ("3", "window scan table")], k=100)


def q_minhash_dedup(sf_dir: str):
    import ray.data as rd
    from ..functions.dedup import minhash_lsh_dedup
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return minhash_lsh_dedup(ds, jaccard_threshold=0.8)


def q_jaccard_verified_dedup(sf_dir: str):
    """MinHash-LSH candidates verified with TRUE n-gram Jaccard: the
    candidate set is small, so texts for just those ids are fetched with
    a pruned read and verified pairwise against their canonicals."""
    import ray.data as rd
    import pyarrow.compute as pc
    from ..functions.dedup import minhash_lsh_dedup, ngram_jaccard
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    cand = minhash_lsh_dedup(ds, jaccard_threshold=0.5).to_pandas()
    if cand.empty:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "canonical_id": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    ids = sorted(set(cand["doc_id"]) | set(cand["canonical_id"]))
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"],
                      filters=[("doc_id", "in", ids)])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    rows = []
    for d, c in zip(cand["doc_id"], cand["canonical_id"]):
        if d == c:
            continue
        j = ngram_jaccard(texts.get(int(d), ""), texts.get(int(c), ""))
        if j >= 0.5:
            rows.append((int(d), int(c), round(j, 6)))
    rows.sort()
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "canonical_id": pa.array([r[1] for r in rows], pa.int64()),
        "jaccard": pa.array([r[2] for r in rows], pa.float64()),
    })


def q_simhash_dedup(sf_dir: str):
    import ray.data as rd
    from ..functions.dedup import simhash_dedup
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return simhash_dedup(ds)


def q_lsh_ann(sf_dir: str):
    import ray.data as rd
    from ..functions.similarity import lsh_ann_topk
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qvecs = np.asarray(t["embedding"].to_pylist()[:3], dtype=np.float32)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return lsh_ann_topk(ds, qvecs, k=10)


def q_ivf_ann(sf_dir: str):
    import ray.data as rd
    from ..functions.similarity import ivf_ann_topk
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qvecs = np.asarray(t["embedding"].to_pylist()[:3], dtype=np.float32)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return ivf_ann_topk(ds, qvecs, k=10)


def q_language_id(sf_dir: str):
    import ray.data as rd
    from ..functions.text import language_id
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return language_id(ds).select_columns(["doc_id", "detected_lang"])


def _lang_sql_set(words) -> str:
    return "(" + ",".join(f"'{w}'" for w in sorted(words)) + ")"


def _language_id_sql() -> str:
    from ..functions.text import _LANG_PROFILES
    p = {k: _lang_sql_set(v) for k, v in _LANG_PROFILES.items()}
    # tie semantics mirror LanguageId.classify: langs are probed in
    # (en, de, fr, es) order and a later language needs STRICTLY more
    # hits to displace an earlier one; all-zero → 'unknown'
    return f"""
with tok as (
  select doc_id, unnest({SIMPLE_TOKS_SQL}) as term from documents),
hits as (
  select doc_id,
    count(*) filter (where term in {p['en']}) as en,
    count(*) filter (where term in {p['de']}) as de,
    count(*) filter (where term in {p['fr']}) as fr,
    count(*) filter (where term in {p['es']}) as es
  from tok group by doc_id)
select d.doc_id,
  case when coalesce(h.en, 0) > 0 and h.en >= h.de and h.en >= h.fr
            and h.en >= h.es then 'en'
       when coalesce(h.de, 0) > 0 and h.de > h.en and h.de >= h.fr
            and h.de >= h.es then 'de'
       when coalesce(h.fr, 0) > 0 and h.fr > h.en and h.fr > h.de
            and h.fr >= h.es then 'fr'
       when coalesce(h.es, 0) > 0 and h.es > h.en and h.es > h.de
            and h.es > h.fr then 'es'
       else 'unknown' end as detected_lang
from documents d left join hits h using (doc_id)
"""


SQL_LANGUAGE_ID = _language_id_sql()


_FP_B = 1099511628211                 # rolling-hash base (functions/text.py)
_FP_P = (1 << 61) - 1
_FP_POWS = ", ".join(f"({k}, {pow(_FP_B, k, _FP_P)}::hugeint)"
                     for k in range(8))


def q_doc_fingerprint(sf_dir: str):
    """Winnowing fingerprints EXPLODED to (doc_id, fp) rows so DuckDB
    can hash-compare them (list columns don't value-hash portably)."""
    import ray.data as rd
    from ..functions.text import doc_fingerprint
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    fps = doc_fingerprint(ds)

    def explode(b: pa.Table) -> pa.Table:
        ids, out_fp = [], []
        for i, fp in zip(b["doc_id"].to_pylist(),
                         b["fingerprint"].to_pylist()):
            for v in fp:
                ids.append(i)
                out_fp.append(int(v))          # < 2^61: safe in int64
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(out_fp, pa.int64())})

    return fps.map_batches(explode, batch_format="pyarrow")


# windows of 8 token hashes (zero-padded when a doc has < 8 tokens —
# the single s=1 window with absent positions contributing 0 mirrors
# functions/text.py's padding), keep cur % 16 == 0 plus the per-doc
# min as fallback; distinct values per doc.
SQL_DOC_FINGERPRINT = f"""
with tok as ({POS_TOK_SQL}),
h as (select doc_id, pos,
        (('0x' || substr(md5(term), 1, 16))::ubigint
          % {_FP_P}::ubigint)::hugeint as h
      from tok),
n as (select doc_id, max(pos) as n from h group by doc_id),
starts as (select doc_id, unnest(generate_series(1, greatest(n - 7, 1))) as s
           from n),
pw(k, v) as (values {_FP_POWS}),
win as (select st.doc_id, st.s,
          (sum(h.h * pw.v) % {_FP_P}::hugeint)::bigint as cur
        from starts st
        join h on h.doc_id = st.doc_id and h.pos between st.s and st.s + 7
        join pw on pw.k = st.s + 7 - h.pos
        group by st.doc_id, st.s),
sel as (select distinct doc_id, cur as fp from win where cur % 16 = 0),
fb as (select w.doc_id, min(w.cur) as fp from win w
       where not exists (select 1 from win w2
                         where w2.doc_id = w.doc_id and w2.cur % 16 = 0)
       group by w.doc_id)
select doc_id, fp from sel union select doc_id, fp from fb
"""


def q_xquad_rerank(sf_dir: str):
    """Diversified reranking: initial + 2 intent rankings → xQuAD."""
    from ..query.diversity import build_diversity_data, xquad
    reader = get_index(sf_dir, "lucene")
    engine = QueryEngine(reader, BM25Model())

    def ranking(q):
        t = engine.search(q, k=50)
        return list(zip(t["external_id"].to_pylist(),
                        t["score"].to_pylist()))

    data = build_diversity_data(
        "1", ranking("fast sort merge"),
        [ranking("fast scan"), ranking("merge join")], max_input=50)
    ranked = xquad(data, lam=0.4, max_result=20)
    return pa.table({
        "external_id": pa.array([e for e, _ in ranked], pa.string()),
        "rank": pa.array(np.arange(1, len(ranked) + 1, dtype=np.int32)),
        "score": pa.array([s for _, s in ranked], pa.float64()),
    })


def q_pm2_rerank(sf_dir: str):
    from ..query.diversity import build_diversity_data, pm2
    reader = get_index(sf_dir, "lucene")
    engine = QueryEngine(reader, BM25Model())

    def ranking(q):
        t = engine.search(q, k=50)
        return list(zip(t["external_id"].to_pylist(),
                        t["score"].to_pylist()))

    data = build_diversity_data(
        "1", ranking("hash join table"),
        [ranking("hash scan"), ranking("join merge")], max_input=50)
    ranked = pm2(data, lam=0.4, max_result=20)
    return pa.table({
        "external_id": pa.array([e for e, _ in ranked], pa.string()),
        "rank": pa.array(np.arange(1, len(ranked) + 1, dtype=np.int32)),
        "score": pa.array([s for _, s in ranked], pa.float64()),
    })


def q_letor_rerank(sf_dir: str):
    from ..query.letor import letor_rerank
    reader = get_index(sf_dir, "lucene")
    engine = QueryEngine(reader, BM25Model())
    t = engine.search("fast sort merge", k=50)
    initial = list(zip(t["external_id"].to_pylist(),
                       t["score"].to_pylist()))
    ranked = letor_rerank(reader, "fast sort merge", initial, k=20)
    return pa.table({
        "external_id": pa.array([e for e, _ in ranked], pa.string()),
        "rank": pa.array(np.arange(1, len(ranked) + 1, dtype=np.int32)),
        "score": pa.array([s for _, s in ranked], pa.float64()),
    })


def q_multimodal_decode(sf_dir: str):
    """Media decode plumbing over a payload DERIVED from the documents
    table (payload = utf-8 text bytes) so the fake md5 decoder is
    SQL-mirrorable; features exploded to (doc_id, i, feature)."""
    import ray.data as rd
    from ..functions.multimodal import decode_features
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def to_media(b: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": b["doc_id"],
            "kind": pa.array(["text"] * b.num_rows),
            "payload": pa.array([(t or "").encode() for t in
                                 b["text"].to_pylist()], pa.binary()),
        })

    feats = decode_features(docs.map_batches(to_media,
                                             batch_format="pyarrow"),
                            fake=True, batch_size=64)

    def explode(b: pa.Table) -> pa.Table:
        ids, idxs, vals = [], [], []
        for mid, fv in zip(b["media_id"].to_pylist(),
                           b["features"].to_pylist()):
            for i, f in enumerate(fv):
                ids.append(mid)
                idxs.append(i)
                vals.append(f)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "i": pa.array(idxs, pa.int32()),
                         "feature": pa.array(round6(np.asarray(vals)))})

    return feats.map_batches(explode, batch_format="pyarrow")


# byte i of md5(text) / 255 as float32, then 6-dp half-away rounding —
# the FLOAT cast reproduces the decoder's float32 precision exactly
SQL_MULTIMODAL_DECODE = """
with idx as (select unnest(generate_series(0, 15)) as i),
b as (select d.doc_id, idx.i,
        ('0x' || substr(md5(d.text), 2 * idx.i + 1, 2))::int as byte
      from documents d cross join idx)
select doc_id, i::int as i,
       floor(((byte / 255.0)::FLOAT)::DOUBLE * 1000000 + 0.5) / 1000000
         as feature
from b
"""


QUERIES = {
    # oracle-checked
    "doc_token_counts": q_doc_token_counts,
    "term_df_ctf_top50": q_term_df_ctf_top50,
    "index_bm25_top10": q_index_bm25_top10,
    "index_bm25_maxscore_top10": q_index_bm25_maxscore_top10,
    "bm25_multifield_top10": q_bm25_multifield_top10,
    "index_indri_top10": q_index_indri_top10,
    "indri_batch_distributed": q_indri_batch_distributed,
    "wsum_indri_top10": q_wsum_indri_top10,
    "wand_indri_top10": q_wand_indri_top10,
    "wand_structured_distributed": q_wand_structured_distributed,
    "ranked_and": q_ranked_and,
    "ranked_or": q_ranked_or,
    "unranked_and_count": q_unranked_and_count,
    "syn_ranked": q_syn_ranked,
    "unranked_near_count": q_unranked_near_count,
    "unranked_window_count": q_unranked_window_count,
    "exact_dedup": q_exact_dedup,
    "lang_counts": q_lang_counts,
    "quality_scores": q_quality_scores,
    "ann_cosine_top10": q_ann_cosine_top10,
    "top_docs_by_chars": q_top_docs_by_chars,
    "language_id": q_language_id,
    "doc_fingerprint": q_doc_fingerprint,
    "multimodal_decode": q_multimodal_decode,
    "prf_terms_fb_mu0": q_prf_terms_fb_mu0,
    "bm25_multifield_distributed": q_bm25_multifield_distributed,
    # rows-only (not SQL-expressible: positional ops, PRF, sketches, LSH)
    "near_search": q_near_search,
    "structured_batch_distributed": q_structured_batch_distributed,
    "sdm_structured_distributed": q_sdm_structured_distributed,
    "window_search": q_window_search,
    "syn_search": q_syn_search,
    "sdm_wand_search": q_sdm_wand_search,
    "prf_expansion": q_prf_expansion,
    "bm25_batch_distributed": q_bm25_batch_distributed,
    "minhash_dedup": q_minhash_dedup,
    "jaccard_verified_dedup": q_jaccard_verified_dedup,
    "simhash_dedup": q_simhash_dedup,
    "lsh_ann": q_lsh_ann,
    "ivf_ann": q_ivf_ann,
    "xquad_rerank": q_xquad_rerank,
    "pm2_rerank": q_pm2_rerank,
    "letor_rerank": q_letor_rerank,
}

ORACLE_SQL = {
    "doc_token_counts": SQL_DOC_TOKEN_COUNTS,
    "term_df_ctf_top50": SQL_TERM_DF_CTF_TOP50,
    "index_bm25_top10": SQL_INDEX_BM25_TOP10,
    "index_bm25_maxscore_top10": SQL_INDEX_BM25_TOP10,
    "bm25_multifield_top10": SQL_BM25_MULTIFIELD_TOP10,
    "index_indri_top10": SQL_INDEX_INDRI_TOP10,
    "indri_batch_distributed": SQL_INDEX_INDRI_TOP10,
    "wsum_indri_top10": SQL_WSUM_INDRI_TOP10,
    "wand_indri_top10": SQL_WAND_INDRI_TOP10,
    "wand_structured_distributed": SQL_WAND_INDRI_TOP10,
    "ranked_and": SQL_RANKED_AND,
    "ranked_or": SQL_RANKED_OR,
    "unranked_and_count": SQL_UNRANKED_AND_COUNT,
    "syn_ranked": SQL_SYN_RANKED,
    "unranked_near_count": SQL_UNRANKED_NEAR_COUNT,
    "unranked_window_count": SQL_UNRANKED_WINDOW_COUNT,
    "exact_dedup": SQL_EXACT_DEDUP,
    "lang_counts": SQL_LANG_COUNTS,
    "quality_scores": SQL_QUALITY_SCORES,
    "ann_cosine_top10": SQL_ANN_COSINE_TOP10,
    "top_docs_by_chars": SQL_TOP_DOCS_BY_CHARS,
    "language_id": SQL_LANGUAGE_ID,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "multimodal_decode": SQL_MULTIMODAL_DECODE,
    "prf_terms_fb_mu0": SQL_PRF_TERMS_FB_MU0,
    "bm25_multifield_distributed": SQL_BM25_MULTIFIELD_TOP10,
}
