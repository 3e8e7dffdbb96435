import numpy as np

from search_engines_ray.analysis import analyze


def test_stats(toy_index):
    r = toy_index
    # 8 rows - 1 duplicate url = 7 docs
    assert r.n_docs == 7
    # doc 6 has empty body; doc 7 is stopword-only but its slots count
    assert r.doc_count("body") == 6
    # sum of stopword-inclusive field lengths
    expected = sum(analyze(t)[2] for t in [
        "the quick brown fox jumps over the lazy dog",
        "a quick brown cat sat on the mat",
        "dogs and cats running quickly through fields",
        "the lazy dog sleeps near the lazy cat all day",
        "fox fox fox den", "", "the of and to a"])
    assert r.sum_field_lengths("body") == expected


def test_postings_df_ctf(toy_index):
    r = toy_index
    fox = r.postings("fox", "body")
    assert fox.df == 2 and fox.ctf == 4            # docs 1 and 5 (tf 1 + 3)
    dog = r.postings("dog", "body")                # docs 1, 3 (dogs), 4
    assert dog.df == 3 and dog.ctf == 3
    assert (np.diff(dog.docids) > 0).all()         # ascending docids
    assert r.postings("zzz", "body") is None
    # title field is indexed independently
    tfox = r.postings("fox", "title")
    assert tfox.df == 2                            # "quick fox", "fox den"


def test_positions_are_gap_preserving(toy_index):
    r = toy_index
    # "the lazy dog sleeps near the lazy cat all day"
    #  0   1    2   3      4    5   6    7   8   9   ("the" burns slots)
    lazy = r.postings("lazy", "body")
    docid = None
    ids = toy_index.external_ids()
    for d in lazy.docids:
        if ids[d] == "http://t.example.com/4":
            docid = d
    i = int(np.flatnonzero(lazy.docids == docid)[0])
    b = lazy.pos_bounds()
    assert lazy.positions[b[i]:b[i + 1]].tolist() == [1, 6]


def test_doclens_and_external_ids(toy_index):
    r = toy_index
    ids = r.external_ids()
    assert len(set(ids.tolist())) == 7
    lens = r.doclens("body")
    by_url = {ids[d]: int(lens[d]) for d in range(r.n_docs)}
    assert by_url["http://t.example.com/1"] == 9
    assert by_url["http://t.example.com/6"] == 0
    assert by_url["http://t.example.com/7"] == 5
    assert r.internal_docid("http://t.example.com/5") >= 0
    assert r.internal_docid("http://nope/") == -1


def test_docids_dense_and_deterministic(toy_index):
    r = toy_index
    meta = r._load_docmeta()
    assert meta["docid"].to_pylist() == list(range(7))


def test_term_vectors(toy_index):
    r = toy_index
    d = r.internal_docid("http://t.example.com/5")
    tv = r.term_vectors([d], "body")
    terms, pos, flen = tv[d]
    assert terms == ["fox", "fox", "fox", "den"]
    assert flen == 4


def test_pid_offsets_and_doclen_shards(toy_index):
    """pid_offsets partition [0, n_docs) into contiguous ranges; the
    per-pid doclen shards tile the dense doclens array exactly."""
    import numpy as np

    off = toy_index.pid_offsets
    assert off[0] == 0 and off[-1] == toy_index.n_docs
    assert (np.diff(off) >= 0).all()
    dense = toy_index.doclens("body")
    for p in range(off.size - 1):
        shard = toy_index.doclen_shard("body", p)
        assert shard.size == off[p + 1] - off[p]
        assert (shard == dense[off[p]:off[p + 1]]).all()


def test_external_ids_for_matches_dense(toy_index):
    import numpy as np

    dense = toy_index.external_ids()
    docids = np.array([0, toy_index.n_docs - 1, 1, 1, 0], dtype=np.int64)
    got = toy_index.external_ids_for(docids)
    assert list(got) == list(dense[docids])


def test_doclens_for_matches_dense(toy_index):
    """Candidate-set lookup (fresh reader, scan path) agrees with the
    dense array and never materializes it."""
    from search_engines_ray.index import IndexReader
    dense = toy_index.doclens("body")
    docids = np.array([0, 3, 3, toy_index.n_docs - 1], dtype=np.int64)
    r = IndexReader(toy_index.index_dir)
    got = r.doclens_for(docids, ["body"])["body"]
    assert list(got) == list(dense[docids])
    assert r._doclens == {} and r._external_ids is None


def test_internal_docids_for_fresh_reader(toy_index):
    from search_engines_ray.index import IndexReader
    r = IndexReader(toy_index.index_dir)
    ids = ["http://t.example.com/5", "http://nope/", "http://t.example.com/1"]
    got = r.internal_docids_for(ids)
    assert got[1] == -1
    assert got[0] == toy_index.internal_docid("http://t.example.com/5")
    assert got[2] == toy_index.internal_docid("http://t.example.com/1")
    assert r.internal_docid("http://nope/") == -1
    assert r._external_ids is None     # no dense array materialized


def test_search_never_materializes_dense_arrays(toy_index):
    """VERDICT r2 item 1: QueryEngine.search must not allocate any
    O(n_docs) driver array — doclens and external ids both answer from
    candidate-set scans."""
    from search_engines_ray.index import IndexReader
    from search_engines_ray.query import (
        BM25Model, IndriModel, QueryEngine,
    )
    for model in (BM25Model(k1=1.2, b=0.75), IndriModel(mu=2500, lambda_=0.4)):
        r = IndexReader(toy_index.index_dir)
        eng = QueryEngine(r, model)
        t = eng.search("#wsum( 0.5 fox 0.5 #near/1(brown cat) )"
                       if isinstance(model, IndriModel) else "quick fox", k=5)
        assert t.num_rows > 0
        assert r._doclens == {}, type(model).__name__
        assert r._external_ids is None, type(model).__name__


def test_merge_salts_auto_sizes_with_corpus(tmp_path, docs_pages):
    """VERDICT r3 item 1: merge_salts=None (the default) derives S from
    a docs-per-salt target at build time — a large corpus must pick
    S > 4 (here 500 docs / 50-per-salt target → 10), a small one floors
    at 4, and distributed search over the auto-sized index stays
    rank/score-identical to the driver engine."""
    import ray.data as rd

    from search_engines_ray.index import (
        IndexBuildConfig, IndexReader, build_index,
    )
    from search_engines_ray.query import BM25Model, QueryEngine
    from search_engines_ray.query.distributed import bm25_batch_search

    idx = str(tmp_path / "auto_salt")
    cfg = IndexBuildConfig(num_buckets=4, docid_partitions=16,
                           docs_per_salt=50)
    assert cfg.merge_salts is None
    build_index(rd.from_pandas(docs_pages), idx, cfg,
                input_token="autosalt", resume=False)
    r = IndexReader(idx)
    assert int(r.stats["merge_salts"]) == 10   # ceil(500/50), < P=16

    engine = QueryEngine(r, BM25Model())
    queries = [("1", "data system fast"), ("2", "search index")]
    dist = bm25_batch_search(idx, queries, k=20).to_pandas()
    for qid, q in queries:
        drv = engine.search(q, k=20).to_pandas()
        sub = dist[dist["qid"] == qid].reset_index(drop=True)
        assert list(sub["external_id"]) == list(drv["external_id"]), qid

    # small corpus floors at 4; explicit merge_salts is still honored
    cfg_small = IndexBuildConfig(num_buckets=4, docid_partitions=16)
    assert cfg_small.merge_salts is None
    idx2 = str(tmp_path / "auto_floor")
    build_index(rd.from_pandas(docs_pages.head(20)), idx2, cfg_small,
                input_token="floor", resume=False)
    assert int(IndexReader(idx2).stats["merge_salts"]) == 4


def test_positionless_index(tmp_path, toy_pages, ray_session):
    """store_positions=False: BM25 identical, footprint smaller,
    positional ops raise a clear error."""
    import os
    import ray.data as rd
    import numpy as np
    import pytest
    from search_engines_ray.index import (
        IndexBuildConfig, IndexReader, build_index)
    from search_engines_ray.query.eval import QueryEngine
    from search_engines_ray.query.models import BM25Model

    def build(d, store):
        build_index(rd.from_pandas(toy_pages), d,
                    IndexBuildConfig(fields={"body": "text"},
                                     num_buckets=4, docid_partitions=2,
                                     merge_salts=2, store_positions=store),
                    input_token=f"pos={store}", resume=False)
        return IndexReader(d)

    full = build(str(tmp_path / "pos"), True)
    bow = build(str(tmp_path / "nopos"), False)
    assert bow.stats["positions"] is False

    # BoW retrieval identical (positions never consulted)
    ef = QueryEngine(full, BM25Model()).search("quick fox lazy", k=10)
    eb = QueryEngine(bow, BM25Model()).search("quick fox lazy", k=10)
    assert ef["external_id"].to_pylist() == eb["external_id"].to_pylist()
    assert np.allclose(ef["score"].to_numpy(), eb["score"].to_numpy(),
                       rtol=0, atol=0)

    # df/ctf intact, positions absent
    p = bow.postings("fox", "body", positions=False)
    pf = full.postings("fox", "body", positions=False)
    assert (p.df, p.ctf) == (pf.df, pf.ctf)

    # positional access fails loudly, at fetch AND through the engine
    with pytest.raises(ValueError, match="store_positions"):
        bow.postings("fox", "body", positions=True)
    with pytest.raises(ValueError, match="store_positions"):
        QueryEngine(bow, BM25Model()).search("#near/1(quick fox)", k=10)

    def dir_bytes(d):
        return sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(os.path.join(d, "postings"))
                   for f in fs)

    assert dir_bytes(str(tmp_path / "nopos")) < dir_bytes(
        str(tmp_path / "pos"))


def test_docvalues_attributes(tmp_path, ray_session):
    """Doc-values plane: attribute columns stored at build, candidate
    -aligned fetch, pruned range/equality scans, sort-by-field search,
    and loud errors for unknown attributes. Streaming and lineage
    forward paths must store identical values."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from search_engines_ray.index import (
        IndexBuildConfig, IndexReader, build_index)
    from search_engines_ray.query.eval import QueryEngine
    from search_engines_ray.query.models import BM25Model

    rows = [{"url": f"http://a.example.com/{i:03d}",
             "text": f"alpha beta {'dup ' if i % 2 else ''}gamma",
             "stars": i * 10, "lang": "en" if i < 6 else "fr"}
            for i in range(9)]
    readers = {}
    for name, lineage in (("s", False), ("l", True)):
        d = str(tmp_path / name)
        build_index(rd.from_items(rows), d,
                    IndexBuildConfig(num_buckets=4, docid_partitions=4,
                                     analyzer="simple", lineage=lineage,
                                     attributes={"stars": "stars",
                                                 "lang": "lang"}),
                    input_token="dv", resume=False)
        readers[name] = IndexReader(d)
    r = readers["s"]
    assert sorted(r.attributes) == ["lang", "stars"]
    # aligned fetch across pid boundaries, arbitrary order
    ids = np.array(sorted(r.internal_docid(f"http://a.example.com/{i:03d}")
                          for i in (8, 0, 5)))
    got = r.attributes_for(ids, ["stars", "lang"])
    exts = r.external_ids_for(ids)
    want = {u: (int(u[-3:]) * 10, "en" if int(u[-3:]) < 6 else "fr")
            for u in exts}
    assert [int(v) for v in got["stars"]] == [want[u][0] for u in exts]
    assert list(got["lang"]) == [want[u][1] for u in exts]
    # range / equality scans
    mid = r.docids_where("stars", lo=20, hi=60)
    assert sorted(int(s) for s in
                  r.attributes_for(mid, ["stars"])["stars"]) == [20, 30, 40, 50]
    fr = r.docids_where("lang", value="fr")
    assert len(fr) == 3
    # lineage path stores the same values (keyed by external id)
    rl = readers["l"]
    ids_l = np.arange(rl.n_docs)
    by_ext = dict(zip(rl.external_ids_for(ids_l),
                      rl.attributes_for(ids_l, ["stars"])["stars"]))
    ids_s = np.arange(r.n_docs)
    by_ext_s = dict(zip(r.external_ids_for(ids_s),
                        r.attributes_for(ids_s, ["stars"])["stars"]))
    assert {k: int(v) for k, v in by_ext.items()} == \
           {k: int(v) for k, v in by_ext_s.items()}
    # sort-by-field: 'dup' matches odd docs, stars desc == doc desc
    eng = QueryEngine(r, BM25Model())
    t = eng.search_sorted("dup", attr="stars", k=3, descending=True)
    assert [int(u[-3:]) for u in t["external_id"].to_pylist()] == [7, 5, 3]
    assert [int(s) for s in t["stars"].to_pylist()] == [70, 50, 30]
    # unknown attribute: loud
    with pytest.raises(KeyError):
        r.attributes_for(ids, ["nope"])
    with pytest.raises(KeyError):
        r.docids_where("nope", value=1)
    with pytest.raises(ValueError):
        r.docids_where("stars")


def test_index_verify(toy_index, tmp_path, ray_session):
    """cmd_verify: a healthy index passes every invariant; corrupting a
    postings run's df metadata is detected."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from search_engines_ray.index import IndexReader
    from search_engines_ray.index.inspect import cmd_verify

    out = cmd_verify(toy_index)
    assert out["ok"], out
    assert out["postings"]["bad_runs"] == 0
    # corrupt a copy: bump one run's df
    dst = str(tmp_path / "corrupt")
    shutil.copytree(toy_index.index_dir, dst)
    pdir = os.path.join(dst, "postings")
    target = None
    for d in sorted(os.listdir(pdir)):
        full = os.path.join(pdir, d)
        if os.path.isdir(full):
            for f in sorted(os.listdir(full)):
                if f.endswith(".parquet"):
                    target = os.path.join(full, f)
                    break
        if target:
            break
    t = pq.read_table(target)
    df_col = t["df"].to_pylist()
    df_col[0] += 1
    import pyarrow as pa
    t = t.set_column(t.schema.get_field_index("df"), "df",
                     pa.array(df_col, t.schema.field("df").type))
    pq.write_table(t, target)
    bad = cmd_verify(IndexReader(dst))
    assert not bad["ok"]
    assert bad["postings"]["bad_runs"] >= 1


def test_index_time_synonyms(tmp_path, ray_session):
    """index_synonyms injects analyzed-form synonyms at the SAME
    position (Lucene SynonymFilter posIncrement=0): tf/df grow, field
    length does not, and positional operators see the synonym exactly
    where the source term sits."""
    import pandas as pd
    import ray.data as rd
    from search_engines_ray.index import (
        IndexBuildConfig, IndexReader, build_index)
    from search_engines_ray.query.eval import QueryEngine
    from search_engines_ray.query.models import RankedBooleanModel

    pages = pd.DataFrame(
        [("http://s.example.com/1", "quick brown fox"),
         ("http://s.example.com/2", "rapid brown fox"),
         ("http://s.example.com/3", "brown quick fox quick")],
        columns=["url", "text"])
    base = dict(fields={"body": "text"}, num_buckets=4,
                docid_partitions=2, merge_salts=2, analyzer="simple",
                tokenize_concurrency=2)
    plain_d, syn_d = str(tmp_path / "plain"), str(tmp_path / "syn")
    build_index(rd.from_pandas(pages), plain_d, IndexBuildConfig(**base),
                input_token="p", resume=False)
    build_index(rd.from_pandas(pages), syn_d,
                IndexBuildConfig(**base,
                                 index_synonyms={"quick": ["rapid"]}),
                input_token="s", resume=False)
    plain, syn = IndexReader(plain_d), IndexReader(syn_d)

    # field lengths unchanged (synonyms add tf, not length)
    assert syn.sum_field_lengths("body") == plain.sum_field_lengths("body")
    # 'rapid' postings: docs 1 and 3 join doc 2; tf counts occurrences
    p = syn.postings("rapid", "body")
    exts = syn.external_ids()[p.docids]
    by_ext = dict(zip(exts, p.tfs))
    assert by_ext == {"http://s.example.com/1": 1,
                      "http://s.example.com/2": 1,
                      "http://s.example.com/3": 2}
    assert p.df == 3 and p.ctf == 4
    # positional: 'rapid brown' adjacency holds where 'quick brown' was
    eng = QueryEngine(syn, RankedBooleanModel())
    got = set(eng.search("#near/1(rapid brown)",
                         k=10)["external_id"].to_pylist())
    assert got == {"http://s.example.com/1", "http://s.example.com/2"}
