import json
import os
import time

import pyarrow.parquet as pq
import pytest


def test_extraction_byte_identical(ray_session):
    """BASELINE.json input_hint invariant: extracted text is
    byte-identical per url to the source text column."""
    from search_engines_ray.pipelines.corpus import (
        extract_text, extract_title, make_html, pages_from_documents,
        pages_pipeline,
    )
    assert extract_text(make_html("T итле", "bödy ✓ text")) == "bödy ✓ text"
    assert extract_title(make_html("a b", "x")) == "a b"

    pages = pages_from_documents("/root/testdata/sf0.001")
    extracted = pages_pipeline(pages)
    src = {}
    for b in pages.iter_batches(batch_size=None, batch_format="pyarrow"):
        for u, t in zip(b["url"].to_pylist(), b["text"].to_pylist()):
            src[u] = t
    n = 0
    for b in extracted.iter_batches(batch_size=None, batch_format="pyarrow"):
        for u, t in zip(b["url"].to_pylist(), b["text"].to_pylist()):
            assert t == src[u], u
            n += 1
    assert n == len(src) == 500


def test_build_from_raw_pages(ray_session, tmp_path):
    """End-to-end: html pages → extraction → index, fields body+title."""
    import ray.data as rd
    from search_engines_ray.index import (
        IndexBuildConfig, IndexReader, build_index,
    )
    from search_engines_ray.pipelines.corpus import (
        pages_from_documents, pages_pipeline,
    )
    pages = pages_pipeline(pages_from_documents("/root/testdata/sf0.001"))
    idx = str(tmp_path / "rawidx")
    cfg = IndexBuildConfig(fields={"body": "text", "title": "title"},
                           num_buckets=4, docid_partitions=4)
    build_index(pages, idx, cfg, input_token="raw", resume=False)
    r = IndexReader(idx)
    assert r.n_docs == 500
    assert r.doc_count("title") > 0
    p = r.postings("fast", "title")     # titles = first 5 tokens
    assert p is not None and p.df > 0


def test_resume_skips_completed_stages(ray_session, tmp_path, toy_pages):
    import ray.data as rd
    from search_engines_ray.index import IndexBuildConfig, build_index
    from search_engines_ray.index.build import FORWARD_DIR, POSTINGS_DIR

    idx = str(tmp_path / "ridx")
    cfg = IndexBuildConfig(num_buckets=4, docid_partitions=4)
    ds = rd.from_pandas(toy_pages)
    build_index(ds, idx, cfg, input_token="r1", resume=False)

    fwd_marker = os.path.join(idx, FORWARD_DIR + "_SUCCESS.json")
    before = os.path.getmtime(fwd_marker)

    # simulate a crash after forward completed but before postings did
    os.remove(os.path.join(idx, POSTINGS_DIR + "_SUCCESS.json"))
    m = build_index(ds, idx, cfg, input_token="r1", resume=True)
    assert os.path.getmtime(fwd_marker) == before     # forward skipped
    assert m["forward_s"] < 0.1
    assert m["postings_s"] > 0                         # postings re-ran
    # and the index still answers
    from search_engines_ray.index import IndexReader
    assert IndexReader(idx).postings("fox", "body").df == 2


def test_resume_invalidates_on_input_change(ray_session, tmp_path, toy_pages):
    import ray.data as rd
    from search_engines_ray.index import IndexBuildConfig, build_index
    idx = str(tmp_path / "ridx2")
    cfg = IndexBuildConfig(num_buckets=4, docid_partitions=4)
    ds = rd.from_pandas(toy_pages)
    import json
    import os
    build_index(ds, idx, cfg, input_token="tok-a", resume=False)
    fp_a = json.load(open(os.path.join(idx, "forward_SUCCESS.json")))
    build_index(ds, idx, cfg, input_token="tok-b", resume=True)
    fp_b = json.load(open(os.path.join(idx, "forward_SUCCESS.json")))
    # different input fingerprint → the stage re-ran and re-stamped its
    # manifest (asserting on wall time was flaky on a warm box: a toy
    # rebuild can finish under any fixed threshold)
    assert fp_b["fingerprint"] != fp_a["fingerprint"]
    assert fp_b["completed_at"] > fp_a["completed_at"]
