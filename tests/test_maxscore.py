"""MaxScore pruned BM25 (query/maxscore.py) — rank-identical to the
exact engine, and actually skips block-max runs on skewed corpora."""

import numpy as np
import pandas as pd
import pytest

from search_engines_ray.query.eval import QueryEngine
from search_engines_ray.query.maxscore import bm25_maxscore_search
from search_engines_ray.query.models import BM25Model


QUERIES = [
    "dup line",
    "fast sort merge",
    "dup",
    "dup slow big agg",
    "nosuchterm",
    "dup dup line",          # duplicate term: per-occurrence #SUM semantics
    "the of and",            # stopwords only
    "dup merge sort fast key window scan",
]


@pytest.mark.parametrize("q", QUERIES)
def test_maxscore_matches_exact_engine(docs_index, q):
    exact = QueryEngine(docs_index, BM25Model()).search(q, k=20)
    pruned = bm25_maxscore_search(docs_index, q, k=20)
    assert exact.equals(pruned), (exact.to_pydict(), pruned.to_pydict())


@pytest.fixture(scope="module")
def skewed_index(tmp_path_factory):
    """400 docs; 'needle' is rare (5 docs, high idf), 'mid' is in 30%
    (small positive idf), 'filler' everywhere. merge_salts=8 so a term's
    postings split into 8 docid-range runs."""
    import ray.data as rd
    from search_engines_ray.index import (
        IndexBuildConfig, IndexReader, build_index,
    )
    rows = []
    for i in range(400):
        text = "filler words everywhere"
        if i % 80 == 0:
            text += " needle needle needle"
        if i % 3 == 0:
            text += " mid token"
        rows.append((f"http://s.example.com/{i:04d}", text))
    df = pd.DataFrame(rows, columns=["url", "text"])
    idx = str(tmp_path_factory.mktemp("idx") / "skew")
    build_index(rd.from_pandas(df), idx,
                IndexBuildConfig(num_buckets=4, docid_partitions=16,
                                 merge_salts=8),
                input_token="skew", resume=False)
    return IndexReader(idx)


def test_maxscore_skips_runs_on_skew(skewed_index):
    st: dict = {}
    pruned = bm25_maxscore_search(skewed_index, "needle mid filler", k=3,
                                  stats_out=st)
    exact = QueryEngine(skewed_index, BM25Model()).search(
        "needle mid filler", k=3)
    assert exact.equals(pruned)
    # the probe phase must have engaged and skipped whole runs
    assert st["terms_probed"] >= 1
    assert st["runs_decoded"] < st["runs_total"]
    # candidate set collapsed to (roughly) the rare-term docs
    assert st["candidates"] <= 20


def test_maxscore_theta_never_drops_ties(skewed_index):
    """Every doc scores identically on 'filler' — the tie-break
    (external_id asc) must survive pruning exactly."""
    exact = QueryEngine(skewed_index, BM25Model()).search("filler mid", k=10)
    pruned = bm25_maxscore_search(skewed_index, "filler mid", k=10)
    assert exact.equals(pruned)
