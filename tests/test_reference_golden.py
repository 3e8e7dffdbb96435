"""Byte-level conformance against the reference's own golden output.

The reference ships a 5-doc toy Lucene 4.1 index
(``/root/reference/QryEval/index``) and the expected trec_eval output
``/root/reference/QryEval/HW1-queries-UB.teIn`` (14 lines, queries 1-5).
The corpus below was reconstructed EXACTLY from that index by decoding
its term dictionary + postings + positions (Lucene41 block-tree with
all-vInt postings; fields: body=3 freq+pos, url=5, externalId/date
docs-only, title/inlink empty). The toy index was built with
STEMMER=NONE ('fruits', 'keeps' appear unstemmed), i.e. our
``lucene_nostem`` analyzer mode.

The reference does not ship the HW1 query file, so the five queries
used here are chosen to be consistent with the goldens' score patterns
under RankedBoolean (score = tf; min/max for #AND/#OR; positional tf
for #NEAR) — and the test then asserts BYTE-level equality of our
trec output against the golden file, which pins tokenization,
positions, tf accounting, ranking order (score desc, externalId asc)
and the trec formatting in one shot.
"""

import os

import pandas as pd
import pytest

GOLDEN = "/root/reference/QryEval/HW1-queries-UB.teIn"

# gap slots (removed stopwords burn a position) are filled with "the";
# every content token sits at the exact position decoded from the
# reference index's .pos data
TOY_DOCS = [
    ("toyDocs-00001_0",
     "apple pie the very tasty apple computer the very popular "
     "apple the banana the popular fruits pie the always popular"),
    ("toyDocs-00002_0",
     "the apple the day keeps the doctor away do the apple pie the day "
     "have the same health benefit i always feel better after eat "
     "applie pie"),
    ("toyDocs-00003_0", "i love banana"),
    ("toyDocs-00004_0",
     "pie the lunch apple the breakfast the apple the pie the dinner"),
    ("toyDocs-00005_0", "apple apple apple"),
]

# (term, positions) streams decoded from the reference index, per doc
EXPECTED_STREAMS = {
    "toyDocs-00001_0": [("apple", 0), ("pie", 1), ("very", 3), ("tasty", 4),
                        ("apple", 5), ("computer", 6), ("very", 8),
                        ("popular", 9), ("apple", 10), ("banana", 12),
                        ("popular", 14), ("fruits", 15), ("pie", 16),
                        ("always", 18), ("popular", 19)],
    "toyDocs-00002_0": [("apple", 1), ("day", 3), ("keeps", 4),
                        ("doctor", 6), ("away", 7), ("do", 8),
                        ("apple", 10), ("pie", 11), ("day", 13),
                        ("have", 14), ("same", 16), ("health", 17),
                        ("benefit", 18), ("i", 19), ("always", 20),
                        ("feel", 21), ("better", 22), ("after", 23),
                        ("eat", 24), ("applie", 25), ("pie", 26)],
    "toyDocs-00003_0": [("i", 0), ("love", 1), ("banana", 2)],
    "toyDocs-00004_0": [("pie", 0), ("lunch", 2), ("apple", 3),
                        ("breakfast", 5), ("apple", 7), ("pie", 9),
                        ("dinner", 11)],
    "toyDocs-00005_0": [("apple", 0), ("apple", 1), ("apple", 2)],
}
EXPECTED_DOCLEN = {"toyDocs-00001_0": 20, "toyDocs-00002_0": 27,
                   "toyDocs-00003_0": 3, "toyDocs-00004_0": 12,
                   "toyDocs-00005_0": 3}

# queries consistent with the golden score patterns (see module doc)
GOLDEN_QUERIES = [
    ("1", "apple"),
    ("2", "tasty"),
    ("3", "#or(apple banana)"),
    ("4", "#near/2(apple pie)"),
    ("5", "lunch"),
]

needs_reference = pytest.mark.skipif(not os.path.exists(GOLDEN),
                                     reason="reference goldens not present")


def test_nostem_analyzer_reproduces_reference_token_streams():
    """Our lucene_nostem chain over the reconstructed text must emit the
    exact (term, position) stream and stopword-inclusive field length
    stored in the reference's toy index."""
    from search_engines_ray.analysis.tokenizer import analyzer_for_mode
    an = analyzer_for_mode("lucene_nostem")
    for ext_id, text in TOY_DOCS:
        terms, positions, flen = an.analyze(text)
        assert list(zip(terms, positions)) == EXPECTED_STREAMS[ext_id], ext_id
        assert flen == EXPECTED_DOCLEN[ext_id], ext_id


@pytest.fixture(scope="module")
def toy_golden_index(tmp_path_factory, ray_session):
    import ray.data as rd
    from search_engines_ray.index import (
        IndexBuildConfig, IndexReader, build_index,
    )
    pages = pd.DataFrame(TOY_DOCS, columns=["external_id", "text"])
    idx_dir = str(tmp_path_factory.mktemp("idx") / "toy_golden")
    cfg = IndexBuildConfig(fields={"body": "text"},
                           url_column="external_id",
                           analyzer="lucene_nostem",
                           num_buckets=4, docid_partitions=4, merge_salts=2)
    build_index(rd.from_pandas(pages), idx_dir, cfg,
                input_token="toy_golden", resume=False)
    return IndexReader(idx_dir)


@needs_reference
def test_golden_trec_output_byte_identical(toy_golden_index):
    """End-to-end: build the reconstructed corpus with our Ray pipeline,
    run the five queries under RankedBoolean, format as trec — the
    output must equal HW1-queries-UB.teIn byte for byte."""
    import pyarrow as pa
    from search_engines_ray.query.eval import QueryEngine
    from search_engines_ray.query.models import RankedBooleanModel
    from search_engines_ray.query.trec import format_trec

    engine = QueryEngine(toy_golden_index, RankedBooleanModel())
    res = engine.run_queries(GOLDEN_QUERIES, k=100)

    def java_double(s: float) -> str:
        return repr(float(s))          # Double.toString minimal form

    got = format_trec(res, run_id="runID", score_fmt=java_double)
    want = open(GOLDEN).read()
    assert got == want


@needs_reference
def test_golden_df_ctf_match_reference_index(toy_golden_index):
    """Index-level stats parity with the decoded reference postings:
    spot-check df/ctf for head terms and the collection stats."""
    r = toy_golden_index
    expected = {  # term: (df, ctf) decoded from the reference's .tim
        "apple": (4, 10), "pie": (3, 6), "banana": (2, 2),
        "popular": (1, 3), "very": (1, 2), "day": (1, 2), "i": (2, 2),
    }
    for term, (df, ctf) in expected.items():
        p = r.postings(term, "body")
        assert (p.df, p.ctf) == (df, ctf), term
    assert r.n_docs == 5
    assert r.sum_field_lengths("body") == 49 + 16  # 49 terms + 16 stop slots
