"""Randomized engine-vs-oracle parity: seeded random corpora (Zipfian
vocab with stopwords, empty docs, hyphenated tokens) × generated
structured queries, across all four retrieval models. Catches edge
interactions the hand-picked queries miss (repeated terms under #NEAR,
weighted ops over stopword args, single-term windows, field mixing)."""

import random

import pandas as pd
import pytest

from search_engines_ray.query import QueryEngine
from search_engines_ray.query.parser import QueryParseError, QueryParser
from .oracle import OracleIndex, oracle_search
from .test_query_engine import MODELS, _compare

VOCAB = ["apple", "banana", "cherry", "dog", "cat", "fox", "run", "jump",
         "the", "of", "quick-step", "lazy", "tree", "house", "22",
         "doctor's", "zoo"]


def _random_corpus(seed: int, n_docs: int = 40) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n = rng.randint(0, 30)
        text = " ".join(rng.choices(VOCAB, weights=range(len(VOCAB), 0, -1),
                                    k=n))
        rows.append({"url": f"http://r{seed}.example.com/{i:04d}",
                     "text": text})
    rows.append({"url": f"http://r{seed}.example.com/empty", "text": ""})
    return pd.DataFrame(rows)


def _random_queries(seed: int, n: int = 12) -> list[str]:
    rng = random.Random(seed + 1000)
    terms = ["apple", "banana", "dog", "cat", "fox", "run", "lazy", "tree",
             "the", "quick-step", "zoo"]
    out = []
    for _ in range(n):
        kind = rng.choice(["bow", "near", "window", "syn", "and", "or",
                           "wand", "wsum", "nested"])
        pick = lambda k: " ".join(rng.sample(terms, k))
        if kind == "bow":
            out.append(pick(rng.randint(1, 3)))
        elif kind == "near":
            out.append(f"#near/{rng.randint(1, 4)}({pick(2)})")
        elif kind == "window":
            out.append(f"#window/{rng.randint(2, 8)}({pick(2)})")
        elif kind == "syn":
            out.append(f"#syn({pick(2)})")
        elif kind in ("and", "or"):
            out.append(f"#{kind}({pick(2)})")
        elif kind in ("wand", "wsum"):
            w1, w2 = round(rng.uniform(0.1, 0.9), 2), round(rng.uniform(0.1, 0.9), 2)
            out.append(f"#{kind}( {w1} {pick(1)} {w2} {pick(1)} )")
        else:
            out.append(f"#and(#near/2({pick(2)}) {pick(1)})")
    return out


LEGAL = {
    "unranked": lambda q: not any(op in q for op in ("#wand", "#wsum", "#sum")),
    "ranked": lambda q: not any(op in q for op in ("#wand", "#wsum", "#sum")),
    "bm25": lambda q: not any(op in q for op in ("#wand", "#wsum", "#and", "#or")),
    "indri": lambda q: "#or" not in q and "#sum" not in q,
}


@pytest.mark.parametrize("seed", [7, 23])
def test_random_parity(seed, tmp_path_factory, ray_session):
    import ray.data as rd
    from search_engines_ray.index import (
        IndexBuildConfig, IndexReader, build_index,
    )
    pages = _random_corpus(seed)
    idx_dir = str(tmp_path_factory.mktemp("ridx") / f"s{seed}")
    build_index(rd.from_pandas(pages), idx_dir,
                IndexBuildConfig(num_buckets=4, docid_partitions=4,
                                 merge_salts=2),
                input_token=f"s{seed}", resume=False)
    reader = IndexReader(idx_dir)
    oracle = OracleIndex(pages)
    parser = QueryParser()
    queries = _random_queries(seed)
    n_checked = 0
    for model_name, model in MODELS.items():
        engine = QueryEngine(reader, model)
        for q in queries:
            if not LEGAL[model_name](q):
                continue
            try:
                plan = parser.parse(q, model.default_op)
            except QueryParseError:
                continue
            res = engine.search(q, k=50)
            exp = oracle_search(oracle, plan, model, k=50)
            _compare(res, exp)
            n_checked += 1
    assert n_checked > 20
