import pandas as pd
import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


def _toy_pages() -> pd.DataFrame:
    """Deterministic toy corpus in the spirit of the reference's 5-doc toy
    index (`/root/reference/QryEval/index/`, golden run
    `HW1-queries-UB.teIn`): small, hand-checkable tf/df/position facts,
    including a duplicate url, an empty doc and a stopword-only doc."""
    rows = [
        ("http://t.example.com/1", "the quick brown fox jumps over the lazy dog",
         "quick fox"),
        ("http://t.example.com/2", "a quick brown cat sat on the mat", "brown cat"),
        ("http://t.example.com/3", "dogs and cats running quickly through fields",
         "running animals"),
        ("http://t.example.com/4", "the lazy dog sleeps near the lazy cat all day",
         "lazy day"),
        ("http://t.example.com/5", "fox fox fox den", "fox den"),
        ("http://t.example.com/6", "", "empty"),
        ("http://t.example.com/7", "the of and to a", "stops only"),
        # duplicate url — dedup keeps exactly one, deterministically
        ("http://t.example.com/2", "a quick brown cat sat on the mat", "brown cat"),
    ]
    return pd.DataFrame(rows, columns=["url", "text", "title"])


@pytest.fixture(scope="session")
def toy_pages() -> pd.DataFrame:
    return _toy_pages()


@pytest.fixture(scope="session")
def toy_index(tmp_path_factory, toy_pages, ray_session):
    """Session-scoped built index over the toy corpus (body+title fields)."""
    import ray.data as rd
    from search_engines_ray.index import IndexBuildConfig, IndexReader, build_index

    idx_dir = str(tmp_path_factory.mktemp("idx") / "toy")
    cfg = IndexBuildConfig(fields={"body": "text", "title": "title"},
                           num_buckets=4, docid_partitions=4, merge_salts=2,
                           tokenize_concurrency=2)
    build_index(rd.from_pandas(toy_pages), idx_dir, cfg,
                input_token="toy", resume=False)
    return IndexReader(idx_dir)


@pytest.fixture(scope="session")
def docs_pages() -> pd.DataFrame:
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    df = t.to_pandas()
    return pd.DataFrame({
        "url": [f"http://docs.example.com/{i:08d}" for i in df["doc_id"]],
        "text": df["text"],
    })


@pytest.fixture(scope="session")
def docs_index(tmp_path_factory, docs_pages, ray_session):
    import ray.data as rd
    from search_engines_ray.index import (
        IndexBuildConfig, IndexReader, build_index,
    )
    idx_dir = str(tmp_path_factory.mktemp("idx") / "docs")
    build_index(rd.from_pandas(docs_pages), idx_dir,
                IndexBuildConfig(num_buckets=8, docid_partitions=8),
                input_token="sf0.001", resume=False)
    return IndexReader(idx_dir)


@pytest.fixture(scope="session")
def docs_oracle(docs_pages):
    from .oracle import OracleIndex
    return OracleIndex(docs_pages)
