"""Sketch/sample operators: partitioning-invariance and accuracy checks
(the driver contract separately hash-checks them against DuckDB)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from search_engines_ray.functions.sample import hash_sample, topk_per_group
from search_engines_ray.functions.sketch import (
    hyperloglog_distinct, value_quantiles,
)


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd
    return rd


def test_hll_accuracy_and_partition_invariance(rd):
    # 6000 distinct values in one group, 300 in the other, with repeats
    rng = np.random.default_rng(3)
    a = rng.integers(0, 6000, 20_000)
    b = rng.integers(0, 300, 5_000)
    t = pa.table({
        "v": pa.array([f"val-{x}" for x in a] + [f"w-{x}" for x in b]),
        "g": pa.array(["a"] * len(a) + ["b"] * len(b)),
    })
    true = {"a": len(set(a.tolist())), "b": len(set(b.tolist()))}
    est1 = hyperloglog_distinct(rd.from_arrow(t), "v", "g").to_pandas()
    est8 = hyperloglog_distinct(rd.from_arrow(t).repartition(8),
                                "v", "g").to_pandas()
    # registers merge with max → the estimate cannot depend on blocking
    pd.testing.assert_frame_equal(
        est1.sort_values("g", ignore_index=True),
        est8.sort_values("g", ignore_index=True))
    for _, row in est1.iterrows():
        assert abs(row.n_distinct_est - true[row.g]) / true[row.g] < 0.05, \
            (row.g, row.n_distinct_est, true[row.g])


def test_hash_sample_deterministic_across_partitioning(rd):
    t = pa.table({"doc_id": pa.array(np.arange(5000), pa.int64())})
    s1 = hash_sample(rd.from_arrow(t), k=50, id_col="doc_id").to_pandas()
    s2 = hash_sample(rd.from_arrow(t).repartition(16), k=50,
                     id_col="doc_id").to_pandas()
    assert len(s1) == 50
    pd.testing.assert_frame_equal(
        s1.sort_values("sample_rank", ignore_index=True),
        s2.sort_values("sample_rank", ignore_index=True))
    # ranks follow the hash order: re-sampling a superset keeps the
    # sample's relative order (prefix property of order-by-hash)
    s_small = hash_sample(rd.from_arrow(t.slice(0, 2500)), k=50,
                          id_col="doc_id").to_pandas()
    common = set(s1.doc_id) & set(s_small.doc_id)
    assert len(common) > 0


def test_hll_rejects_inexact_precision(rd):
    t = pa.table({"g": ["x"], "v": ["a"]})
    with pytest.raises(ValueError, match="frexp"):
        hyperloglog_distinct(rd.from_arrow(t), "v", "g", p=8)


def test_value_quantiles_exact(rd):
    # known histogram: group "x" = 1.00..100.00 once each → p50 = 50.00
    # (ceil(0.5·100) = 50th value), p90 = 90.00, p99 = 99.00
    vals = np.arange(1, 101) / 1.0
    t = pa.table({"g": pa.array(["x"] * 100),
                  "value": pa.array(vals, pa.float64())})
    out = value_quantiles(rd.from_arrow(t), "value", "g") \
        .to_pandas().sort_values("p", ignore_index=True)
    assert out["value"].tolist() == [50.0, 90.0, 99.0]
    # partitioning invariance: histogram partials merge by sum
    out8 = value_quantiles(rd.from_arrow(t).repartition(8), "value", "g") \
        .to_pandas().sort_values("p", ignore_index=True)
    pd.testing.assert_frame_equal(out, out8)


def test_topk_per_group_matches_pandas(rd):
    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 97, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "value": np.round(rng.uniform(0, 100, n), 2),
    })
    out = topk_per_group(rd.from_pandas(df), group_col="user_id",
                         sort_col="value", id_col="event_id", k=3) \
        .to_pandas().sort_values(["user_id", "rank"], ignore_index=True)
    ref = df.sort_values(["user_id", "value", "event_id"],
                         ascending=[True, False, True]) \
        .groupby("user_id").head(3)
    ref["rank"] = ref.groupby("user_id").cumcount() + 1
    ref = ref.sort_values(["user_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(
        out[["user_id", "event_id", "value", "rank"]],
        ref[["user_id", "event_id", "value", "rank"]])


def test_frequent_terms_misra_gries(rd):
    """Exact regime (capacity ≥ block vocab): counts equal true counts
    and count_hi == count_lo. Pruning regime (tiny capacity): the
    Misra-Gries guarantees hold — count_lo ≤ true ≤ count_hi for every
    emitted term, and every term whose true count exceeds the total
    decrement is present."""
    import collections
    from search_engines_ray.functions.sketch import frequent_terms
    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(40)]
    # zipf-ish skew: w000 dominates, long tail
    weights = 1.0 / np.arange(1, len(vocab) + 1) ** 1.3
    weights /= weights.sum()
    docs = [" ".join(rng.choice(vocab, size=30, p=weights))
            for _ in range(200)]
    true = collections.Counter(" ".join(docs).split())
    ds = rd.from_items([{"text": t} for t in docs]).repartition(8)

    exact = frequent_terms(ds, k=10, capacity=4096).to_pandas()
    for _, r in exact.iterrows():
        assert r["count_lo"] == true[r["term"]] == r["count_hi"]
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(exact["term"]) == [t for t, _ in want]

    pruned = frequent_terms(ds, k=40, capacity=5).to_pandas()
    err = int(pruned["count_hi"].iloc[0] - pruned["count_lo"].iloc[0])
    assert err > 0                       # the tiny capacity DID prune
    for _, r in pruned.iterrows():
        assert r["count_lo"] <= true[r["term"]] <= r["count_hi"]
    emitted = set(pruned["term"])
    for t, c in true.items():
        if c > err:
            assert t in emitted, (t, c, err)


def test_shuffle_to_shards_deterministic(rd):
    """Every id lands in exactly one shard with contiguous 0-based
    positions; the assignment is invariant to input partitioning; the
    md5 keying spreads ids across all shards."""
    from search_engines_ray.functions.sample import shuffle_to_shards
    ids = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    a = shuffle_to_shards(rd.from_pandas(ids), num_shards=8) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    b = shuffle_to_shards(rd.from_pandas(ids).repartition(7),
                          num_shards=8) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 1000 and a["doc_id"].is_unique
    assert set(a["shard"]) == set(range(8))
    for s, g in a.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
    # the shuffle is not the identity order
    first = a[a["shard"] == 0].sort_values("pos")["doc_id"].to_numpy()
    assert not np.array_equal(first, np.sort(first))


def test_percentile_ranks_exact(rd):
    """pct(v) == 100·|{x ≤ v}|/n per group (2-dp cents grid), invariant
    to partitioning; 0% below min, 100% at max."""
    from search_engines_ray.functions.sketch import percentile_ranks
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 500),
        "value": np.round(rng.uniform(0, 100, 1000), 2),
    })
    probes = (0.0, 25.0, 50.0, 100.0)
    out = percentile_ranks(rd.from_pandas(df).repartition(6), "value",
                           "g", values=probes) \
        .to_pandas().sort_values(["g", "v"], ignore_index=True)
    for _, r in out.iterrows():
        sub = df[df["g"] == r["g"]]["value"]
        want = 100.0 * (np.rint(sub * 100) <= np.rint(r["v"] * 100)).sum() \
            / len(sub)
        assert r["pct"] == pytest.approx(want, abs=1e-12), (r["g"], r["v"])
    assert (out[out["v"] == 100.0]["pct"] == 100.0).all()
    out1 = percentile_ranks(rd.from_pandas(df), "value", "g",
                            values=probes) \
        .to_pandas().sort_values(["g", "v"], ignore_index=True)
    pd.testing.assert_frame_equal(out, out1)


def test_sampler_fast_vs_auditable_paths(rd):
    """Both hash paths (VERDICT r4 item 7): the auditable path is the
    md5 permutation the SQL oracles mirror; the fast default is
    partition-invariant and disjoint from it (a different but equally
    deterministic permutation)."""
    import hashlib

    from search_engines_ray.functions.sample import _id_hash64

    ids = list(range(1, 400))
    aud = _id_hash64(ids, auditable=True)
    md5 = np.fromiter(
        (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
         for i in ids), dtype=np.uint64, count=len(ids))
    assert np.array_equal(aud, md5)

    t = pa.table({"doc_id": pa.array(np.arange(3000, dtype=np.int64))})
    fast1 = hash_sample(rd.from_arrow(t), k=40).to_pandas() \
        .sort_values("sample_rank", ignore_index=True)
    fast2 = hash_sample(rd.from_arrow(t).repartition(16), k=40) \
        .to_pandas().sort_values("sample_rank", ignore_index=True)
    pd.testing.assert_frame_equal(fast1, fast2)
    audit = hash_sample(rd.from_arrow(t), k=40, auditable=True) \
        .to_pandas().sort_values("sample_rank", ignore_index=True)
    # different keyed permutations select different samples
    assert not fast1["doc_id"].equals(audit["doc_id"])


def test_hll_fast_path_accuracy_and_invariance(rd):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 4000, 15_000)
    t = pa.table({"v": pa.array([f"v-{x}" for x in a]),
                  "g": pa.array(["a"] * len(a))})
    true = len(set(a.tolist()))
    est1 = hyperloglog_distinct(rd.from_arrow(t), "v", "g").to_pandas()
    est8 = hyperloglog_distinct(rd.from_arrow(t).repartition(8),
                                "v", "g").to_pandas()
    pd.testing.assert_frame_equal(
        est1.sort_values("g", ignore_index=True),
        est8.sort_values("g", ignore_index=True))
    assert abs(int(est1["n_distinct_est"][0]) - true) / true < 0.05


def test_resolve_exchange_parts_scales_with_corpus(rd, tmp_path):
    """VERDICT r4 item 2: the exchange knob derives from corpus
    metadata — a big corpus picks more parts than the floor, a
    metadata-less dataset falls back to the operator default, and an
    explicit argument always wins."""
    import pyarrow.parquet as pq

    from search_engines_ray.functions.dedup import _exact_parts
    from search_engines_ray.functions.partitioning import (
        estimate_rows, resolve_exchange_parts,
    )

    assert resolve_exchange_parts(n_rows=100) == 16           # floor
    assert resolve_exchange_parts(n_rows=250_000_000) == 1000  # scales
    assert resolve_exchange_parts(n_rows=10**12) == 4096       # cap
    assert resolve_exchange_parts(None) == 64                  # default

    f = tmp_path / "t.parquet"
    pq.write_table(pa.table({"x": pa.array(np.arange(1000))}), f)
    ds = rd.read_parquet(str(f))
    assert estimate_rows(ds) == 1000
    assert resolve_exchange_parts(ds) == 16
    # metadata-less input → operator default, never an execution
    assert estimate_rows(rd.from_items([{"x": 1}])) is None
    # dedup floor holds at small scale; a web-scale corpus grows it
    assert _exact_parts(ds, None) == 256
    assert _exact_parts(ds, 17) == 17
    from search_engines_ray.functions import partitioning as pt
    assert pt.resolve_exchange_parts(
        n_rows=10**12, rows_per_part=2_000_000, min_parts=256,
        max_parts=16384, default=256) == 16384


def test_dataset_split_deterministic_and_validated(rd):
    from search_engines_ray.functions.sample import dataset_split
    t = pa.table({"doc_id": pa.array(np.arange(5000, dtype=np.int64))})
    one = dataset_split(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    many = dataset_split(rd.from_arrow(t).repartition(16)).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(one, many)
    frac = one["split"].value_counts(normalize=True)
    assert 0.96 < frac.get("train", 0) < 0.995
    assert set(one["split"]) <= {"train", "val", "test"}
    # growth invariance: a doc's split never changes when docs arrive
    half = dataset_split(rd.from_arrow(t.slice(0, 2500))).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        half, one[one["doc_id"] < 2500].reset_index(drop=True))
    with pytest.raises(ValueError):
        dataset_split(rd.from_arrow(t), fractions=(0.9, 0.2))
    with pytest.raises(ValueError):
        dataset_split(rd.from_arrow(t), fractions=(0.5,),
                      names=("a", "b"))


def test_vocab_stats_parts_invariant(rd):
    from search_engines_ray.functions.text import vocab_stats
    texts = ["fast sort merge fast", "merge line", "", "unique hapax"]
    t = pa.table({"text": pa.array(texts)})
    a = vocab_stats(rd.from_arrow(t)).to_pydict()
    b = vocab_stats(rd.from_arrow(t).repartition(4),
                    num_parts=3).to_pydict()
    assert a == b
    assert a["n_tokens"] == [8] and a["n_types"] == [6]
    assert a["n_hapax"] == [4] and a["max_tf"] == [2]


def test_value_histogram_exact(rd):
    from search_engines_ray.functions.sketch import value_histogram
    t = pa.table({
        "g": pa.array(["a"] * 6 + ["b"] * 3),
        "v": pa.array([0.0, 10.0, 24.99, 25.0, 60.0, -1.0,
                       49.99, 50.0, 50.01]),
    })
    out = value_histogram(rd.from_arrow(t), "v", "g", interval=25.0) \
        .to_pandas().sort_values(["g", "bucket"], ignore_index=True)
    got = {(r.g, r.bucket): r.n for r in out.itertuples()}
    # floor semantics: -1.0 -> bucket -25; 24.99 stays in 0; 25.0 opens 25
    assert got == {("a", -25.0): 1, ("a", 0.0): 3, ("a", 25.0): 1,
                   ("a", 50.0): 1, ("b", 25.0): 1, ("b", 50.0): 2}
    many = value_histogram(rd.from_arrow(t).repartition(5), "v", "g",
                           interval=25.0, num_parts=3).to_pandas() \
        .sort_values(["g", "bucket"], ignore_index=True)
    pd.testing.assert_frame_equal(out, many)


def test_value_stats_bit_exact_across_partitioning(rd):
    from search_engines_ray.functions.sketch import value_stats
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 600),
        "value": np.round(rng.uniform(-50, 150, 1200), 2)})
    one = value_stats(rd.from_pandas(df), "value", "g").to_pandas() \
        .sort_values("g", ignore_index=True)
    many = value_stats(rd.from_pandas(df).repartition(9), "value", "g",
                       num_parts=3).to_pandas() \
        .sort_values("g", ignore_index=True)
    pd.testing.assert_frame_equal(one, many)   # BIT-exact, not approx
    for _, r in one.iterrows():
        sub = np.rint(df[df["g"] == r["g"]]["value"].to_numpy() * 100)
        assert r["n"] == len(sub)
        assert r["min_value"] == sub.min() / 100.0
        assert r["max_value"] == sub.max() / 100.0
        assert abs(r["mean"] - sub.mean() / 100.0) < 1e-6
        assert abs(r["variance"] - sub.var() / 10000.0) < 1e-5
