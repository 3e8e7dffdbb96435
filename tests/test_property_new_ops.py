"""Seeded-random property checks for the closing-session operators:
Misra-Gries guarantees under random skew/capacity, bloom semijoin vs
isin under random key universes and false-positive-heavy configs,
CombSUM/MNZ vs a brute-force reference, and MMR vs an independent
greedy reimplementation."""

import random

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd
    return rd


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_mg_guarantees_random(rd, seed):
    import collections
    from search_engines_ray.functions.sketch import frequent_terms
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(rng.randint(10, 60))]
    docs = [" ".join(rng.choices(vocab, weights=[1 / (i + 1) ** 1.1
                                                 for i in range(len(vocab))],
                                 k=rng.randint(5, 40)))
            for _ in range(150)]
    true = collections.Counter(" ".join(docs).split())
    ds = rd.from_items([{"text": t} for t in docs]) \
        .repartition(rng.randint(2, 9))
    cap = rng.choice([3, 7, 5000])
    out = frequent_terms(ds, k=len(vocab), capacity=cap).to_pandas()
    err = (int(out["count_hi"].iloc[0] - out["count_lo"].iloc[0])
           if len(out) else 0)
    for _, r in out.iterrows():
        assert r["count_lo"] <= true[r["term"]] <= r["count_hi"]
    emitted = set(out["term"])
    for t, c in true.items():
        if c > err:
            assert t in emitted
    if cap == 5000:                     # exact regime
        assert err == 0
        for _, r in out.iterrows():
            assert r["count_lo"] == true[r["term"]]


@pytest.mark.parametrize("seed", [5, 6])
def test_bloom_semijoin_random(rd, seed):
    from search_engines_ray.functions.join import bloom_semijoin
    rng = np.random.default_rng(seed)
    fact = pd.DataFrame({
        "k": rng.integers(0, 500, 3000).astype(np.int64),
        "v": np.arange(3000, dtype=np.int64)})
    keys = pd.DataFrame({"k": rng.choice(500, rng.integers(1, 80),
                                         replace=False).astype(np.int64)})
    want = set(map(tuple,
                   fact[fact["k"].isin(keys["k"])].to_numpy()))
    for bpk, verify in ((1, "shuffle"), (2, "broadcast"), (10, "shuffle")):
        out = bloom_semijoin(rd.from_pandas(fact).repartition(5),
                             rd.from_pandas(keys), "k",
                             bits_per_key=bpk, verify=verify).to_pandas()
        assert set(map(tuple, out[["k", "v"]].to_numpy())) == want, \
            (bpk, verify)


def test_combsum_vs_bruteforce():
    from search_engines_ray.query.fusion import combsum_fuse
    rng = np.random.default_rng(17)
    for _ in range(50):
        n_sys = rng.integers(1, 4)
        systems = []
        for _ in range(n_sys):
            n = int(rng.integers(1, 12))
            ids = rng.choice(30, n, replace=False).astype(np.int64)
            scores = np.round(rng.uniform(-5, 5, n), 3)
            systems.append((ids, scores))
        for mnz in (False, True):
            got = combsum_fuse(systems, k=100, mnz=mnz)
            ref: dict[int, float] = {}
            hits: dict[int, int] = {}
            for ids, sc in systems:
                lo, hi = sc.min(), sc.max()
                for i, s in zip(ids.tolist(), sc.tolist()):
                    nv = 1.0 if hi == lo else (s - lo) / (hi - lo)
                    ref[i] = ref.get(i, 0.0) + nv
                    hits[i] = hits.get(i, 0) + 1
            if mnz:
                ref = {i: v * hits[i] for i, v in ref.items()}
            want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
            assert got["doc_id"].to_pylist() == [i for i, _ in want]
            np.testing.assert_allclose(got["score"].to_numpy(),
                                       [v for _, v in want], rtol=1e-12)


@pytest.mark.parametrize("seed", [3, 9])
def test_mmr_vs_reference_greedy(rd, seed):
    from search_engines_ray.functions.similarity import mmr_rerank
    from search_engines_ray.functions.text import round6
    rng = np.random.default_rng(seed)
    n, d = 25, 6
    V = rng.normal(size=(n, d))
    q = rng.normal(size=d)
    ds = rd.from_items([{"vec_id": i, "embedding": V[i].tolist()}
                        for i in range(n)])
    lam, k, ck = 0.6, 6, 12
    out = mmr_rerank(ds, q, k=k, lambda_=lam, cand_k=ck).to_pandas()

    # independent greedy reference
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    rel_all = round6(Vn @ qn)
    cand = sorted(range(n), key=lambda i: (-rel_all[i], i))[:ck]
    sims = round6((Vn @ Vn.T).ravel()).reshape(n, n)
    sel, rem = [], list(cand)
    while rem and len(sel) < k:
        best, bsc = None, None
        for i in rem:
            sc = lam * rel_all[i] - (1.0 - lam) * (
                max(sims[i, j] for j in sel) if sel else 0.0) \
                if sel else lam * rel_all[i]
            if best is None or sc > bsc or (sc == bsc and i < best):
                best, bsc = i, sc
        sel.append(best)
        rem.remove(best)
    assert list(out["vec_id"]) == sel
