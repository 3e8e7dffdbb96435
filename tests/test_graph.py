"""connected_components (large/small-star) vs a local union-find."""

import numpy as np
import pandas as pd
import pytest

import ray


def local_cc(edges):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in sorted(nodes)}


def run_cc(edges, **kw):
    from search_engines_ray.functions.graph import connected_components
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"])).repartition(4)
    out = connected_components(ds, **kw).to_pandas() \
        .sort_values("id", ignore_index=True)
    return dict(zip(out["id"], out["component"]))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 150))
    m = int(rng.integers(1, 300))
    edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
             for _ in range(m)]
    assert run_cc(edges) == local_cc(edges)


def test_chain_needs_multi_hop(ray_session):
    edges = [(i, i + 1) for i in range(80)]
    got = run_cc(edges)
    assert set(got.values()) == {0} and len(got) == 81


def test_string_ids_and_self_loops(ray_session):
    edges = [("a", "b"), ("b", "c"), ("c", "c"), ("z", "z"), ("x", "y")]
    assert run_cc(edges) == {
        "a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


def test_compress_canonical_routes_large_edge_sets(ray_session):
    # force the distributed path with a tiny cap; output must match the
    # driver union-find path exactly
    from search_engines_ray.functions.dedup import _compress_canonical
    edges = [(1, 0), (2, 1), (5, 4), (7, 7), (3, 0)]
    pairs = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["doc_id", "canonical_id"]))
    small = _compress_canonical(pairs, "doc_id").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    big = _compress_canonical(pairs, "doc_id", driver_edge_cap=1) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert small.equals(big)
    assert dict(zip(small["doc_id"], small["canonical_id"])) == {
        0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 7: 7}


# ---------------------------------------------------------------- pagerank

def serial_pagerank(edges, n, iters=3, d=(85, 100), scale=10 ** 12):
    """Reference serial integer PageRank — same fixed-point contract."""
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: scale // n for v in range(n)}
    teleport = ((d[1] - d[0]) * scale // d[1]) // n
    for _ in range(iters):
        D = sum(r for v, r in rank.items() if outdeg.get(v, 0) == 0)
        dangle_t = ((d[0] * D) // d[1]) // n
        s = {v: 0 for v in range(n)}
        for u, v in edges:
            s[v] += rank[u] // outdeg[u]
        rank = {v: teleport + (d[0] * s[v]) // d[1] + dangle_t
                for v in range(n)}
    return rank


def run_pr(edges, n, **kw):
    from search_engines_ray.functions.graph import pagerank
    e = ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}))
    nodes = ray.data.from_pandas(pd.DataFrame({"node": np.arange(n)}))
    out = pagerank(e, nodes, **kw).to_pandas() \
        .sort_values("node", ignore_index=True)
    return dict(zip(out["node"], out["rank_u"]))


def test_pagerank_matches_serial(ray_session):
    edges = [(0, 1), (1, 2), (2, 0), (2, 1), (3, 2), (0, 2)]
    got = run_pr(edges, 4, iters=3, num_parts=3)
    assert got == serial_pagerank(edges, 4, iters=3)


def test_pagerank_dangling_and_sinks(ray_session):
    # node 2 dangles (no out-edges); node 3 has no in-edges
    edges = [(0, 1), (1, 2), (3, 1), (3, 0)]
    got = run_pr(edges, 4, iters=4, num_parts=2)
    want = serial_pagerank(edges, 4, iters=4)
    assert got == want
    assert got[3] > 0  # teleport + dangling share only

    # total mass decays but stays within the documented bound
    scale = 10 ** 12
    assert scale * 0.9 < sum(got.values()) <= scale


def test_pagerank_multigraph_and_random(ray_session):
    rng = np.random.RandomState(7)
    n = 50
    edges = [(int(rng.randint(n)), int(rng.randint(n))) for _ in range(400)]
    edges += edges[:20]  # parallel edges count twice
    got = run_pr(edges, n, iters=3)
    assert got == serial_pagerank(edges, n, iters=3)


# ------------------------------------------------------------- anchor_text

def test_anchor_text_ordered_concat(ray_session):
    from search_engines_ray.functions.graph import anchor_text
    links = pd.DataFrame({
        "src": [3, 1, 2, 1, 5],
        "k":   [1, 2, 1, 1, 1],
        "dst": [9, 9, 9, 7, 7],
        "anchor": ["c c", "b2", "a", "b1", "e"],
    })
    out = anchor_text(ray.data.from_pandas(links), target_col="dst",
                      order_cols=("src", "k"), num_parts=3) \
        .to_pandas().sort_values("dst", ignore_index=True)
    # dst 7: src 1 before 5; dst 9: (1,2) then (2,1) then (3,1)
    assert out.loc[0, "dst"] == 7 and out.loc[0, "inlink"] == "b1 e"
    assert out.loc[1, "dst"] == 9 and out.loc[1, "inlink"] == "b2 a c c"


def serial_ppr(edges, n, seeds, iters=3, d=(85, 100), scale=10 ** 12):
    """Personalized-PageRank serial mirror: teleport/start/dangling
    mass flow to the seed set only."""
    seeds = set(seeds)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: (scale // len(seeds) if v in seeds else 0)
            for v in range(n)}
    teleport = ((d[1] - d[0]) * scale // d[1]) // len(seeds)
    for _ in range(iters):
        D = sum(r for v, r in rank.items() if outdeg.get(v, 0) == 0)
        dangle_t = ((d[0] * D) // d[1]) // len(seeds)
        s = {v: 0 for v in range(n)}
        for u, v in edges:
            s[v] += rank[u] // outdeg[u]
        rank = {v: (teleport + dangle_t if v in seeds else 0)
                + (d[0] * s[v]) // d[1] for v in range(n)}
    return rank


def test_personalized_pagerank(ray_session):
    edges = [(0, 1), (1, 2), (2, 0), (3, 1), (2, 3)]
    got = run_pr(edges, 5, iters=4, num_parts=2, seeds=[0, 3])
    want = serial_ppr(edges, 5, [0, 3], iters=4)
    assert got == want
    # node 4 is isolated and non-seed: zero rank
    assert got[4] == 0
    # seeds hold teleport mass even without in-links into them
    assert got[0] > 0 and got[3] > 0


def test_hits_star_graph(ray_session):
    """Hand-checkable HITS: a star u0 → {1,2,3} makes u0 the max hub
    and the leaves equal max authorities; reverse edges flip the roles;
    determinism across runs."""
    import ray.data as rd
    from search_engines_ray.functions.graph import hits
    nodes = rd.from_items([{"node": i} for i in range(4)])
    star = rd.from_items([{"src": 0, "dst": d} for d in (1, 2, 3)])
    out = hits(star, nodes, iters=2).to_pandas() \
        .sort_values("node", ignore_index=True)
    assert out["hub_u"][0] == out["hub_u"].max() > 0
    assert out["auth_u"][0] == 0
    assert (out["auth_u"][1:] == out["auth_u"].max()).all()
    # reversed: leaves are hubs, the center the only authority
    rev = rd.from_items([{"src": s, "dst": 0} for s in (1, 2, 3)])
    out2 = hits(rev, nodes, iters=2).to_pandas() \
        .sort_values("node", ignore_index=True)
    assert out2["auth_u"][0] == out2["auth_u"].max() > 0
    assert out2["hub_u"][0] == 0
    # deterministic
    out3 = hits(star, nodes, iters=2).to_pandas() \
        .sort_values("node", ignore_index=True)
    assert out3.equals(out)
