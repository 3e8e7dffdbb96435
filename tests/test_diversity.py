"""xQuAD / PM2 against the reference's own embedded example
(Diversity.test(), Diversity.java:369-413: 5 docs, 2 intents,
lambda=0.4)."""

from search_engines_ray.query.diversity import (
    DiversityData, build_diversity_data, pm2, xquad,
)

# doc -> [s0, s1, s2] exactly as in Diversity.test()
TEST_VECTORS = {
    "d1": [0.7, 0.7, 0.2],
    "d2": [0.69, 0.8, 0.1],
    "d3": [0.68, 0.6, 0.3],
    "d4": [0.67, 0.2, 0.7],
    "d5": [0.66, 0.3, 0.8],
}


def _data():
    d = DiversityData(qid="0", n_intents=2)
    for doc, v in TEST_VECTORS.items():
        d.docs.append(doc)
        d.vectors.append(list(v))
    return d


def test_xquad_reference_example():
    out = xquad(_data(), lam=0.4)
    assert len(out) == 5
    # first pick maximizes (1-λ)s0 + λ·0.5·(s1+s2) with full coverage
    first_scores = {doc: 0.6 * v[0] + 0.4 * 0.5 * (v[1] + v[2])
                    for doc, v in TEST_VECTORS.items()}
    expected_first = max(first_scores, key=lambda d: first_scores[d])
    assert out[0][0] == expected_first
    assert abs(out[0][1] - first_scores[expected_first]) < 1e-12
    # diversification: after picking a d covering intent 1, an
    # intent-2-heavy doc must outrank the similar runner-up
    docs_in_order = [d for d, _ in out]
    assert docs_in_order.index("d4") < docs_in_order.index("d3") or \
        docs_in_order.index("d5") < docs_in_order.index("d3")


def test_xquad_scores_nonincreasing_selection():
    out = xquad(_data(), lam=0.4)
    assert all(isinstance(s, float) for _, s in out)


def test_pm2_alternates_intents():
    out = pm2(_data(), lam=0.4, max_result=5)
    assert len(out) == 5
    docs = [d for d, _ in out]
    # PM2 balances slots: after an intent-1 doc, an intent-2 doc follows
    first_two = set(docs[:2])
    assert first_two & {"d1", "d2", "d3"}      # intent-1 heavy
    assert first_two & {"d4", "d5"}            # intent-2 heavy


def test_normalization_trigger():
    initial = [("a", 5.0), ("b", 3.0)]
    intents = [[("a", 4.0)], [("b", 2.0)]]
    d = build_diversity_data("q", initial, intents)
    # norm factor = max column sum = max(8, 4, 2) = 8
    assert abs(d.vectors[0][0] - 5 / 8) < 1e-12
    assert abs(d.vectors[0][1] - 4 / 8) < 1e-12
    # scores <= 1 untouched
    d2 = build_diversity_data("q", [("a", 0.9)], [[("a", 0.5)]])
    assert d2.vectors[0][0] == 0.9


def test_truncation():
    initial = [(f"d{i}", 1.0 / (i + 1)) for i in range(10)]
    d = build_diversity_data("q", initial, [initial], max_input=3)
    assert len(d.docs) == 3


def test_pm2_zero_break():
    d = DiversityData(qid="0", n_intents=1)
    d.docs = ["a", "b"]
    d.vectors = [[0.5, 0.4], [0.1, 0.0]]
    out = pm2(d, lam=0.5, max_result=2)
    # second doc scores 0 -> included then loop breaks
    assert out[-1][1] == 0.0 or len(out) == 2


def test_collapse_ranking_hand_math():
    """At most d per group in rank order; unmapped docs share the null
    group; truncation at k."""
    from search_engines_ray.query.diversity import collapse_ranking
    ranked = [("a1", 9.0), ("a2", 8.0), ("b1", 7.0), ("a3", 6.0),
              ("b2", 5.0), ("c1", 4.0), ("u1", 3.0), ("u2", 2.0),
              ("u3", 1.0)]
    groups = {"a1": "A", "a2": "A", "a3": "A",
              "b1": "B", "b2": "B", "c1": "C"}
    got = collapse_ranking(ranked, groups, max_per_group=2)
    assert [d for d, _ in got] == ["a1", "a2", "b1", "b2", "c1",
                                   "u1", "u2"]          # a3/u3 crowded out
    got_k = collapse_ranking(ranked, groups, max_per_group=2, k=3)
    assert [d for d, _ in got_k] == ["a1", "a2", "b1"]
