"""Side-file readers matching the reference's formats (SURVEY.md §2.1):

- trec ranking files  (``QryEval.java:212-239``, ``Diversity.java:184-265``)
- intents files       (``Diversity.java:90-122``: lines ``qid.i:query``)
- PageRank files      (``FeatureVector.java:53-72``: ``extid \\t score``)
- qrels files         (``FeatureVector.java:81-107``: ``qid 0 extid rel``)

All are small driver-side inputs in the reference and stay that way; the
Ray path for a *large* ranking file is ``ray.data.read_csv`` +
``groupby("qid")``, which ``read_trec_file(..., as_dataset=True)``
provides.
"""

from __future__ import annotations


def read_trec_file(path: str, as_dataset: bool = False):
    """trec format ``qid Q0 extid rank score runid`` (tab or space
    separated) → dict qid → [(external_id, score)] best-first, or a
    ``ray.data.Dataset`` when ``as_dataset``."""
    if as_dataset:
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        ds = rd.read_text(path)

        def parse(b: pa.Table) -> pa.Table:
            # batch line parser (VERDICT r3 item 7: was per-row ds.map)
            qid, eid, rank, score = [], [], [], []
            for line in b["text"].to_pylist():
                parts = line.replace("\t", " ").split()
                if len(parts) < 5:
                    continue
                qid.append(parts[0])
                eid.append(parts[2])
                rank.append(int(parts[3]))
                score.append(float(parts[4]))
            return pa.table({
                "qid": pa.array(qid, pa.string()),
                "external_id": pa.array(eid, pa.string()),
                "rank": pa.array(np.asarray(rank, dtype=np.int64)),
                "score": pa.array(np.asarray(score, dtype=np.float64))})
        return ds.map_batches(parse, batch_format="pyarrow")
    out: dict[str, list[tuple[str, float]]] = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().replace("\t", " ").split()
            if len(parts) < 5:
                continue
            out.setdefault(parts[0], []).append((parts[2], float(parts[4])))
    return out


def read_initial_ranking(path: str, max_len: int | None = None) -> dict:
    """PRF initial-ranking reader (QryEval.java:212-239)."""
    rankings = read_trec_file(path)
    if max_len is not None:
        rankings = {q: r[:max_len] for q, r in rankings.items()}
    return rankings


def split_diversity_rankings(path: str, max_input: int = 100):
    """One trec file holding both ``qid`` and ``qid.intent`` rows →
    (initial: qid → ranking, intents: qid → {intent_no → ranking}),
    each truncated to ``max_input`` (Diversity.java:184-265)."""
    raw = read_trec_file(path)
    initial: dict[str, list] = {}
    intents: dict[str, dict[int, list]] = {}
    for key, ranking in raw.items():
        ranking = ranking[:max_input]
        if "." in key:
            qid, i = key.split(".", 1)
            intents.setdefault(qid, {})[int(i)] = ranking
        else:
            initial[key] = ranking
    return initial, intents


def read_intents(path: str) -> dict[str, list[tuple[int, str]]]:
    """lines ``qid.i:intent query`` → qid → [(i, query)] sorted by i."""
    out: dict[str, list[tuple[int, str]]] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or ":" not in line:
                continue
            key, query = line.split(":", 1)
            qid, i = key.split(".", 1)
            out.setdefault(qid, []).append((int(i), query.strip()))
    return {q: sorted(v) for q, v in out.items()}


def read_pagerank(path: str) -> dict[str, float]:
    out: dict[str, float] = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                out[parts[0]] = float(parts[1])
    return out


def read_qrels(path: str) -> dict[str, dict[str, int]]:
    out: dict[str, dict[str, int]] = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) >= 4:
                out.setdefault(parts[0], {})[parts[2]] = int(parts[3])
    return out
