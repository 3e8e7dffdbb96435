"""Parameter-file-driven runner — the engine's ``QryEval.main``
(``/root/reference/QryEval/QryEval.java:35-71,649-764``).

Parameter keys follow the reference's files: ``indexPath``,
``queryFilePath``, ``trecEvalOutputPath``, ``retrievalAlgorithm``,
``BM25:k_1|b|k_3``, ``Indri:mu|lambda``, ``fb`` + ``fb*`` (PRF),
``diversity`` + ``diversity:*`` (xQuAD/PM2), ``result_range``.

Extra (index-plane, ours): ``buildIndex=true`` + ``pagesPath`` builds
the index at ``indexPath`` from a pages parquet table first. This module
assumes a Ray session exists when the build path is used (``ray job
submit``-style entry point owns the session; see bench.py/tests).
"""

from __future__ import annotations

import sys

from .index.reader import IndexReader
from .io.readers import read_initial_ranking, read_intents, split_diversity_rankings
from .query.diversity import build_diversity_data, pm2, xquad
from .query.eval import QueryEngine
from .query.models import model_from_params, read_parameter_file, read_query_file
from .query.trec import format_trec


def run(params: dict) -> str:
    """Execute one parameter file; returns the trec output text (also
    written to ``trecEvalOutputPath`` when set)."""
    if params.get("buildIndex", "").lower() == "true":
        import ray.data as rd
        from .index.build import IndexBuildConfig, build_index
        pages = rd.read_parquet(params["pagesPath"])
        # lineage=true → per-partition (pid-grain) forward checkpoints;
        # the setting for a long ``ray job submit`` build that must
        # resume from the last finished partition after a failure
        cfg = IndexBuildConfig(
            lineage=params.get("lineage", "").lower() == "true")
        build_index(pages, params["indexPath"], cfg,
                    input_token=params["pagesPath"])

    reader = IndexReader(params["indexPath"])
    model = model_from_params(params)
    engine = QueryEngine(reader, model)
    queries = read_query_file(params["queryFilePath"])
    k = int(params.get("result_range", 100))
    run_id = params.get("runID", "run-1")

    import pyarrow as pa

    if params.get("diversity", "").lower() == "true":
        out = _run_diversity(params, engine, queries, k)
    elif params.get("fb", "").lower() == "true":
        from .pipelines.prf import prf_search
        tables = []
        expanded_log = []
        for qid, q in queries:
            res, expanded = prf_search(
                engine, q,
                fb_docs=int(params.get("fbDocs", 10)),
                fb_terms=int(params.get("fbTerms", 10)),
                fb_mu=float(params.get("fbMu", 0)),
                fb_orig_weight=float(params.get("fbOrigWeight", 0.5)),
                k=k)
            expanded_log.append(f"{qid}: {expanded}")
            res = res.append_column("qid", pa.array([qid] * res.num_rows,
                                                    pa.string()))
            tables.append(res)
        if params.get("fbExpansionQueryFile"):
            with open(params["fbExpansionQueryFile"], "w") as f:
                f.write("\n".join(expanded_log) + "\n")
        out = pa.concat_tables(tables)
    else:
        out = engine.run_queries(queries, k=k)

    text = format_trec(out, run_id=run_id,
                       all_qids=[qid for qid, _ in queries])
    if params.get("trecEvalOutputPath"):
        with open(params["trecEvalOutputPath"], "w") as f:
            f.write(text)
    return text


def _run_diversity(params: dict, engine: QueryEngine, queries, k: int):
    import pyarrow as pa
    lam = float(params["diversity:lambda"])
    max_in = int(params.get("diversity:maxInputRankingsLength", 100))
    max_out = int(params.get("diversity:maxResultRankingLength", 100))
    algo = params.get("diversity:algorithm", "xquad").lower()
    intents = read_intents(params["diversity:intentsFile"])

    if params.get("diversity:initialRankingFile"):
        initial, intent_rankings = split_diversity_rankings(
            params["diversity:initialRankingFile"], max_in)
    else:
        initial, intent_rankings = {}, {}
        for qid, q in queries:
            t = engine.search(q, k=max_in)
            initial[qid] = list(zip(t["external_id"].to_pylist(),
                                    t["score"].to_pylist()))
            intent_rankings[qid] = {}
            for i, iq in intents.get(qid, []):
                it = engine.search(iq, k=max_in)
                intent_rankings[qid][i] = list(zip(
                    it["external_id"].to_pylist(), it["score"].to_pylist()))

    out_qid, out_eid, out_rank, out_score = [], [], [], []
    for qid, _ in queries:
        ints = [r for _, r in sorted(intent_rankings.get(qid, {}).items())]
        data = build_diversity_data(qid, initial.get(qid, []), ints, max_in)
        ranked = (xquad(data, lam, max_out) if algo == "xquad"
                  else pm2(data, lam, max_out))
        for rank, (eid, score) in enumerate(ranked[:max_out], 1):
            out_qid.append(qid)
            out_eid.append(eid)
            out_rank.append(rank)
            out_score.append(score)
    import numpy as np
    return pa.table({
        "qid": pa.array(out_qid, pa.string()),
        "external_id": pa.array(out_eid, pa.string()),
        "rank": pa.array(np.asarray(out_rank, dtype=np.int32)),
        "score": pa.array(out_score, pa.float64()),
    })


def main(argv: list[str]) -> int:
    if len(argv) != 1:
        print("usage: python -m search_engines_ray <paramFile>")
        return 1
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    try:
        run(read_parameter_file(argv[0]))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
