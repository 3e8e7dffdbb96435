"""Corpus adapters: the driver's ``documents`` table → the pages shape
(BASELINE.json input_hint: url, warc_ts, html, text, lang), plus the
extraction contract.

The per-row invariant is **byte-identical extracted text per url**: the
html wrapper is deterministic and ``extract_text`` inverts it exactly, so
``extract_text(make_html(title, text)) == text`` for every row — the
fixture-generator definition from SURVEY.md §2.1 (index plane).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_HTML_PRE = b"<html><title>"
_HTML_MID = b"</title><body>"
_HTML_POST = b"</body></html>"


def doc_url(doc_id: int) -> str:
    return f"http://docs.example.com/{doc_id:08d}"


def make_html(title: str, text: str) -> bytes:
    return (_HTML_PRE + title.encode() + _HTML_MID + text.encode() + _HTML_POST)


def extract_text(html: bytes) -> str:
    """Deterministic inverse of ``make_html`` — byte-identical text."""
    body_start = html.index(_HTML_MID) + len(_HTML_MID)
    body_end = html.rindex(_HTML_POST)
    return html[body_start:body_end].decode()


def extract_title(html: bytes) -> str:
    t_start = html.index(_HTML_PRE) + len(_HTML_PRE)
    t_end = html.index(_HTML_MID)
    return html[t_start:t_end].decode()


def _doc_title(text: str) -> str:
    return " ".join(text.split()[:5])


def documents_to_pages_batch(batch: pa.Table) -> pa.Table:
    """documents (doc_id, text, lang, …) → pages (url, warc_ts, html,
    text, lang). Deterministic; html is the wrapped text so that
    extraction is exercised end-to-end."""
    import numpy as np
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist() if "lang" in batch.column_names \
        else ["en"] * len(ids)
    urls = [doc_url(i) for i in ids]
    htmls = [make_html(_doc_title(t or ""), t or "") for t in texts]
    ts = pa.array(np.asarray(ids, dtype="int64") * 1_000_000
                  + 1_500_000_000_000_000, type=pa.timestamp("us"))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": ts,
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def pages_from_documents(sf_dir: str, expand: int = 1):
    """Lazy Dataset of pages derived from ``{sf_dir}/documents.parquet``.

    ``expand > 1`` deterministically replicates each document into
    ``expand`` distinct pages (suffixed url, one varied marker token) —
    the benchmark corpus generator: the driver's documents table is tiny
    (≤5k rows) while the north rule targets web scale, so throughput
    benchmarks need a corpus whose size dwarfs fixed pipeline overhead."""
    import ray
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    # the source is one small parquet file = one block; split it so the
    # expansion/html stages parallelize across the cluster instead of
    # running inside a single task
    nblocks = max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))
    ds = ds.repartition(nblocks)
    if expand > 1:
        def replicate(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_pylist()
            texts = b["text"].to_pylist()
            langs = b["lang"].to_pylist()
            out_id, out_tx, out_lg = [], [], []
            for i, t, l in zip(ids, texts, langs):
                for j in range(expand):
                    out_id.append(i * expand + j)
                    out_tx.append(t if j == 0 else f"{t} variant{j}")
                    out_lg.append(l)
            return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                             "text": pa.array(out_tx, pa.string()),
                             "lang": pa.array(out_lg, pa.string())})
        ds = ds.map_batches(replicate, batch_format="pyarrow")
    return ds.map_batches(documents_to_pages_batch, batch_format="pyarrow")


def pages_pipeline(pages):
    """pages → (url, text, title) with text re-extracted from html —
    the real build input. Splitting html extraction from tokenization
    keeps the wide binary column out of every later stage."""
    def extract(b: pa.Table) -> pa.Table:
        htmls = b["html"].to_pylist()
        texts = [extract_text(h) for h in htmls]
        titles = [extract_title(h) for h in htmls]
        return pa.table({
            "url": b["url"],
            "text": pa.array(texts, pa.string()),
            "title": pa.array(titles, pa.string()),
        })
    return pages.map_batches(extract, batch_format="pyarrow")
