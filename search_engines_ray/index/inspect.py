"""Index inspection utility — the reference's ``InspectIndex``
(``/root/reference/QryEval/InspectIndex.java:46-441``): stats, posting
lists, term vectors, docid lookups, all as pyarrow scans of the Parquet
index (no Ray session needed).

CLI:  python -m search_engines_ray.index.inspect <index_dir> <cmd> [...]
  stats
  postings <term> [field]
  termvector <external_id> [field]
  doc <external_id>
  vocab [field] [limit]
  lineage
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.dataset as pads

from .build import POSTINGS_DIR
from .reader import IndexReader


def cmd_stats(reader: IndexReader) -> dict:
    return dict(reader.stats)


def cmd_postings(reader: IndexReader, term: str, field: str = "body") -> dict:
    p = reader.postings(term, field)
    if p is None:
        return {"term": term, "field": field, "df": 0, "ctf": 0}
    b = p.pos_bounds()
    sample = [
        {"docid": int(d), "tf": int(t),
         "positions": p.positions[b[i]:b[i + 1]].tolist()
         if p.positions is not None else None}
        for i, (d, t) in enumerate(zip(p.docids[:10], p.tfs[:10]))]
    return {"term": term, "field": field, "df": p.df, "ctf": p.ctf,
            "first_postings": sample}


def cmd_termvector(reader: IndexReader, external_id: str,
                   field: str = "body") -> dict:
    d = reader.internal_docid(external_id)
    if d < 0:
        return {"external_id": external_id, "error": "not found"}
    tv = reader.term_vectors([d], field)
    terms, pos, flen = tv.get(d, ([], [], 0))
    return {"external_id": external_id, "docid": d, "field": field,
            "field_length": flen, "terms": terms, "positions": pos}


def cmd_doc(reader: IndexReader, external_id: str) -> dict:
    d = reader.internal_docid(external_id)
    if d < 0:
        return {"external_id": external_id, "error": "not found"}
    out = {"external_id": external_id, "docid": d}
    import numpy as np
    lens = reader.doclens_for(np.asarray([d], dtype=np.int64), reader.fields)
    for f in reader.fields:
        out[f"len_{f}"] = int(lens[f][0])
    return out


def cmd_vocab(reader: IndexReader, field: str = "body", limit: int = 20) -> dict:
    base = os.path.join(reader.index_dir, POSTINGS_DIR)
    dset = pads.dataset(base, format="parquet", partitioning="hive")
    t = dset.to_table(columns=["term", "field", "df", "ctf"])
    import pandas as pd
    df = t.to_pandas()
    df = df[df["field"] == field].groupby("term", as_index=False).sum(
        numeric_only=True)
    n_terms = int(df["term"].nunique())
    df = df.sort_values(["ctf", "term"], ascending=[False, True]).head(limit)
    return {"field": field, "n_terms": n_terms,
            "top_terms": df.to_dict("records")}


def cmd_lineage(reader: IndexReader) -> dict:
    """Per-partition lineage record of a ``lineage=True`` build: one entry
    per pid with n_docs, per-field token sums, wall_s and fingerprint —
    the checkpoint inventory a resumed 100-TB run skips from."""
    from .build import forward_lineage, postings_lineage
    entries = forward_lineage(reader.index_dir)
    cells = postings_lineage(reader.index_dir)
    return {"n_partitions": len(entries),
            "n_docs": sum(e.get("n_docs", 0) for e in entries.values()),
            "n_postings_cells": len(cells),
            "n_terms": sum(e.get("n_terms", 0) for e in cells.values()),
            "partitions": [entries[p] for p in sorted(entries)],
            "postings_cells": [cells[k] for k in sorted(cells)]}


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 1
    reader = IndexReader(argv[0])
    cmd, args = argv[1], argv[2:]
    fn = {"stats": cmd_stats, "postings": cmd_postings,
          "termvector": cmd_termvector, "doc": cmd_doc, "vocab": cmd_vocab,
          "lineage": cmd_lineage}[cmd]
    out = fn(reader, *args)
    print(json.dumps(out, indent=1, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
