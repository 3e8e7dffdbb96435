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


def cmd_verify(reader: IndexReader) -> dict:
    """Index integrity audit — the post-crash/resume sanity an operator
    runs before serving a 100-TB index. Checks the cross-file
    invariants the build guarantees:

    - stats vs docmeta: n_docs == forward row count; per-field sum_len
      / doc_count re-aggregate to stats.json; pid_offsets are monotone
      and end at n_docs.
    - postings self-consistency (distributed map over the postings
      files): per run, df == decoded docid count, ctf == Σtf, docids
      strictly ascending inside [pid-range of the salt], min_docid /
      max_tf metadata match the blobs, bucket == term_bucket(term).
    - cross-plane: per-field Σctf over postings == the forward plane's
      indexed-token count (Σ len(terms_<field>) — NOT sum_len, which is
      stopword-inclusive under the lucene analyzer).

    → dict of check name → {"ok": bool, ...detail}; "ok" overall key.
    Runs as ONE Ray Data pass over the postings parquet (per-batch
    partial violation counts) + the stats pass the reader already has.
    """
    import numpy as np
    import pyarrow as pa
    import ray.data

    from .build import term_bucket
    from .varbyte import decode_postings
    checks: dict = {}
    st = reader.stats
    off = reader.pid_offsets
    checks["pid_offsets"] = {
        "ok": bool((np.diff(off) >= 0).all() and off[0] == 0
                   and off[-1] == st["n_docs"])}
    # forward/docmeta vs stats
    fwd = reader._forward_dataset()
    n_fwd = fwd.count_rows()
    ok_fields = {}
    for f in reader.fields:
        t = fwd.to_table(columns=[f"len_{f}"])
        lens = t[f"len_{f}"].to_numpy()
        ok_fields[f] = (int(lens.sum()) == st["fields"][f]["sum_len"]
                        and int((lens > 0).sum())
                        == st["fields"][f]["doc_count"])
    checks["docmeta"] = {"ok": bool(n_fwd == st["n_docs"]
                                    and all(ok_fields.values())),
                         "n_forward": int(n_fwd), "fields": ok_fields}
    # postings plane: distributed per-batch audit
    import os as _os
    pdir = _os.path.join(reader.index_dir, "postings")
    files = []
    for d in sorted(_os.listdir(pdir)) if _os.path.isdir(pdir) else []:
        full = _os.path.join(pdir, d)
        if d.startswith("bucket=") and _os.path.isdir(full):
            files.extend(_os.path.join(full, x) for x in sorted(_os.listdir(full))
                         if x.endswith(".parquet"))
    num_buckets = int(st["num_buckets"])

    def audit(b: pa.Table) -> pa.Table:
        bad = 0
        ctf_by_field: dict = {}
        for i in range(b.num_rows):
            term = b["term"][i].as_py()
            fld = b["field"][i].as_py()
            d, tf, _p = decode_postings(b["docid_blob"][i].as_py(),
                                        b["tf_blob"][i].as_py(), None)
            row_ok = (
                int(b["df"][i].as_py()) == d.size
                and int(b["ctf"][i].as_py()) == int(tf.sum())
                and (d.size == 0 or (np.diff(d) > 0).all())
                and (d.size == 0
                     or int(b["min_docid"][i].as_py()) == int(d[0]))
                and (tf.size == 0
                     or int(b["max_tf"][i].as_py()) == int(tf.max()))
                and int(b["bucket"][i].as_py())
                == term_bucket(term, num_buckets))
            bad += 0 if row_ok else 1
            ctf_by_field[fld] = ctf_by_field.get(fld, 0) + int(tf.sum())
        # one bad-count row (field "") + one ctf row per field
        flds = sorted(ctf_by_field)
        return pa.table({
            "bad": pa.array([bad] + [0] * len(flds), pa.int64()),
            "field": pa.array([""] + flds, pa.string()),
            "ctf": pa.array([0] + [ctf_by_field[f] for f in flds],
                            pa.int64())})

    if files:
        parts = pa.concat_tables(
            ray.data.read_parquet(files)
            .map_batches(audit, batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow"))
        seen_rows = parts.to_pydict()
        bad_total = int(sum(seen_rows["bad"]))
        ctf_sums: dict = {}
        for f, c in zip(seen_rows["field"], seen_rows["ctf"]):
            if f:
                ctf_sums[f] = ctf_sums.get(f, 0) + int(c)
        fwd_tok: dict = {}
        for f in reader.fields:
            import pyarrow.compute as _pc
            t = fwd.to_table(columns=[f"terms_{f}"])
            fwd_tok[f] = int(_pc.sum(_pc.list_value_length(
                t[f"terms_{f}"])).as_py() or 0)
        cross_ok = all(ctf_sums.get(f, 0) == fwd_tok[f]
                       for f in reader.fields)
        checks["postings"] = {"ok": bad_total == 0,
                              "bad_runs": int(bad_total)}
        checks["cross_plane_ctf"] = {"ok": bool(cross_ok),
                                     "ctf_sums": ctf_sums}
    else:
        checks["postings"] = {"ok": st["n_docs"] == 0}
        checks["cross_plane_ctf"] = {"ok": st["n_docs"] == 0}
    checks["ok"] = all(v["ok"] for k, v in checks.items()
                       if isinstance(v, dict))
    return checks


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 1
    reader = IndexReader(argv[0])
    cmd, args = argv[1], argv[2:]
    fn = {"stats": cmd_stats, "postings": cmd_postings,
          "termvector": cmd_termvector, "doc": cmd_doc, "vocab": cmd_vocab,
          "lineage": cmd_lineage, "verify": cmd_verify}[cmd]
    out = fn(reader, *args)
    print(json.dumps(out, indent=1, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))


def attribute_histogram(index_dir: str, attr: str = "ts",
                        bucket_us: int = 60_000_000):
    """Elasticsearch ``date_histogram`` over the index's doc-values
    plane: fixed-width buckets of a timestamp attribute → doc counts.
    One column-pruned distributed pass over the forward table (ONLY
    ``attr_<name>`` leaves storage), per-batch ``np.unique`` partials,
    then a bucket-keyed groupby of the tiny partial table — the
    pre-aggregate-then-shuffle shape, never rows. → Arrow
    (bucket, n_docs) sorted by bucket; bucket = ts_us // bucket_us."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .build import FORWARD_DIR

    col = f"attr_{attr}"
    ds = rd.read_parquet(os.path.join(index_dir, FORWARD_DIR),
                         columns=[col])

    def partial(b: pa.Table) -> pa.Table:
        us = b[col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        uniq, cnt = np.unique(us // bucket_us, return_counts=True)
        return pa.table({"bucket": pa.array(uniq, pa.int64()),
                         "n_docs": pa.array(cnt.astype(np.int64))})

    t = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").sum("n_docs").to_pandas()
    t = t.sort_values("bucket", ignore_index=True)
    return pa.table({"bucket": pa.array(t["bucket"].to_numpy(), pa.int64()),
                     "n_docs": pa.array(t["sum(n_docs)"].to_numpy()
                                        .astype(np.int64))})


def attribute_value_counts(index_dir: str, attr: str):
    """Elasticsearch ``terms`` aggregation over a doc-values column:
    value → doc count, computed like ``attribute_histogram`` — one
    column-pruned pass over the forward plane, per-batch ``np.unique``
    partials, one groupby of the tiny partial table. → Arrow
    (value, n_docs) sorted by value asc."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .build import FORWARD_DIR

    col = f"attr_{attr}"
    ds = rd.read_parquet(os.path.join(index_dir, FORWARD_DIR),
                         columns=[col])

    def partial(b: pa.Table) -> pa.Table:
        vals = np.asarray(b[col].to_pylist(), dtype=object)
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.table({"value": pa.array(uniq.tolist(), pa.string()),
                         "n_docs": pa.array(cnt.astype(np.int64))})

    t = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("value").sum("n_docs").to_pandas()
    t = t.sort_values("value", ignore_index=True)
    return pa.table({"value": pa.array(t["value"], pa.string()),
                     "n_docs": pa.array(t["sum(n_docs)"].to_numpy()
                                        .astype(np.int64))})
