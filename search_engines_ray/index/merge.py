"""Incremental index merge: segment-style concatenation of two built
indexes into a third, without retokenizing a single document.

The index layout was designed for this (build.py's docstring contract):
a term's postings are stored as SALTED RUNS over disjoint docid ranges,
merged at read time by ``min_docid`` concatenation (``reader.py
postings_many``), and the docid blob's first varbyte value is ABSOLUTE
(``varbyte.delta_encode``). So merging index B after index A is pure
metadata surgery, streamed row-by-row with no blob re-encode beyond the
first varint of each docid blob:

- forward rows of B shift their ``pid`` by A's partition count; the
  global docid (= ``pid_offsets[pid] + docid_local``) then lands in
  ``[n_docs_A, n_docs_A + n_docs_B)`` via the merged ``pid_offsets``.
- postings rows of B renumber ``salt += merge_salts_A`` (keeping
  (term, salt) unique and the per-salt distributed query tasks
  1/S-of-the-corpus sized) and rebase ``min_docid``/the blob's leading
  absolute docid by ``n_docs_A``. df/ctf columns are per-run and query
  paths already sum them across runs, so they need no touch.
- ``stats.json`` adds: n_docs, per-field doc_count/sum_len,
  pid_offsets concatenation, merge_salts/docid_partitions sums.

Because every ranking statistic (n_docs, sum_len, per-run df/ctf) is
recomputed-by-addition, a merged index returns BYTE-IDENTICAL search
results to an index built over the union corpus in one pass (docids may
permute, but scores and the score-desc/external-id-asc output order
don't depend on internal docids) — the equivalence the tests assert.

This is the Lucene-style segment-merge capability the reference gets
for free from its Lucene backend (its Idx facade opens one pre-merged
index, ``Idx.java:44-58``); here it makes the build plane incremental:
index the day's crawl alone, then fold it into the main index at
metadata cost, instead of re-running tokenization over 100 TB.

Both inputs stream through Ray Data (two read→map→write jobs per
plane); nothing is gathered to the driver but the two stats dicts.

Caveat (same as a Lucene segment merge): build-plane url dedup is per
build — a document present in BOTH inputs stays present twice after the
merge. Dedup across segments upstream (``functions.dedup.exact_dedup``
on the incoming crawl against the main index's url set, or a
``broadcast_semijoin`` anti-filter) before indexing the new segment.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .build import FORWARD_DIR, POSTINGS_DIR, STATS_FILE
from .varbyte import vb_encode


def _rebase_blob(blob: bytes, offset: int) -> bytes:
    """Shift the leading ABSOLUTE varbyte value of a delta-coded docid
    blob by ``offset``; the remaining bytes are gaps and stay verbatim."""
    i = 0
    while blob[i] & 0x80:
        i += 1
    first = 0
    for k in range(i + 1):
        first |= (blob[k] & 0x7F) << (7 * k)
    return (vb_encode(np.array([first + offset], np.uint64)) + blob[i + 1:])


def merge_indexes(index_a: str, index_b: str, out_dir: str) -> dict:
    """Merge built index ``index_b`` into ``index_a``'s docid space,
    writing a complete new index at ``out_dir``. Returns the merged
    stats dict. Requires both inputs to share ``num_buckets`` (bucket
    partition pruning hashes terms identically on both sides),
    ``analyzer`` and field set."""
    with open(os.path.join(index_a, STATS_FILE)) as f:
        sa = json.load(f)
    with open(os.path.join(index_b, STATS_FILE)) as f:
        sb = json.load(f)
    for key in ("num_buckets", "analyzer"):
        if sa.get(key) != sb.get(key):
            raise ValueError(
                f"cannot merge: {key} differs ({sa.get(key)!r} vs "
                f"{sb.get(key)!r}) — rebuild one side to match")
    if sorted(sa["fields"]) != sorted(sb["fields"]):
        raise ValueError(
            f"cannot merge: field sets differ ({sorted(sa['fields'])} vs "
            f"{sorted(sb['fields'])})")

    import ray.data as rd

    n_a = int(sa["n_docs"])
    pids_a = len(sa["pid_offsets"]) - 1
    salts_a = int(sa.get("merge_salts", 4))
    os.makedirs(out_dir, exist_ok=True)

    # ---- forward plane: A verbatim, B with pid shifted
    fwd_out = os.path.join(out_dir, FORWARD_DIR)
    rd.read_parquet(os.path.join(index_a, FORWARD_DIR)) \
        .write_parquet(fwd_out)

    def shift_pid(b: pa.Table) -> pa.Table:
        pid = b["pid"].to_numpy(zero_copy_only=False) + np.int32(pids_a)
        return b.set_column(b.schema.get_field_index("pid"), "pid",
                            pa.array(pid.astype(np.int32)))

    rd.read_parquet(os.path.join(index_b, FORWARD_DIR)) \
        .map_batches(shift_pid, batch_format="pyarrow") \
        .write_parquet(fwd_out)

    # ---- postings plane: A verbatim, B salted + docid-rebased. The
    # hive `bucket=` partition column is re-derived from the directory
    # scheme by the read and re-emitted by the partitioned write, so
    # bucket pruning keeps working on the merged index.
    post_out = os.path.join(out_dir, POSTINGS_DIR)

    def with_int_bucket(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("bucket")
        return b.set_column(i, "bucket", b["bucket"].cast(pa.int32()))

    rd.read_parquet(os.path.join(index_a, POSTINGS_DIR)) \
        .map_batches(with_int_bucket, batch_format="pyarrow") \
        .write_parquet(post_out, partition_cols=["bucket"])

    def rebase(b: pa.Table) -> pa.Table:
        salt = b["salt"].to_numpy(zero_copy_only=False) + np.int32(salts_a)
        mind = b["min_docid"].to_numpy(zero_copy_only=False) + np.int64(n_a)
        blobs = [_rebase_blob(x, n_a) for x in b["docid_blob"].to_pylist()]
        b = b.set_column(b.schema.get_field_index("salt"), "salt",
                         pa.array(salt.astype(np.int32)))
        b = b.set_column(b.schema.get_field_index("min_docid"), "min_docid",
                         pa.array(mind))
        b = b.set_column(b.schema.get_field_index("docid_blob"), "docid_blob",
                         pa.array(blobs, pa.binary()))
        return with_int_bucket(b)

    rd.read_parquet(os.path.join(index_b, POSTINGS_DIR)) \
        .map_batches(rebase, batch_format="pyarrow") \
        .write_parquet(post_out, partition_cols=["bucket"])

    # ---- stats: recompute-by-addition
    fields = {
        f: {"doc_count": sa["fields"][f]["doc_count"]
            + sb["fields"][f]["doc_count"],
            "sum_len": sa["fields"][f]["sum_len"]
            + sb["fields"][f]["sum_len"]}
        for f in sa["fields"]}
    stats = {
        "version": sa.get("version", 1),
        "n_docs": n_a + int(sb["n_docs"]),
        "fields": fields,
        "num_buckets": sa["num_buckets"],
        "merge_salts": salts_a + int(sb.get("merge_salts", 4)),
        "docid_partitions": pids_a + (len(sb["pid_offsets"]) - 1),
        "analyzer": sa.get("analyzer"),
        "pid_offsets": list(sa["pid_offsets"])
        + [int(o) + n_a for o in sb["pid_offsets"][1:]],
        "merged_from": [os.path.abspath(index_a), os.path.abspath(index_b)],
    }
    with open(os.path.join(out_dir, STATS_FILE), "w") as f:
        json.dump(stats, f)
    return stats
