"""JSONL source/sink: the LLM-data interchange format (one JSON object
per line — what every open corpus distribution and annotation tool
speaks). Ray Data reads line-delimited JSON natively; this facade adds
the three things a 100-TB pipeline needs on top:

- **gzip** round-trip (``.jsonl.gz``), whole-file members, ``mtime=0``
  so identical data produces identical bytes;
- a **byte-reproducible writer** (one file per input block, sorted
  keys, content-digest filenames — the WARC writer's conventions);
- **malformed-line tolerance** on read: a bad line increments a
  counter column instead of killing a 10-hour job (real corpus dumps
  always contain a few).

Parallelism grain = the FILE, like WARC: one parse task per file via
``read_binary_files`` — corpus dumps ship as many ~100 MB–1 GB parts.
"""

from __future__ import annotations

import gzip
import io as _io
import json

import pyarrow as pa


def write_jsonl(ds, out_dir: str, compress: bool = False) -> int:
    """Dataset → ``out_dir/part-<digest>.jsonl[.gz]``, one file per
    block; rows serialize with sorted keys (reproducibility). Returns
    the file count."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pa.Table) -> pa.Table:
        rows = b.to_pylist()
        blob = "".join(json.dumps(r, sort_keys=True, ensure_ascii=False)
                       + "\n" for r in rows).encode()
        if compress:
            gz = _io.BytesIO()
            with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as f:
                f.write(blob)
            blob = gz.getvalue()
        tag = hashlib.md5(blob).hexdigest()[:16]
        ext = ".jsonl.gz" if compress else ".jsonl"
        path = os.path.join(out_dir, f"part-{tag}{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table({"files": pa.array([1], pa.int64())})

    n = ds.map_batches(write_block, batch_format="pyarrow",
                       batch_size=None).sum("files")
    return int(n or 0)


def read_jsonl(paths, columns: list[str] | None = None):
    """``ray.data`` Dataset from JSONL file(s)/dir — one parse task per
    file, gzip auto-detected, malformed lines counted into a
    ``_bad_lines`` column (constant per file) instead of raising.
    ``columns`` prunes each object to the listed keys (missing → null)
    so a 40-field corpus dump costs only the fields asked for."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def parse(b: pa.Table) -> pa.Table:
        rows, bad = [], 0
        for buf in b["bytes"].to_pylist():
            if buf[:2] == b"\x1f\x8b":
                buf = gzip.decompress(buf)
            for line in buf.split(b"\n"):
                line = line.strip()
                if not line:
                    continue
                try:
                    obj = json.loads(line)
                except (ValueError, UnicodeDecodeError):
                    bad += 1
                    continue
                if columns is not None:
                    obj = {c: obj.get(c) for c in columns}
                rows.append(obj)
        if not rows:
            return pa.table({"_bad_lines": pa.array([bad], pa.int64())})
        t = pa.Table.from_pylist(rows)
        return t.append_column(
            "_bad_lines", pa.array([bad] * len(rows), pa.int64()))

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)
