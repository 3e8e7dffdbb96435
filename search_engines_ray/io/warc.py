"""WARC source plane: the web-crawl interchange format (ISO 28500 —
what Common Crawl ships and every crawler emits), as a Ray Data source
and sink for the page pipeline.

Scope: the *response-record* subset a text pipeline consumes —
``WARC/1.0`` records with ``WARC-Type``/``WARC-Target-URI``/
``Content-Length`` headers, payload = an HTTP response whose body is
the page bytes. Other record types (request, metadata, warcinfo) are
parsed and skipped. Uncompressed ``.warc`` and whole-file-gzip
``.warc.gz`` both read (member-per-record gzip, Common Crawl's actual
framing, reads too — ``gzip`` handles concatenated members).

Scale shape: WARC's unit of parallelism is the FILE (~1 GiB each in
real crawls) — ``read_warc`` maps one parse task per file via
``read_binary_files``, which is exactly how production crawl pipelines
shard; the parser is a single linear pass driven by Content-Length
(no regex over the payload). The writer emits one file per input
block so a re-read parallelizes the same way.

The reference never ingests raw crawl data (its Lucene index is
prebuilt from ClueWeb); this closes the gap between "have a crawl" and
``pages_pipeline``.
"""

from __future__ import annotations

import gzip
import io as _io

import pyarrow as pa

# fixed, deterministic timestamp: WARC-Date is mandatory per spec, but
# a data pipeline's output must be byte-reproducible across runs
_EPOCH = "2000-01-01T00:00:00Z"
_HDR_END = b"\r\n\r\n"


def _record(url: str, body: bytes) -> bytes:
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body)
    hdr = ("WARC/1.0\r\n"
           "WARC-Type: response\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"WARC-Date: {_EPOCH}\r\n"
           f"Content-Length: {len(http)}\r\n"
           "Content-Type: application/http; msgtype=response\r\n"
           "\r\n").encode()
    return hdr + http + b"\r\n\r\n"


def parse_warc_bytes(buf: bytes):
    """Linear single-pass parse → list of (url, body_bytes) from the
    response records. Content-Length drives every seek; malformed
    trailing bytes end the scan rather than raising (crawl files are
    routinely truncated)."""
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    out = []
    pos, n = 0, len(buf)
    while pos < n:
        end = buf.find(_HDR_END, pos)
        if end < 0:
            break
        head = buf[pos:end].decode("latin-1", "replace")
        if not head.startswith("WARC/"):
            break
        fields = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            break
        payload = buf[end + 4:end + 4 + clen]
        pos = end + 4 + clen
        while buf[pos:pos + 2] == b"\r\n":
            pos += 2
        if fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri", "")
        # payload = HTTP response; body follows its header block
        hend = payload.find(_HDR_END)
        body = payload[hend + 4:] if hend >= 0 else payload
        out.append((url, body))
    return out


def write_warc(pages, out_dir: str, compress: bool = False):
    """pages (url, html string|binary columns) → ``out_dir/*.warc[.gz]``,
    one file per input block (the re-read's parallelism grain).
    Deterministic bytes: fixed WARC-Date, records in block order.
    Returns the number of files written."""
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pa.Table, ctx=None) -> pa.Table:
        urls = b["url"].to_pylist()
        htmls = b["html"].to_pylist()
        chunks = [_record(u, h if isinstance(h, bytes) else h.encode())
                  for u, h in zip(urls, htmls)]
        blob = b"".join(chunks)
        if compress:
            gz = _io.BytesIO()
            with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as f:
                f.write(blob)
            blob = gz.getvalue()
        # name by content digest: deterministic AND collision-free
        # across blocks without a global counter
        import hashlib
        tag = hashlib.md5(blob).hexdigest()[:16]
        ext = ".warc.gz" if compress else ".warc"
        path = os.path.join(out_dir, f"part-{tag}{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table({"files": pa.array([1], pa.int64())})

    n = pages.map_batches(write_block, batch_format="pyarrow",
                          batch_size=None).sum("files")
    return int(n or 0)


def read_warc(paths):
    """``ray.data`` Dataset (url string, html string) from WARC
    file(s)/dir — one parse task per file."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def parse(b: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for buf in b["bytes"].to_pylist():
            for u, body in parse_warc_bytes(buf):
                urls.append(u)
                htmls.append(body.decode("utf-8", "replace"))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.string())})

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)
