"""URL-plane curation operators: canonicalization and domain rollups.

Web-crawl dedup and politeness both key on the CANONICAL url, not the
crawled byte string — tracking params, fragments, default ports, case
in scheme/host and `www.` prefixes all alias the same resource. The
reference's corpus arrives pre-canonicalized (ClueWeb's TREC ids); a
from-scratch pipeline needs the normalizer itself. Rules are kept
small, ordered and regex-expressible so a SQL oracle can mirror them
byte for byte:

1. drop the fragment (`#...`),
2. lowercase the `scheme://host[:port]` prefix (path/query untouched),
3. strip a `:80` port and a leading `www.`,
4. drop `utm_*` / `fbclid` query params (and the `?` if none remain),
5. strip one trailing `/` when the path is longer than `/`.

Everything is a per-batch compiled-regex kernel — no exchange; the
domain rollup is a pre-aggregated groupby on the canonical host.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_FRAG_RE = re.compile(r"#.*$")
_HEAD_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)")
_PORT80_RE = re.compile(r":80$")
_WWW_RE = re.compile(r"^(?P<scheme>[a-z][a-z0-9+.-]*://)www\.")
_TRACK_RE = re.compile(r"^(utm_[^=]*|fbclid)=")
_HOST_RE = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?:]*)")


def canonical_url(url: str) -> str:
    """The canonicalization kernel (rules in the module docstring)."""
    u = _FRAG_RE.sub("", url or "")
    m = _HEAD_RE.match(u)
    if m:
        head = m.group(1).lower()
        head = _PORT80_RE.sub("", head)
        u = head + u[m.end():]
        u = _WWW_RE.sub(lambda g: g.group("scheme"), u)
    if "?" in u:
        base, q = u.split("?", 1)
        kept = [p for p in q.split("&") if p and not _TRACK_RE.match(p)]
        q = "?" + "&".join(kept) if kept else ""
    else:
        base, q = u, ""
    # trailing slash of the PATH: strip one, unless the path is just "/"
    m = _HEAD_RE.match(base)
    path = base[m.end():] if m else base
    if base.endswith("/") and len(path) > 1:
        base = base[:-1]
    return base + q


def host_of(url: str) -> str:
    m = _HOST_RE.match(url or "")
    return m.group(1) if m else ""


def url_canonicalize(ds, url_col: str = "url"):
    """→ input columns + ``canonical_url`` + ``host`` (host of the
    canonical form). Pure per-batch kernel, no exchange."""
    def fn(b: pa.Table) -> pa.Table:
        canon = [canonical_url(u) for u in b[url_col].to_pylist()]
        hosts = [host_of(c) for c in canon]
        out = pa.table({c: b[c] for c in b.column_names})
        out = out.append_column("canonical_url", pa.array(canon, pa.string()))
        return out.append_column("host", pa.array(hosts, pa.string()))
    return ds.map_batches(fn, batch_format="pyarrow")


def domain_stats(ds, url_col: str = "url", size_col: str | None = None):
    """→ Dataset (host, n_docs, n_distinct_canonical[, sum_size]): the
    per-domain crawl rollup (coverage + alias collapse rate per host).
    Pre-aggregated: each batch reduces to per-host partials (distinct
    canonical urls carried as a 64-bit hash set per batch — bounded by
    batch size), then one tiny groupby folds partials; the full url
    strings never cross the exchange."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        canon = np.asarray([canonical_url(u)
                            for u in b[url_col].to_pylist()], dtype=object)
        hosts = np.asarray([host_of(c) for c in canon], dtype=object)
        h64 = pd.util.hash_array(canon, categorize=False)
        sizes = (b[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
                 if size_col else np.zeros(len(canon), np.int64))
        order = np.argsort(hosts, kind="stable")
        hs, cs, zs = hosts[order], h64[order], sizes[order]
        bound = np.concatenate(([True], hs[1:] != hs[:-1]))
        starts = np.flatnonzero(bound)
        ends = np.append(starts[1:], len(hs))
        rows = {"host": hs[starts].tolist(),
                "n_docs": (ends - starts).astype(np.int64),
                "hashes": [cs[a:z].tobytes() for a, z in zip(starts, ends)],
                "sum_size": np.add.reduceat(zs, starts)
                if len(starts) else np.empty(0, np.int64)}
        return pa.table({"host": pa.array(rows["host"], pa.string()),
                         "n_docs": pa.array(rows["n_docs"]),
                         "hashes": pa.array(rows["hashes"], pa.binary()),
                         "sum_size": pa.array(rows["sum_size"])})

    def fold(g: pa.Table) -> pa.Table:
        import pandas as pd
        df = g.to_pandas()
        out = {"host": [], "n_docs": [], "n_distinct_canonical": [],
               "sum_size": []}
        for host, rows in df.groupby("host", sort=True):
            hs = np.unique(np.frombuffer(
                b"".join(rows["hashes"]), dtype=np.uint64))
            out["host"].append(host)
            out["n_docs"].append(int(rows["n_docs"].sum()))
            out["n_distinct_canonical"].append(int(hs.size))
            out["sum_size"].append(int(rows["sum_size"].sum()))
        cols = {"host": pa.array(out["host"], pa.string()),
                "n_docs": pa.array(np.asarray(out["n_docs"], np.int64)),
                "n_distinct_canonical": pa.array(
                    np.asarray(out["n_distinct_canonical"], np.int64))}
        if size_col:
            cols["sum_size"] = pa.array(
                np.asarray(out["sum_size"], np.int64))
        return pa.table(cols)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("host").map_groups(fold, batch_format="pyarrow")
