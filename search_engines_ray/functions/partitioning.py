"""Exchange-parallelism sizing shared by the sketch / event / dedup
partial-merge exchanges.

Every partial+merge operator in this package routes its combiner output
through an integer-keyed hash partition (``key % parts``) before a
vectorized ``map_groups`` merge. ``parts`` bounds two things at once:
merge parallelism (too few parts → idle CPUs on a big cluster) and
per-partition memory (too few parts → one task holds too many partial
rows). A fixed ``parts = 64`` is invisible at 32 local CPUs but caps a
fixed-size cluster streaming 100 TB, so — like
``index.build.resolve_salts`` (``index/build.py:718``) — the knob is
derived from the corpus, with the explicit argument always winning.

Sizing is metadata-only: when the input Dataset is a pure file read we
sum Parquet footer row counts (no execution, no scan); otherwise we
fall back to the operator's historical default. Result VALUES are
partition-count-invariant (the merges are associative per exchange
key), so auto-sizing can never change an oracle answer — only how wide
the exchange runs.
"""

from __future__ import annotations


def estimate_rows(ds) -> int | None:
    """Row-count estimate for ``ds`` from Parquet footers of its input
    files — metadata-only, never triggers execution. Returns ``None``
    when the dataset has no file inputs (``from_items`` /
    ``from_pandas`` chains) or any footer is unreadable.

    For transformed datasets this is the PRE-transform row count — an
    upper bound for filters, which is the safe direction for sizing an
    exchange."""
    try:
        files = ds.input_files()
    except Exception:
        return None
    if not files:
        return None
    import pyarrow.parquet as pq

    sample = files[:64]
    n = 0
    for f in sample:
        try:
            n += pq.ParquetFile(f).metadata.num_rows
        except Exception:
            return None
    if len(files) > len(sample):
        # extrapolate from the sampled footers; files in one write are
        # near-uniform so the estimate is within a few percent
        n = int(n * (len(files) / len(sample)))
    return n


def resolve_exchange_parts(ds=None, *, n_rows: int | None = None,
                           rows_per_part: int = 250_000,
                           min_parts: int = 16, max_parts: int = 4096,
                           default: int = 64) -> int:
    """Exchange partition count for a partial-merge shuffle: one part
    per ``rows_per_part`` INPUT rows, clamped to
    [``min_parts``, ``max_parts``]; ``default`` when no metadata row
    count is available (``n_rows`` explicit, else Parquet footers via
    :func:`estimate_rows`)."""
    if n_rows is None and ds is not None:
        n_rows = estimate_rows(ds)
    if n_rows is None:
        return int(default)
    return int(min(max_parts, max(min_parts,
                                  -(-int(n_rows) // int(rows_per_part)))))
