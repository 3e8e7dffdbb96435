"""Broadcast joins — the no-shuffle join family for 100-TB pipelines.

At Common-Crawl scale a fact table must never enter an all-to-all
exchange to join a dimension/key table that fits in one worker's heap.
These operators gather the SMALL side once (guarded by a byte bound,
same convention as ``dedup.embedding_dedup``), ``ray.put`` it once, and
stream the big side through ``map_batches`` — the only data movement is
the one-time per-node object-store fetch of the small table:

- ``broadcast_semijoin``: keep (or, ``anti=True``, drop) fact rows whose
  key appears in the small key set — a filter, not a widening join, so
  it composes with downstream pre-aggregation without re-shuffling.
- ``broadcast_hash_join``: widen fact batches with small-side columns
  via a per-batch ``pyarrow`` hash join (Acero) against the broadcast
  table.

The reference's analogues are driver-side hash maps keyed by
externalDocid/qid (``FeatureVector.java:65,99-100,243-248`` — pagerank
and qrels lookups); here the lookup side is an Arrow table in the
object store, shared zero-copy by every task on a node.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray


def _gather_small(small, columns=None, max_broadcast_bytes=256 << 20,
                  what="broadcast side") -> pa.Table:
    """Materialize the SMALL side to one combined Arrow table. The byte
    bound is enforced WHILE streaming the gather (running total per
    batch), so an over-size side fails at the bound — the driver never
    holds more than ``max_broadcast_bytes`` of it (same never-gather-
    then-check rule as ``dedup.embedding_dedup``'s broadcast guard)."""

    def over(nbytes: int):
        return ValueError(
            f"{what} exceeds max_broadcast_bytes="
            f"{max_broadcast_bytes / 2**20:.0f} MiB (≥{nbytes / 2**20:.1f} "
            f"MiB gathered) — this join family requires the small side to "
            f"fit per-worker; shuffle-join the inputs instead or raise the "
            f"bound")

    if isinstance(small, pa.Table):
        t = small.select(list(columns)) if columns else small
        if t.nbytes > max_broadcast_bytes:
            raise over(t.nbytes)
    else:
        proj = small.select_columns(list(columns)) if columns else small
        parts, nbytes = [], 0
        for b in proj.iter_batches(batch_size=None, batch_format="pyarrow"):
            nbytes += b.nbytes
            if nbytes > max_broadcast_bytes:
                raise over(nbytes)
            parts.append(b)
        t = pa.concat_tables(parts)
    return t.combine_chunks()


def broadcast_semijoin(ds, keys, key_col: str, keys_col: str | None = None,
                       anti: bool = False,
                       max_broadcast_bytes: int = 256 << 20):
    """Filter ``ds`` to rows whose ``key_col`` is (semi) / is not (anti)
    in the small side's ``keys_col`` set. → Dataset with ``ds``'s schema.

    The key set is deduplicated before broadcast, so the object-store
    payload is bounded by the DISTINCT key count; each fact batch is
    filtered with one vectorized ``pc.is_in`` — the fact table itself
    never shuffles. ``ray.get`` on the broadcast ref inside the batch
    function is a zero-copy shared-memory lookup after the first
    per-node fetch."""
    keys_col = keys_col or key_col
    kt = _gather_small(keys, [keys_col], max_broadcast_bytes,
                       what="semijoin key set")
    key_ref = ray.put(pc.unique(kt[keys_col]))

    def filt(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[key_col], value_set=ray.get(key_ref))
        if anti:
            mask = pc.invert(mask)
        return b.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


def broadcast_hash_join(ds, small, left_on: str, right_on: str | None = None,
                        columns=None, join_type: str = "inner",
                        max_broadcast_bytes: int = 256 << 20):
    """Join each fact batch against the broadcast small table (Acero
    hash join per batch). → Dataset with ``ds``'s columns plus the small
    side's non-key ``columns``. ``join_type``: ``inner`` or
    ``left outer`` (each fact row keeps at most its matches; small-side
    rows never fan IN, so output size is bounded by fact rows × max key
    multiplicity on the small side)."""
    right_on = right_on or left_on
    if join_type not in ("inner", "left outer"):
        raise ValueError(f"join_type={join_type!r}: only 'inner' and "
                         f"'left outer' keep the fact-side streaming shape")
    cols = list(columns) if columns else None
    if cols and right_on not in cols:
        cols = [right_on] + cols
    st = _gather_small(small, cols, max_broadcast_bytes,
                       what="hash-join small side")

    small_ref = ray.put(st)

    def join_batch(b: pa.Table) -> pa.Table:
        return b.join(ray.get(small_ref), keys=left_on, right_keys=right_on,
                      join_type=join_type)

    return ds.map_batches(join_batch, batch_format="pyarrow")
