"""JSONL source plane: round-trip, gzip, column pruning, bad-line
tolerance."""

import gzip
import json

import pyarrow as pa
import pytest

from search_engines_ray.io.jsonl import read_jsonl, write_jsonl


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(ray_session, tmp_path, compress):
    import ray.data as rd
    t = pa.table({
        "doc_id": list(range(12)),
        "text": [f"doc {i} é" for i in range(12)],
        "lang": ["en", "fr"] * 6,
    })
    out = str(tmp_path / ("jz" if compress else "j"))
    n = write_jsonl(rd.from_arrow(t).repartition(3), out,
                    compress=compress)
    assert n == 3
    back = read_jsonl(out).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert list(back["doc_id"]) == list(range(12))
    assert back.loc[3, "text"] == "doc 3 é"
    assert (back["_bad_lines"] == 0).all()


def test_column_pruning_and_bad_lines(ray_session, tmp_path):
    p = tmp_path / "x.jsonl"
    rows = [json.dumps({"a": i, "b": "x" * i, "c": None}) for i in range(3)]
    p.write_text("\n".join(rows + ["{not json", ""]) + "\n")
    got = read_jsonl(str(p), columns=["a", "missing"]).to_pandas() \
        .sort_values("a", ignore_index=True)
    assert list(got.columns) == ["a", "missing", "_bad_lines"]
    assert list(got["a"]) == [0, 1, 2]
    assert got["missing"].isna().all()
    assert (got["_bad_lines"] == 1).all()


def test_gzip_reproducible_bytes(ray_session, tmp_path):
    import ray.data as rd
    t = pa.table({"a": [1, 2]})
    d1, d2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    write_jsonl(rd.from_arrow(t), d1, compress=True)
    write_jsonl(rd.from_arrow(t), d2, compress=True)
    import os
    f1 = sorted(os.listdir(d1))[0]
    f2 = sorted(os.listdir(d2))[0]
    assert f1 == f2  # content-digest names → identical bytes
    assert (tmp_path / "g1" / f1).read_bytes() == \
        (tmp_path / "g2" / f2).read_bytes()
