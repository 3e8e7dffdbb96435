"""WARC source plane: write → read round-trip, compression, record
skipping, truncation tolerance."""

import gzip

import pyarrow as pa
import pytest

from search_engines_ray.io.warc import (
    _record, parse_warc_bytes, read_warc, write_warc)


def test_parse_roundtrip_single():
    blob = _record("http://a/1", b"<html>hi</html>")
    assert parse_warc_bytes(blob) == [("http://a/1", b"<html>hi</html>")]


def test_parse_skips_non_response_and_truncation():
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: http://a/1\r\nContent-Length: 4\r\n\r\n"
           b"GET \r\n\r\n")
    blob = req + _record("http://a/2", b"body2") + b"WARC/1.0\r\ntrunc"
    assert parse_warc_bytes(blob) == [("http://a/2", b"body2")]


def test_parse_gzip():
    blob = gzip.compress(_record("http://a/3", b"zzz"))
    assert parse_warc_bytes(blob) == [("http://a/3", b"zzz")]


@pytest.mark.parametrize("compress", [False, True])
def test_write_read_roundtrip(ray_session, tmp_path, compress):
    import ray.data as rd
    pages = pa.table({
        "url": [f"http://t/{i}" for i in range(20)],
        "html": [f"<html><body>doc {i} é</body></html>"
                 for i in range(20)],
    })
    out = str(tmp_path / ("wz" if compress else "w"))
    n = write_warc(rd.from_arrow(pages).repartition(4), out,
                   compress=compress)
    assert n == 4
    back = read_warc(out).to_pandas().sort_values("url",
                                                  ignore_index=True)
    want = pages.to_pandas().sort_values("url", ignore_index=True)
    assert list(back["url"]) == list(want["url"])
    assert list(back["html"]) == list(want["html"])


def test_warc_feeds_text_extraction(ray_session, tmp_path):
    """WARC → strip_html (the general-HTML path) → indexable text.
    (``pages_pipeline`` is the byte-exact inverse of the SYNTHETIC
    corpus wrapper; arbitrary crawl HTML goes through ``strip_html``.)"""
    import ray.data as rd
    from search_engines_ray.functions.text import strip_html
    pages = pa.table({
        "url": ["http://t/1"],
        "html": ["<html><title>T one</title>"
                 "<body>quick brown fox</body></html>"],
    })
    out = str(tmp_path / "w2")
    write_warc(rd.from_arrow(pages), out)
    got = strip_html(read_warc(out)).to_pandas()
    assert got.loc[0, "url"] == "http://t/1"
    assert "quick brown fox" in got.loc[0, "clean_text"]
