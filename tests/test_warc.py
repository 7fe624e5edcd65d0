"""WARC/WET source: round-trip, distributed read, WET text view."""

import os

from mundipy_spark.sources import warc


def _mk_records(k: int, tag: str):
    return [
        {
            "rec_type": "response" if i % 2 == 0 else "conversion",
            "url": f"https://example.org/{tag}/{i}",
            "warc_ts": "2024-01-01T00:00:%02dZ" % (i % 60),
            "content_type": "text/plain",
            "payload": (f"body {tag} {i} " + "x" * (i % 7)).encode(),
        }
        for i in range(k)
    ]


def test_warc_roundtrip_bytes(tmp_path):
    recs = _mk_records(9, "a")
    p = str(tmp_path / "t.warc")
    warc.write_warc(recs, p)
    with open(p, "rb") as f:
        back = warc.parse_warc_bytes(f.read(), p)
    assert len(back) == 9
    for orig, got in zip(recs, back):
        assert got["url"] == orig["url"]
        assert got["rec_type"] == orig["rec_type"]
        assert got["payload"] == orig["payload"]


def test_read_warc_distributed(spark, tmp_path):
    for fi in range(3):
        warc.write_warc(
            _mk_records(6, f"f{fi}"), str(tmp_path / f"{fi}.warc")
        )
    df = warc.read_warc(spark, str(tmp_path / "*.warc"))
    assert df.count() == 18
    resp = warc.read_warc(spark, str(tmp_path / "*.warc"), rec_types=("response",))
    assert resp.count() == 9
    row = resp.filter("url = 'https://example.org/f1/2'").collect()[0]
    assert bytes(row.payload) == b"body f1 2 xx"


def test_read_wet_text(spark, tmp_path):
    warc.write_warc(_mk_records(6, "w"), str(tmp_path / "w.warc"))
    df = warc.read_wet_text(spark, str(tmp_path / "w.warc"))
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {f"https://example.org/w/{i}" for i in (1, 3, 5)}
    assert rows["https://example.org/w/1"].text == "body w 1 x"
    assert rows["https://example.org/w/1"].warc_ts is not None


def test_parse_warc_raises_on_non_warc_bytes():
    """Non-WARC input (e.g. still-gzipped crawl bytes, which contain no
    CRLFCRLF) must raise, not silently parse to zero records."""
    import gzip

    import pytest

    from mundipy_spark.sources import warc

    gz = gzip.compress(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody")
    with pytest.raises(ValueError, match="not a WARC header"):
        warc.parse_warc_bytes(gz, "x.warc.gz")
    with pytest.raises(ValueError, match="not a WARC header"):
        warc.parse_warc_bytes(b"random bytes without terminator", "junk")
    assert warc.parse_warc_bytes(b"", "empty") == []
