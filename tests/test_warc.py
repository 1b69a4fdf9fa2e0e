"""WARC ingestion: byte round-trip vs the synthetic corpus and the
full WARC → extract → golden-text identity (the input_hint's
"Common-Crawl-style" source format, parsed stdlib-only)."""

import datetime as dt
import os

from jivesearch_spark import corpus, warc


def _pages(n=40, seed=7):
    return [corpus.gen_page(i, seed) for i in range(n)]


def test_warc_roundtrip_bytes():
    rows = _pages()
    for gzipped in (True, False):
        blob = warc.warc_bytes([(u, ts, h) for u, ts, h, _, _ in rows],
                               per_record_gzip=gzipped)
        got = warc.pages_from_warc_bytes(blob)
        assert len(got) == len(rows)
        for (u, ts, h, _, _), (gu, gts, gh, gt, gl) in zip(rows, got):
            assert gu == u
            assert gts == ts.replace(microsecond=0)
            assert gh == h          # html bytes survive exactly
            assert gt is None and gl is None


def test_warc_tolerates_torn_and_filters_non_ok():
    rows = _pages(6)
    triples = [(u, ts, h) for u, ts, h, _, _ in rows]
    blob = warc.warc_bytes(triples, per_record_gzip=False)

    # torn tail: truncating mid-record drops only the torn record
    assert len(warc.pages_from_warc_bytes(blob[:-80])) == len(rows) - 1

    # non-2xx responses are dropped unless keep_non_ok
    r404 = warc._warc_record("http://x.com/a", dt.datetime(2026, 1, 1),
                             b"<html>gone</html>", status=404)
    assert warc.pages_from_warc_bytes(r404) == []
    kept = warc.pages_from_warc_bytes(r404, keep_non_ok=True)
    assert len(kept) == 1 and kept[0][2] == b"<html>gone</html>"

    # warcinfo/request records are skipped entirely
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 4\r\n\r\nabcd\r\n\r\n")
    assert warc.pages_from_warc_bytes(info + r404, keep_non_ok=True)[0][0] \
        == "http://x.com/a"

    # resource records (no HTTP envelope) pass their payload through
    res = (b"WARC/1.0\r\nWARC-Type: resource\r\n"
           b"WARC-Target-URI: http://y.org/r\r\n"
           b"WARC-Date: 2026-02-03T04:05:06Z\r\n"
           b"Content-Length: 9\r\n\r\n<html></h\r\n\r\n")
    (u, ts, h, _, _), = warc.pages_from_warc_bytes(res)
    assert u == "http://y.org/r" and h == b"<html></h"
    assert ts == dt.datetime(2026, 2, 3, 4, 5, 6)


def test_warc_multi_member_gzip_layout():
    """Common Crawl layout: one gzip member per record, concatenated."""
    rows = _pages(5)
    blob = warc.warc_bytes([(u, ts, h) for u, ts, h, _, _ in rows])
    members = list(warc.iter_gzip_members(blob))
    assert len(members) == len(rows)  # one member per record
    # trailing garbage after the last member is ignored, not fatal
    got = warc.pages_from_warc_bytes(blob + b"\x00garbage")
    assert len(got) == len(rows)


def test_read_warc_to_extract_golden(spark, tmp_path):
    """WARC files on disk → read_warc → extract_pages_df: text is
    byte-identical to the corpus' independently computed golden text —
    the same conformance gate the parquet path passes."""
    from jivesearch_spark.extract import extract_pages_df

    rows = _pages(60, seed=11)
    d = tmp_path / "warc_in"
    os.makedirs(d)
    for part, gz in ((rows[:35], True), (rows[35:], False)):
        name = "seg-0.warc.gz" if gz else "seg-1.warc"
        (d / name).write_bytes(
            warc.warc_bytes([(u, ts, h) for u, ts, h, _, _ in part],
                            per_record_gzip=gz))

    pages = warc.read_warc(spark, str(d))
    got = {r["url"]: r for r in pages.collect()}
    assert len(got) == len(rows)
    golden = {u: (ts, h, t) for u, ts, h, t, _ in rows}
    for u, r in got.items():
        ts, h, _ = golden[u]
        assert bytes(r["html"]) == h
        assert r["warc_ts"] == ts.replace(microsecond=0)

    ext = {r["url"]: r["text"]
           for r in extract_pages_df(pages).select("url", "text").collect()}
    from jivesearch_spark import gourl
    mismatches = [u for u, (_, _, t) in golden.items()
                  if ext.get(gourl.validate_url(u).string()) != t]
    assert mismatches == []


def test_stream_warc_micro_batches(spark, tmp_path):
    """stream_warc: the drop-dir streaming shape — all records of the
    arriving segments land exactly once, same schema as the batch
    reader."""
    rows = _pages(30, seed=13)
    d = tmp_path / "drop"
    os.makedirs(d)
    for i in range(3):
        part = rows[i * 10:(i + 1) * 10]
        (d / f"seg-{i}.warc.gz").write_bytes(
            warc.warc_bytes([(u, ts, h) for u, ts, h, _, _ in part]))

    stream = warc.stream_warc(spark, str(d), max_files_per_trigger=2)
    assert stream.isStreaming
    out = (stream.writeStream.format("memory").queryName("warc_sink")
           .option("checkpointLocation", str(tmp_path / "ckpt"))
           .trigger(availableNow=True).start())
    out.awaitTermination(120)
    got = spark.sql("SELECT url, html FROM warc_sink").collect()
    assert len(got) == len(rows)
    golden = {u: h for u, _, h, _, _ in rows}
    assert all(bytes(r["html"]) == golden[r["url"]] for r in got)


def test_warc_negative_content_length_terminates():
    """A corrupt/hostile negative Content-Length must end iteration
    (same torn-tail treatment), never stall the parser: with
    body_start + clen == pos the loop would otherwise re-yield the
    same record forever."""
    rec = (b"WARC/1.0\r\nWARC-Type: resource\r\n"
           b"WARC-Target-URI: http://x\r\nContent-Length: -81\r\n\r\n")
    assert warc.pages_from_warc_bytes(rec) == []
    # a good record BEFORE the corrupt one still parses
    rows = _pages(1)
    blob_plain = warc._warc_record(rows[0][0], rows[0][1], rows[0][2])
    got = warc.pages_from_warc_bytes(blob_plain + rec)
    assert len(got) == 1


def test_warc_pages_iter_is_lazy():
    """iter_pages_from_warc is a true generator: a Spark task slices
    it in bounded batches instead of materializing the decompressed
    segment (the eager list form is the test convenience)."""
    import types

    rows = _pages(4)
    blob = warc.warc_bytes([(u, ts, h) for u, ts, h, _, _ in rows])
    it = warc.iter_pages_from_warc(blob)
    assert isinstance(it, types.GeneratorType)
    first = next(it)
    assert first[0] == rows[0][0]
    assert len(list(it)) == len(rows) - 1
