"""Common-Crawl-style WARC ingestion (stdlib-only parser).

The reference fetches live HTML with its own crawler
(/root/reference/search/crawler/crawler.go:243-331) and hands the
bytes to the document extractor. At 100 TB training-data scale the
same pages arrive as Common Crawl WARC segments; ``read_warc`` turns a
directory of ``.warc`` / ``.warc.gz`` files into the
``pages(url, warc_ts, html, text, lang)`` table of BASELINE.json's
``input_hint`` — the identical shape ``corpus.pages_df`` synthesizes —
so the whole extract → index pipeline runs unchanged on real crawl
archives.

Scale shape: Common Crawl WARCs are per-RECORD gzip members
concatenated into ~1 GB files, deliberately not splittable mid-file —
the standard access pattern is one file per task, which is exactly
what ``binaryFile`` gives us. Parsing is a narrow Arrow map (no
shuffle); records stream out in bounded batches. Memory is bounded by
the file size (binaryFile materializes one file per row — at CC's 1 GB
segment size that is the intended task granularity; cap input file
size upstream, not here).

Format notes (public ISO 28500 / WARC 1.0-1.1 spec):
- record = version line ``WARC/1.x``, CRLF header lines, blank line,
  ``Content-Length`` payload bytes, then CRLF CRLF separator;
- ``response`` records wrap a full HTTP response — status line +
  headers + CRLF CRLF + body; the body is the page HTML;
- ``resource`` records carry the payload directly (no HTTP envelope);
- gzipped archives are one gzip MEMBER per record (multi-member
  stream), decodable with a zlib loop over ``unused_data``.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import zlib

from pyspark.sql import DataFrame

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

_KEEP_TYPES = ("response", "resource")


#: feed size for member-wise decompression: bounds the per-member
#: ``unused_data`` copy (the naive ``buf[pos:]`` slice + full-tail
#: unused_data made a 50k-member segment O(n²) — 1,561 pages/s in the
#: round-5 bench rehearsal instead of ~50k/s)
_GZ_CHUNK = 1 << 20


def iter_gzip_members(buf: bytes):
    """Yield the decompressed bytes of each gzip member in a
    multi-member stream (Common Crawl's one-member-per-record layout).
    Stops at the first undecodable trailing garbage rather than
    raising — truncated tail records are skipped, matching the
    crawler's skip-on-error shape (crawler.go:311-322).

    Linear in the stream size: the compressed buffer is fed to each
    member's decompressor in bounded chunks through a memoryview, so
    the per-member overshoot (``unused_data``) copies at most one
    chunk, never the whole remaining tail."""
    mv = memoryview(buf)
    n = len(buf)
    pos = 0
    while pos < n and buf[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=47)  # 32+15: gzip header auto
        out = []
        p = pos
        try:
            while not d.eof and p < n:
                take = mv[p:p + _GZ_CHUNK]
                out.append(d.decompress(take))
                p += len(take)
            out.append(d.flush())
        except zlib.error:
            return
        if not d.eof:
            return                        # truncated final member
        yield b"".join(out)
        pos = p - len(d.unused_data)


def _parse_headers(block: bytes) -> dict[str, str]:
    """WARC/HTTP header block → lowercase-keyed dict (field names are
    case-insensitive per spec; values keep their bytes, latin-1 so the
    mapping never raises on stray high bytes)."""
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1"))
    return headers


def iter_warc_records(raw: bytes):
    """Yield (warc_headers, payload_bytes) per record in a plain
    (non-gzip) WARC buffer. Malformed framing ends iteration instead
    of raising — a torn tail record must not fail the whole segment."""
    pos = 0
    n = len(raw)
    while pos < n:
        # tolerate inter-record CRLF padding
        while pos < n and raw[pos:pos + 2] == b"\r\n":
            pos += 2
        if not raw[pos:pos + 5].startswith(b"WARC/"):
            return
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return
        headers = _parse_headers(raw[pos:hdr_end])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        if clen < 0:
            # a negative length would stall or rewind pos — same
            # malformed-framing treatment as a torn tail
            return
        body_start = hdr_end + 4
        if body_start + clen > n:
            return  # truncated record
        yield headers, raw[body_start:body_start + clen]
        pos = body_start + clen


def split_http_payload(body: bytes) -> tuple[int | None, bytes]:
    """response-record body → (http_status, entity bytes). Bodies that
    are not an HTTP message (resource records, torn envelopes) pass
    through with status None."""
    if not body.startswith(b"HTTP/"):
        return None, body
    sep = body.find(b"\r\n\r\n")
    if sep < 0:
        return None, body
    status_line = body[:body.find(b"\r\n")].split(b" ")
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        status = None
    return status, body[sep + 4:]


def parse_warc_date(s: str) -> dt.datetime | None:
    """WARC-Date is ISO 8601 UTC (``2017-03-22T17:36:44Z``); returns a
    NAIVE UTC datetime to match the synthetic corpus' warc_ts column
    (Spark TimestampType, session-TZ-free comparisons in tests)."""
    try:
        d = dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    return d.astimezone(dt.timezone.utc).replace(tzinfo=None)


def records_from_bytes(content: bytes):
    """All (headers, payload) records of one WARC file, gzip or plain."""
    if content[:2] == b"\x1f\x8b":
        for member in iter_gzip_members(content):
            yield from iter_warc_records(member)
    else:
        yield from iter_warc_records(content)


def iter_pages_from_warc(content: bytes, keep_non_ok: bool = False):
    """Lazily yield page tuples (url, warc_ts, html, None, None) from
    one WARC file's bytes. Only ``response``/``resource`` records with
    a target URI survive; non-2xx responses are dropped unless
    ``keep_non_ok`` (the reference crawler only feeds 2xx bodies to
    the extractor, crawler.go:287-309). A generator so the Spark task
    holds at most one output batch of pages, never a whole
    decompressed segment."""
    for headers, body in records_from_bytes(content):
        if headers.get("warc-type") not in _KEEP_TYPES:
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        status, payload = split_http_payload(body)
        if status is not None and not keep_non_ok and not (
                200 <= status < 300):
            continue
        ts = parse_warc_date(headers.get("warc-date", ""))
        yield (url.strip("<>"), ts, payload, None, None)


def pages_from_warc_bytes(content: bytes, keep_non_ok: bool = False):
    """Eager list form of ``iter_pages_from_warc`` (tests, small files)."""
    return list(iter_pages_from_warc(content, keep_non_ok))


def read_warc(spark, path: str, keep_non_ok: bool = False,
              batch_records: int = 256) -> DataFrame:
    """Directory/glob of ``.warc``/``.warc.gz`` files → pages
    DataFrame in the input_hint shape.

    ``binaryFile`` assigns whole files to tasks (WARC gzip members are
    not block-splittable, and one ~1 GB segment per task is Common
    Crawl's own recommended unit of work); record parsing is a narrow
    ``mapInPandas`` — no shuffle, and downstream extraction runs in
    the same stage. Output batches are capped at ``batch_records``
    rows so the Arrow transfer stays bounded even for segments with
    very large pages.
    """
    from .session import ensure_shipped
    ensure_shipped(spark)

    files = (spark.read.format("binaryFile")
             # same filter as stream_warc: never materialize sidecar
             # files (_SUCCESS, checkpoints, logs) into task memory
             .option("pathGlobFilter", "*.warc*")
             .load(path).select("content"))
    return files.mapInPandas(_parse_files_fn(keep_non_ok, batch_records),
                             schema=PAGES_SCHEMA)


def stream_warc(spark, path: str, keep_non_ok: bool = False,
                batch_records: int = 256,
                max_files_per_trigger: int = 4) -> DataFrame:
    """Streaming twin of ``read_warc``: ``readStream`` over a WARC
    drop-directory, one segment file per arriving crawl archive — the
    continuous-ingest shape (§2.9). Feed the result to
    ``streaming.deduped_pages_stream`` / ``run_incremental_index``
    exactly like a parquet pages stream; each micro-batch is bounded
    by ``maxFilesPerTrigger`` whole segments."""
    from .session import ensure_shipped
    ensure_shipped(spark)

    files = (spark.readStream.format("binaryFile")
             # streaming sources require the schema up front; this is
             # binaryFile's fixed four-column shape
             .schema("path string, modificationTime timestamp, "
                     "length long, content binary")
             .option("maxFilesPerTrigger", max_files_per_trigger)
             .option("pathGlobFilter", "*.warc*")
             .load(path).select("content"))
    return files.mapInPandas(_parse_files_fn(keep_non_ok, batch_records),
                             schema=PAGES_SCHEMA)


def _parse_files_fn(keep_non_ok: bool, batch_records: int):
    import itertools

    import pandas as pd

    def _parse(batches):
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for pdf in batches:
            for content in pdf["content"]:
                # lazy slicing: peak memory per task is one
                # batch_records slice, not the decompressed segment
                pages = iter_pages_from_warc(bytes(content), keep_non_ok)
                while True:
                    chunk = list(itertools.islice(pages, batch_records))
                    if not chunk:
                        break
                    yield pd.DataFrame(chunk, columns=cols)

    return _parse


# ---------------------------------------------------------------------------
# Writer (tests + export): deterministic bytes so round-trip identity
# is assertable; per-record gzip exactly like Common Crawl segments.
# ---------------------------------------------------------------------------

def _warc_record(url: str, ts: dt.datetime, html: bytes,
                 status: int = 200) -> bytes:
    http = (f"HTTP/1.1 {status} OK\r\n"
            "Content-Type: text/html; charset=UTF-8\r\n"
            f"Content-Length: {len(html)}\r\n\r\n").encode("ascii") + html
    ts_s = ts.replace(microsecond=0).isoformat() + "Z"
    hdr = ("WARC/1.0\r\n"
           "WARC-Type: response\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"WARC-Date: {ts_s}\r\n"
           "Content-Type: application/http; msgtype=response\r\n"
           f"Content-Length: {len(http)}\r\n\r\n").encode("ascii")
    return hdr + http + b"\r\n\r\n"


def write_warc_segments(pages: DataFrame, out_dir: str,
                        n_files: int = 16,
                        per_record_gzip: bool = True) -> DataFrame:
    """pages(url, warc_ts, html, …) → ``n_files`` Common-Crawl-layout
    segment files (``part-<i>.warc.gz``, one gzip member per record)
    under ``out_dir``.

    Executor-parallel: one repartition, then each task streams its
    partition through ``warc_bytes`` chunkwise into its own file —
    peak task memory is one Arrow batch, not a segment. Returns the
    (path, n_pages, bytes) summary frame (an action on it performs the
    write). Files land on storage shared by the cluster (local dir on
    local mode; at real scale point this at the shared filesystem)."""
    import os

    from .session import ensure_shipped
    ensure_shipped(pages.sparkSession)
    os.makedirs(out_dir, exist_ok=True)

    def _write(batches):
        import pandas as pd
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc"
                            + (".gz" if per_record_gzip else ""))
        n = b = 0
        with open(path, "wb") as f:
            for pdf in batches:
                buf = warc_bytes(
                    zip(pdf["url"], pdf["warc_ts"], pdf["html"]),
                    per_record_gzip=per_record_gzip)
                f.write(buf)
                n += len(pdf)
                b += len(buf)
        yield pd.DataFrame({"path": [path], "n_pages": [n],
                            "bytes": [b]})

    return (pages.select("url", "warc_ts", "html").repartition(n_files)
            .mapInPandas(_write, schema="path string, n_pages long, "
                                        "bytes long"))


def warc_bytes(rows, per_record_gzip: bool = True) -> bytes:
    """(url, warc_ts, html) tuples → one WARC file's bytes.
    ``per_record_gzip`` emits the Common Crawl layout (one gzip member
    per record); mtime is pinned to 0 so output is byte-deterministic."""
    parts = []
    for url, ts, html in rows:
        rec = _warc_record(url, ts, bytes(html))
        if per_record_gzip:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            rec = buf.getvalue()
        parts.append(rec)
    return b"".join(parts)
