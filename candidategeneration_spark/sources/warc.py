"""S5 — WARC/HTML ingestion (the reference's ClueWeb source path:
``ReadWarcSample.java:14-39`` → ``WarcRecord.java:139-243`` record framing →
``WarcHTMLResponseRecord`` TREC-ID/URI extraction → ``HtmlpageCleaner``
tag stripping).

Spark shape: ``spark.read.format("binaryFile")`` gives one row per .warc(.gz)
file — ClueWeb ships ~40k files of ~160 MB, a natural task granularity (one
task per file; no splitting needed because gzip members aren't seekable).
Record framing runs in an Arrow-batched ``mapInPandas``; HTML→text stripping
is pure built-in ``regexp_replace`` columns (JVM-side, whole-stage codegen —
no Python in that stage), so only the byte-level framing pays the UDF cost.

No external libraries: WARC is line-framed headers + a Content-Length-counted
body; gzip is stdlib.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

_MARKER = b"WARC/"


def iter_warc_records(data: bytes):
    """Yield (headers: dict[str,str], content: bytes) per WARC record.

    Framing per ``WarcRecord.readNextWarcRecord`` (``WarcRecord.java:
    139-243``): scan to the next ``WARC/x.y`` version line, read header
    lines to the first blank line, then read exactly ``Content-Length``
    bytes of body. Accepts WARC/0.18 (ClueWeb09) and WARC/1.0; tolerates
    \\r\\n or \\n line ends."""
    i, n = 0, len(data)
    while True:
        j = data.find(_MARKER, i)
        if j < 0:
            return
        headers: dict[str, str] = {}
        pos = data.find(b"\n", j)
        if pos < 0:
            return
        pos += 1
        while pos < n:
            eol = data.find(b"\n", pos)
            if eol < 0:
                return
            line = data[pos:eol].strip(b"\r")
            pos = eol + 1
            if not line:
                break
            sep = line.find(b":")
            if sep > 0:
                key = line[:sep].strip().decode("utf-8", "replace")
                headers[key] = line[sep + 1:].strip() \
                    .decode("utf-8", "replace")
        try:
            clen = int(headers.get("Content-Length", "0"))
        except ValueError:
            clen = 0
        content = data[pos:pos + clen]
        yield headers, content
        i = pos + clen


def _strip_http_headers(content: bytes) -> bytes:
    """Response-record bodies start with an HTTP header block; the payload
    follows the first blank line (``WarcHTMLResponseRecord`` semantics)."""
    for sep in (b"\r\n\r\n", b"\n\n"):
        k = content.find(sep)
        if k >= 0:
            return content[k + len(sep):]
    return content


def html_to_text(col):
    """HTML → text as built-in column expressions (the ``HtmlpageCleaner``
    role, JVM-side): drop script/style/comment blocks, drop tags, decode
    the common entities, collapse whitespace."""
    c = F.regexp_replace(col, r"(?is)<script.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", '"'), ("&#39;", "'"), ("&#x27;", "'"),
                     ("&amp;", "&")):
        c = F.regexp_replace(c, ent, rep)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def write_warc_gz(pages, path: str, warc_version: str = "WARC/0.18") -> None:
    """Frame (trec_id, uri, html) pages into one .warc.gz shard.

    The inverse of :func:`iter_warc_records` for fixture/export use: each
    page becomes a ``response`` record (HTTP header block + HTML body,
    ``WarcHTMLResponseRecord`` layout) followed by a ``request`` noise
    record that readers must drop; the shard opens with a ``warcinfo``
    record. Byte format matches what ``ReadWarcSample.java`` consumes."""

    def rec(rtype: str, extra, body: bytes) -> bytes:
        hdr = (f"{warc_version}\r\nWARC-Type: {rtype}\r\n"
               + "".join(f"{k}: {v}\r\n" for k, v in extra)
               + f"Content-Length: {len(body)}\r\n\r\n").encode()
        return hdr + body + b"\r\n\r\n"

    out = rec("warcinfo", [("WARC-Record-ID", "<urn:uuid:warcinfo>")],
              b"format: WARC file")
    for trec_id, uri, html in pages:
        body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + html.encode())
        out += rec("response",
                   [("WARC-TREC-ID", trec_id), ("WARC-Target-URI", uri)],
                   body)
        out += rec("request", [("WARC-Record-ID", f"<urn:uuid:{trec_id}>")],
                   b"GET / HTTP/1.1")
    with gzip.open(path, "wb") as f:
        f.write(out)


def read_warc(spark: SparkSession, path: str,
              record_type: str = "response") -> DataFrame:
    """(doc_id, uri, text): parse .warc / .warc.gz files under ``path``,
    keep ``record_type`` records (the reference keeps "response",
    ``ReadWarcSample.java:27``), doc_id = WARC-TREC-ID (falling back to
    WARC-Record-ID), text = HTML-stripped payload."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, uris, htmls = [], [], []
            for p, blob in zip(pdf["path"], pdf["content"]):
                raw = bytes(blob)
                if p.endswith(".gz"):
                    raw = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
                for headers, content in iter_warc_records(raw):
                    if headers.get("WARC-Type") != record_type:
                        continue
                    ids.append(headers.get("WARC-TREC-ID",
                                           headers.get("WARC-Record-ID", "")))
                    uris.append(headers.get("WARC-Target-URI", ""))
                    htmls.append(_strip_http_headers(content)
                                 .decode("utf-8", "replace"))
            yield pd.DataFrame({"doc_id": ids, "uri": uris, "html": htmls})

    recs = files.mapInPandas(
        parse, schema="doc_id string, uri string, html string")
    return recs.select("doc_id", "uri",
                       html_to_text(F.col("html")).alias("text"))
