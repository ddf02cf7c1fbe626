"""WARC (Web ARChive, ISO 28500) ingest — the source format of
web-scale training corpora (Common Crawl ships ~90k WARC files per
crawl).

Scale shape: ``binaryFile`` scan → one ``mapInPandas`` parse pass.
WARC files are NOT arbitrarily splittable (records are length-framed
and usually member-gzipped), so the natural unit of parallelism is the
FILE — exactly how production pipelines (CCNet, C4, RefinedWeb) shard:
one task per archive, ~1 GB each, tens of thousands of files per
crawl saturate any cluster. Payloads stream out as BinaryType rows
bounded per Arrow batch; downstream text extraction
(:func:`html_to_text`) is a zero-shuffle JVM-regex projection, so the
only Python cost is the framing parse itself.

Gzip handling: whole-file gzip and per-record member gzip (the Common
Crawl layout) both decode via stdlib ``zlib`` — multi-member streams
are walked member by member with ``decompressobj`` so a million-record
archive never materializes twice.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "date string, content_type string, n_bytes long, payload binary"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; raw bytes pass
    through untouched.

    A truncated or corrupt member (common in real Common Crawl
    segments) must not fail the whole archive — one bad file would
    otherwise kill the entire mapInPandas task and with it the ingest
    job. On ``zlib.error`` the members decoded so far are returned and
    the rest of the stream is dropped; the record parser then simply
    stops at the truncation point (its resync logic already tolerates
    a ragged tail)."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = bytearray()
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(rest)
            out += d.flush()
        except zlib.error:
            break
        rest = d.unused_data
    return bytes(out)


def parse_warc_records(
    data: bytes,
) -> Iterator[tuple[dict[str, str], bytes]]:
    """Parse one WARC file's bytes into (headers, payload) records.

    Framing per ISO 28500: ``WARC/1.x`` version line, CRLF-separated
    header block, blank line, ``Content-Length`` payload bytes, two
    CRLFs. Tolerates LF-only files and skips malformed trailers by
    resyncing on the next ``WARC/`` magic.
    """
    data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        nxt = data.find(b"WARC/", pos)
        if nxt < 0:
            return
        pos = nxt
        # EARLIEST of the two terminators wins. Preferring \r\n\r\n
        # located anywhere downstream is wrong for LF-only WARC
        # headers over a CRLF HTTP payload: the match would land at
        # the HTTP header/body boundary INSIDE the payload, merging
        # WARC and HTTP headers (HTTP Content-Length overwrites the
        # WARC one; the record's true framing is lost).
        e1 = data.find(b"\r\n\r\n", pos)
        e2 = data.find(b"\n\n", pos)
        if e1 >= 0 and (e2 < 0 or e1 < e2):
            hdr_end, sep = e1, 4
        elif e2 >= 0:
            hdr_end, sep = e2, 2
        else:
            return
        head = data[pos:hdr_end].decode("utf-8", errors="replace")
        lines = head.splitlines()
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + sep
            continue
        body_start = hdr_end + sep
        if length < 0:
            # hostile header: a negative length would move pos
            # BACKWARD onto the same 'WARC/' magic and loop forever —
            # treat as malformed, resync after the header block
            pos = body_start
            continue
        payload = data[body_start : body_start + length]
        yield headers, payload
        # strictly advance even if length is a lie that lands us
        # before the header end (cannot happen with length >= 0, but
        # the invariant is what prevents any future infinite loop)
        pos = max(body_start + length, body_start)


def split_http_response(payload: bytes) -> tuple[dict[str, str], bytes]:
    """Split a WARC ``response`` record's payload into HTTP headers and
    body (response records embed the full HTTP message). Same
    earliest-terminator rule as :func:`parse_warc_records` — an
    LF-only HTTP header block over a body that happens to contain
    ``\\r\\n\\r\\n`` must split at the real (earlier) boundary."""
    e1 = payload.find(b"\r\n\r\n")
    e2 = payload.find(b"\n\n")
    if e1 >= 0 and (e2 < 0 or e1 < e2):
        i, sep_len = e1, 4
    elif e2 >= 0:
        i, sep_len = e2, 2
    else:
        return {}, payload
    head = payload[:i].decode("utf-8", errors="replace")
    headers: dict[str, str] = {}
    for line in head.splitlines()[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers, payload[i + sep_len:]


def read_warc(
    spark: SparkSession,
    path: str,
    warc_types: tuple[str, ...] = ("response",),
    http_body: bool = True,
) -> DataFrame:
    """Read WARC archives into one row per record:
    ``(path, record_id, warc_type, target_uri, date, content_type,
    n_bytes, payload)``.

    ``warc_types`` filters on WARC-Type (``response`` carries the
    crawled pages; ``request``/``metadata``/``warcinfo`` are framing).
    With ``http_body=True`` (default) each response payload is the
    HTTP BODY only (headers stripped, Content-Type lifted from the
    HTTP header when present) — the form every downstream text stage
    wants.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    keep = {t.lower() for t in warc_types}

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                # one unparseable archive must not fail the task (and
                # with it the whole ingest job): salvage whatever
                # records parsed before the fault and move on to the
                # next file. Decompression truncation is already
                # handled inside _gunzip_members; this guard catches
                # anything else a hostile file can throw. Pull the
                # generator record-BY-record so a fault at record
                # 10,001 keeps the 10,000 already parsed (a list()
                # inside the try would discard them all — and double
                # peak memory per archive besides).
                def salvage(blob_bytes):
                    gen = parse_warc_records(blob_bytes)
                    while True:
                        try:
                            yield next(gen)
                        except StopIteration:
                            return
                        except Exception:
                            return  # salvage what we have

                for headers, payload in salvage(bytes(blob)):
                    wtype = headers.get("warc-type", "").lower()
                    if keep and wtype not in keep:
                        continue
                    ctype = headers.get("content-type", "")
                    if http_body and wtype == "response":
                        http_headers, payload = split_http_response(payload)
                        ctype = http_headers.get("content-type", ctype)
                    rows.append(
                        (
                            fpath,
                            headers.get("warc-record-id", ""),
                            wtype,
                            headers.get("warc-target-uri", ""),
                            headers.get("warc-date", ""),
                            ctype,
                            len(payload),
                            payload,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "record_id", "warc_type", "target_uri",
                    "date", "content_type", "n_bytes", "payload",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def html_to_text(df: DataFrame, html_col: str, out: str = "text") -> DataFrame:
    """Boilerplate-light HTML → text extraction as ONE zero-shuffle
    JVM-regex projection (no Python): drop ``<script>``/``<style>``/
    comments, break block-level tags to newlines, strip remaining tags,
    decode the common entities, collapse runs of whitespace. A
    readability-grade extractor (trafilatura &c.) slots into the same
    column contract; this pure-expression form is the one that runs at
    crawl scale for free.
    """
    c = F.col(html_col)
    # (?is): DOTALL + case-insensitive, Java regex (Spark-side only —
    # this is a library projection, not an oracle-mirrored query)
    c = F.regexp_replace(c, r"(?is)<(script|style)\b.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(
        c,
        r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|"
        r"header|footer|blockquote)\b[^>]*>",
        "\n",
    )
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    for ent, rep in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"),
    ):
        c = F.regexp_replace(c, ent, rep)
    c = F.regexp_replace(c, r"[ \t\x0b\f\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    # trim() strips spaces only — newlines need the regex form
    c = F.regexp_replace(c, r"(?s)^\s+|\s+$", "")
    return df.withColumn(out, c)


def warc_to_documents(
    spark: SparkSession, path: str, min_chars: int = 1
) -> DataFrame:
    """End-to-end crawl ingest: WARC responses → HTML text extraction →
    the engine's ``documents``-shaped table ``(doc_id, text, lang,
    source, n_chars)`` ready for every downstream corpus operator
    (dedup, quality, repeated-span, mixture...). ``doc_id`` is the
    xxhash64 of the record id (stable across re-reads); ``lang`` is
    left for ``text.langid_heuristic`` downstream.
    """
    recs = read_warc(spark, path, warc_types=("response",))
    html = recs.filter(
        F.lower(F.coalesce(F.col("content_type"), F.lit(""))).contains(
            "html"
        )
    ).select(
        F.xxhash64("record_id").alias("doc_id"),
        F.col("payload").cast("string").alias("_html"),
        F.col("target_uri").alias("source"),
    )
    out = html_to_text(html, "_html")
    return out.select(
        "doc_id",
        "text",
        F.lit(None).cast("string").alias("lang"),
        "source",
        F.length("text").cast("long").alias("n_chars"),
    ).filter(F.length("text") >= min_chars)


def normalize_url(url):  # Column -> Column
    """Canonical URL for URL-keyed crawl dedup (the FIRST dedup stage
    of C4/CCNet-style pipelines — far cheaper than any content hash):
    lowercase scheme+host, drop the fragment, drop default ports, strip
    a trailing slash from the path, keep the query (it selects
    content). Pure JVM expressions — runs in the scan projection."""
    u = F.regexp_replace(url, r"#.*$", "")
    # lowercase scheme://host only (path/query are case-significant)
    u = F.regexp_replace(
        u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)",
        F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
    )
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443(?=[/?]|$)", "$1")
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80(?=[/?]|$)", "$1")
    u = F.regexp_replace(u, r"(://[^/?#]+[^?#]*?)/(?=\?|$)", "$1")
    return F.regexp_replace(u, r"/$", "")


def dedup_by_url(df: DataFrame, url_col: str, tiebreak: str) -> DataFrame:
    """Exact URL dedup: one row per :func:`normalize_url` key, keeping
    the smallest ``tiebreak`` (a unique id — deterministic on any
    cluster layout). One shuffle keyed by the normalized URL; rows, not
    documents, travel only within each key's group."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(normalize_url(F.col(url_col))).orderBy(
        F.col(tiebreak).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
