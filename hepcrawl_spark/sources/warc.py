"""WARC source: Common-Crawl-style archives -> exploded page records.

The engine's input contract is "Iceberg tables of Common-Crawl-style web
pages" (BASELINE.json input_hint); Common Crawl itself ships WARC/1.0
files — per-record gzip members concatenated into one object so readers
can seek to a record without decompressing the file. This module makes
that boundary real, in the archives.py shape (S4-S6): a WARC is an opaque
``binary`` column, records become rows via a narrow mapInPandas decode.

    warcs (key cols..., payload binary)
        --mapInPandas decode-->
    (key cols..., warc_type, url, warc_date, http_status, content_type,
     body binary)

Scale shape: no shuffle in the decode; the record-type filter runs INSIDE
the parser so request/metadata records never enter an Arrow batch; at
100 TB only response bodies leave the scan task. ``pack_warc_by_group``
is the deterministic inverse (fixed dates, sorted records, gzip mtime=0)
so the scan is oracle-checkable end-to-end through real WARC bytes, the
same pack->parquet->decode round trip the S4-S6 archive oracles use.

Format per WARC/1.0 (ISO 28500): a record is a header block (CRLF lines,
``Name: value``) terminated by CRLFCRLF, ``Content-Length`` octets of
block, then CRLFCRLF. ``response`` records wrap an HTTP/1.1 message whose
own header/body split this parser also performs.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_CRLF2 = b"\r\n\r\n"


def _gzip_members(blob: bytes) -> Iterator[bytes]:
    """Yield each gzip member of a multi-member stream (the Common Crawl
    layout); a non-gzip blob yields itself whole."""
    if blob[:2] != b"\x1f\x8b":
        yield blob
        return
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(blob[pos:])
        except zlib.error:
            # truncated/corrupt tail (a cut-short Common Crawl transfer):
            # surface the intact prefix records, drop the broken member
            return
        yield out
        tail = len(d.unused_data)
        consumed = len(blob) - pos - tail
        if consumed <= 0:  # corrupt trailing bytes: stop rather than spin
            return
        pos += consumed


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # line 0 = version/status line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return headers


def _iter_warc_records(blob: bytes):
    """Yield (warc_headers, payload_bytes) per record across all members."""
    for member in _gzip_members(blob):
        pos = 0
        n = len(member)
        while pos < n:
            end = member.find(_CRLF2, pos)
            if end < 0:
                break
            block = member[pos:end]
            if not block.startswith(b"WARC/"):
                break  # not a record boundary: stop this member
            headers = _parse_headers(block)
            try:
                length = int(headers.get("content-length", "0"))
            except ValueError:
                break  # corrupt length: surface the intact prefix, like
                       # the truncated-gzip and bad-status degradations
            payload = member[end + 4 : end + 4 + length]
            yield headers, payload
            pos = end + 4 + length
            while member[pos : pos + 2] == b"\r\n":  # record separator
                pos += 2


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response message -> (status, content_type, body)."""
    end = payload.find(_CRLF2)
    if end < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head = payload[:end]
    status_line = head.split(b"\r\n", 1)[0].split()
    # real Common-Crawl archives contain the occasional corrupt status line
    # (non-numeric token); degrade to status=None like every other partial-
    # record path here instead of ValueError-ing the whole task
    try:
        status = int(status_line[1]) if len(status_line) > 1 else None
    except ValueError:
        status = None
    headers = _parse_headers(head)
    return status, headers.get("content-type"), payload[end + 4 :]


def explode_warc_records(
    warcs: DataFrame,
    payload_col: str = "payload",
    rec_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """One WARC row -> N record rows. Non-payload columns carry through;
    ``rec_types`` filters inside the decoder (warcinfo/request/metadata
    records of a full crawl archive never reach an Arrow batch)."""
    keep = [f for f in warcs.schema.fields if f.name != payload_col]
    keep_names = [f.name for f in keep]
    out_schema = StructType(
        keep
        + [
            StructField("warc_type", StringType()),
            StructField("url", StringType()),
            StructField("warc_date", StringType()),
            StructField("http_status", IntegerType()),
            StructField("content_type", StringType()),
            StructField("body", BinaryType()),
        ]
    )
    want = set(rec_types)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                base = tuple(pdf[c].iloc[i] for c in keep_names)
                blob = bytes(pdf[payload_col].iloc[i])
                for h, payload in _iter_warc_records(blob):
                    rtype = h.get("warc-type", "")
                    if rtype not in want:
                        continue
                    if rtype == "response":
                        status, ctype, body = _split_http(payload)
                    else:
                        status, ctype, body = None, h.get("content-type"), payload
                    rows.append(
                        base
                        + (
                            rtype,
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            status,
                            ctype,
                            body,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=keep_names
                + [
                    "warc_type",
                    "url",
                    "warc_date",
                    "http_status",
                    "content_type",
                    "body",
                ],
            )

    return warcs.mapInPandas(decode, out_schema)


def pack_wet_by_group(
    grouped: DataFrame,
    group_col: str,
    url_col: str,
    text_col: str,
    date_col: str | None = None,
    gzip_members: bool = True,
) -> DataFrame:
    """Deterministic WET synthesis (the Common Crawl extracted-text
    sidecar): one archive per group — a warcinfo record then one
    ``conversion`` record per input row, payload = UTF-8 text,
    ``WARC-Refers-To`` = the md5 record id ``pack_warc_by_group`` stamps
    on the matching response record, so a WET row joins back to its WARC
    capture. Sorted-by-url, fixed dates, gzip member mtime=0 — byte-
    identical across runs, so the decode (``explode_warc_records`` with
    ``rec_types=('conversion',)``) is oracle-checkable end to end.

    Scale shape: identical to ``pack_warc_by_group`` — one shuffle on the
    group key, archives build inside applyInPandas, nothing returns to the
    driver. Writing the (group, payload) frame to parquet/object storage
    IS the WET sink."""
    gtype = grouped.schema[group_col].dataType.simpleString()
    out_schema = f"{group_col} {gtype}, payload binary"

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(url_col)
        members = [
            _record(
                "warcinfo",
                [("WARC-Date", "2024-01-01T00:00:00Z")],
                b"software: hepcrawl_spark\r\nformat: WET\r\n",
            )
        ]
        for _, row in pdf.iterrows():
            text = row[text_col]
            body = (
                text.encode("utf-8") if isinstance(text, str) else bytes(text)
            )
            date = str(row[date_col]) if date_col else "2024-01-01T00:00:00Z"
            rid = hashlib.md5(str(row[url_col]).encode()).hexdigest()
            members.append(
                _record(
                    "conversion",
                    [
                        ("WARC-Record-ID", f"<urn:md5:{rid}:wet>"),
                        ("WARC-Refers-To", f"<urn:md5:{rid}>"),
                        ("WARC-Date", date),
                        ("WARC-Target-URI", str(row[url_col])),
                        ("Content-Type", "text/plain"),
                    ],
                    body,
                )
            )
        if gzip_members:
            buf = io.BytesIO()
            for m in members:
                with gzip.GzipFile(
                    fileobj=buf, mode="wb", compresslevel=6, mtime=0
                ) as gz:
                    gz.write(m)
            payload = buf.getvalue()
        else:
            payload = b"".join(members)
        return pd.DataFrame({group_col: [key[0]], "payload": [payload]})

    return grouped.groupBy(group_col).applyInPandas(build, out_schema)


def _record(rtype: str, warc_headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in warc_headers)
    return (
        f"WARC/1.0\r\nWARC-Type: {rtype}\r\n{head}"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("latin-1") + payload + _CRLF2


def pack_warc_by_group(
    grouped: DataFrame,
    group_col: str,
    url_col: str,
    body_col: str,
    date_col: str | None = None,
    gzip_members: bool = True,
) -> DataFrame:
    """Deterministic WARC synthesis: one archive per group — a warcinfo
    record then one ``response`` record per input row (sorted by url,
    fixed dates, record id = md5(url), gzip member mtime=0). Byte-identical
    across runs, so decode queries are oracle-checkable."""
    gtype = grouped.schema[group_col].dataType.simpleString()
    out_schema = f"{group_col} {gtype}, payload binary"

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(url_col)
        members = []
        info = _record(
            "warcinfo",
            [("WARC-Date", "2024-01-01T00:00:00Z")],
            b"software: hepcrawl_spark\r\n",
        )
        members.append(info)
        for _, row in pdf.iterrows():
            body = row[body_col]
            body = body.encode("utf-8") if isinstance(body, str) else bytes(body)
            date = (
                str(row[date_col]) if date_col else "2024-01-01T00:00:00Z"
            )
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
                + body
            )
            rid = hashlib.md5(str(row[url_col]).encode()).hexdigest()
            members.append(
                _record(
                    "response",
                    [
                        ("WARC-Record-ID", f"<urn:md5:{rid}>"),
                        ("WARC-Date", date),
                        ("WARC-Target-URI", str(row[url_col])),
                        ("Content-Type", "application/http;msgtype=response"),
                    ],
                    http,
                )
            )
        if gzip_members:
            buf = io.BytesIO()
            for m in members:
                with gzip.GzipFile(
                    fileobj=buf, mode="wb", compresslevel=6, mtime=0
                ) as gz:
                    gz.write(m)
            payload = buf.getvalue()
        else:
            payload = b"".join(members)
        return pd.DataFrame({group_col: [key[0]], "payload": [payload]})

    return grouped.groupBy(group_col).applyInPandas(build, out_schema)
