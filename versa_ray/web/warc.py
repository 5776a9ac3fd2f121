"""WARC (Web ARChive, ISO 28500) source for Common-Crawl-style
corpora: parse `response` records into the engine's canonical pages
schema ``(url, warc_ts, html, text, lang)``.

Stdlib-only (no warcio in this environment): WARC is a plain framed
format — ``WARC/1.0`` + CRLF headers + blank line + Content-Length
payload + CRLF CRLF. For response records the payload is an HTTP
message; the body after its header block is the archived HTML.

Scale shape: the FILE is the shard unit. Common Crawl ships ~1 GB
WARCs (gzipped per record; whole-file gzip and plain files are what
we read here), and record boundaries are not seekable without an
index, so ``read_warc_ds`` maps one parse task per file via
``read_binary_files`` — a listing of N files becomes N parallel
tasks, which is exactly how CC jobs shard in practice. Each task is
pure streaming over its bytes; nothing corpus-sized aggregates
anywhere.
"""

from __future__ import annotations

import gzip
import io

_CRLF = b"\r\n"


def _parse_headers(block: bytes) -> dict:
    out = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace"))
    return out


def parse_warc_bytes(data: bytes):
    """Yield dicts for each response record:
    {url, warc_ts, html (bytes), status}. Tolerates trailing junk and
    non-response records (skipped)."""
    if data[:2] == b"\x1f\x8b":  # whole-file gzip (also works for
        # concatenated per-record members — gzip reads them all)
        data = gzip.decompress(data)
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = hdr_end + 4
        body = data[body_start:body_start + length]
        pos = body_start + length
        if headers.get("warc-type", "").lower() != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = headers.get("warc-date", "")
        # payload is an HTTP message: split its header block off
        http_end = body.find(_CRLF + _CRLF)
        status = ""
        if http_end >= 0 and body[:5] in (b"HTTP/",):
            first = body.split(_CRLF, 1)[0].decode("ascii", "replace")
            parts = first.split(" ", 2)
            status = parts[1] if len(parts) > 1 else ""
            html = body[http_end + 4:]
        else:
            html = body  # bare payload (no HTTP envelope)
        yield {"url": url, "warc_ts": ts, "html": html, "status": status}


def read_warc_ds(paths, include_status=False):
    """Dataset of pages from WARC file(s): one parse task per file
    (see module docstring for why the file is the shard unit).
    Output schema matches the engine's pages contract:
    ``url (string), warc_ts (timestamp), html (binary), text (string,
    empty — extraction is the pipeline's job), lang (string, empty)``
    plus ``status`` when requested."""
    import pandas as pd
    import ray.data as rd

    raw = rd.read_binary_files(paths)

    def _parse(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"url": [], "warc_ts": [], "html": [], "status": []}
        for data in df["bytes"]:
            for rec in parse_warc_bytes(bytes(data)):
                rows["url"].append(rec["url"])
                rows["warc_ts"].append(rec["warc_ts"])
                rows["html"].append(rec["html"])
                rows["status"].append(rec["status"])
        out = pd.DataFrame(rows)
        out["warc_ts"] = pd.to_datetime(
            out["warc_ts"], errors="coerce", utc=True
        ).dt.tz_localize(None)
        out["text"] = ""
        out["lang"] = ""
        cols = ["url", "warc_ts", "html", "text", "lang"]
        if include_status:
            cols.append("status")
        return out[cols]

    return raw.map_batches(_parse, batch_format="pandas")


def write_warc(rows, path: str, compress=False):
    """Small-scale WARC writer (tests / fixtures / round-trips): rows
    of {url, warc_ts, html bytes}. Emits response records wrapping a
    minimal HTTP 200 envelope."""
    buf = io.BytesIO()
    for r in rows:
        html = r["html"]
        if isinstance(html, str):
            html = html.encode("utf-8")
        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: text/html" + _CRLF + _CRLF + html
        )
        ts = r.get("warc_ts", "")
        if hasattr(ts, "strftime"):
            ts = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        hdr = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + b"WARC-Target-URI: " + str(r["url"]).encode() + _CRLF
            + b"WARC-Date: " + str(ts).encode() + _CRLF
            + b"Content-Length: " + str(len(http)).encode() + _CRLF
        )
        buf.write(hdr + _CRLF + http + _CRLF + _CRLF)
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
    return path
