"""Pure-stdlib WARC/1.0 (ISO 28500) reader + writer — the Common Crawl
ingest format (SURVEY §2.11 N4/N7 pipelines start at .warc/.wet files).

Scope: uncompressed WARC with ``warcinfo`` / ``conversion`` /
``response`` / ``metadata`` records — the WET (extracted-text) profile
Common Crawl publishes is ``warcinfo`` + one ``conversion`` record per
page, which is exactly what a training-data pipeline consumes.  The
parser is strict: version-line check, CRLF header framing,
``Content-Length``-driven payload extraction, and the mandatory
two-CRLF record terminator all raise ``ValueError`` with the offending
offset rather than resyncing silently (corrupt crawl segments should
surface, not skip).

Gzip (.warc.gz is a concatenation of per-record gzip MEMBERS, which is
what makes the format splittable at scale) is handled by the caller:
each member inflates independently, so a 100 TB crawl fans out
per-member; this module always sees the inflated bytes.  In-container
tests exercise the uncompressed path; the member-split read is the same
``parse_warc`` per slice.
"""

from __future__ import annotations

_CRLF = b"\r\n"


def write_warc(records: list[dict], warcinfo: str = "software: spark-graft") -> bytes:
    """Serialize records to WARC/1.0 bytes, prefixed by a ``warcinfo``
    record.  Each record dict: ``warc_type``, ``record_id``,
    ``warc_date`` (ISO-8601 Z), optional ``target_uri``, ``payload``
    (bytes or str; str encodes UTF-8)."""
    out = bytearray()

    def emit(headers: list[tuple[str, str]], payload: bytes) -> None:
        out.extend(b"WARC/1.0" + _CRLF)
        for k, v in headers:
            out.extend(f"{k}: {v}".encode() + _CRLF)
        out.extend(f"Content-Length: {len(payload)}".encode() + _CRLF)
        out.extend(_CRLF)
        out.extend(payload)
        out.extend(_CRLF + _CRLF)

    emit(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
            ("WARC-Date", "2024-01-01T00:00:00Z"),
            ("Content-Type", "application/warc-fields"),
        ],
        (warcinfo + "\r\n").encode(),
    )
    for rec in records:
        payload = rec["payload"]
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        headers = [
            ("WARC-Type", rec["warc_type"]),
            ("WARC-Record-ID", rec["record_id"]),
            ("WARC-Date", rec["warc_date"]),
        ]
        if rec.get("target_uri"):
            headers.append(("WARC-Target-URI", rec["target_uri"]))
        if rec.get("content_type"):
            headers.append(("Content-Type", rec["content_type"]))
        emit(headers, payload)
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC/1.0 bytes into record dicts with keys ``warc_type``,
    ``record_id``, ``warc_date``, ``target_uri`` (None if absent),
    ``content_length`` and ``payload`` (bytes).  Strict framing — any
    malformed version line, header, length or terminator raises."""
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError(f"missing version line terminator at {pos}")
        version = data[pos:eol]
        if version != b"WARC/1.0":
            raise ValueError(f"bad WARC version line at {pos}: {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError(f"unterminated header block at {pos}")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line ends headers
            if b":" not in line:
                raise ValueError(f"malformed header at {pos}: {line!r}")
            k, v = line.split(b":", 1)
            headers[k.decode("ascii").strip().lower()] = v.decode(
                "utf-8"
            ).strip()
        if "content-length" not in headers:
            raise ValueError(f"record at {pos} missing Content-Length")
        clen = int(headers["content-length"])
        if pos + clen > n:
            raise ValueError(
                f"payload truncated at {pos}: need {clen} bytes"
            )
        payload = data[pos:pos + clen]
        pos += clen
        if data[pos:pos + 4] != _CRLF + _CRLF:
            raise ValueError(f"missing record terminator at {pos}")
        pos += 4
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "record_id": headers.get("warc-record-id", ""),
                "warc_date": headers.get("warc-date", ""),
                "target_uri": headers.get("warc-target-uri"),
                "content_length": clen,
                "payload": payload,
            }
        )
    return records
