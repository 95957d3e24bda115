"""WARC (Web ARChive, ISO 28500) source: the container format the
crawl ecosystem actually exchanges — Common Crawl alone publishes
~100 TB of new WARC per month, and a training-data pipeline's first
job is usually "turn WARC into a documents table". The reference
stores fetched pages straight into Postgres rows (backend/src/
crawler.py persists url+content per response); this module is the
batch-interchange equivalent for corpus-scale ingest: parse WARC
response records into the same (url, status, content_type, body)
shape plans/ingest.py consumes.

Pure-stdlib on purpose (no warcio in the image, none needed): a WARC
record is a header block terminated by CRLFCRLF, a Content-Length
payload, and a CRLFCRLF separator; a *response* record's payload is
itself an HTTP/1.1 message. Both layers are parsed here with explicit
truncation/garbage handling — malformed records surface as dead-letter
rows (parse_error set), never task failures, mirroring the PERMISSIVE
posture of sources/formats.py.

Scale notes (how this maps to a 1000-executor cluster):

* **Per-record gzip members are the split unit.** Common Crawl .warc.gz
  files are concatenations of one gzip member per record precisely so
  readers can resynchronize; ``iter_warc_records`` decompresses
  member-by-member with ``zlib.decompressobj().unused_data`` — memory
  is bounded by one record, never the file.
* **Parsing is mapInPandas over binary blobs** — embarrassingly
  parallel, one task per file/blob, no shuffle. At 100 TB the blobs
  arrive via ``binaryFile`` (one row per WARC file); the testdata path
  synthesizes blobs from the documents table instead (the container
  has no WARC fixtures), exercising the identical parse plumbing.
* **binaryFile loads a whole file per row** — fine for the standard
  ~1 GiB WARC segment size. Files beyond executor memory split by BYTE
  RANGE with the Hadoop-split ownership rule, realized here by
  ``iter_warc_records_range``: a split parses exactly the units — gzip
  members OR frame-validated plain ``WARC/`` records — whose first
  byte lies inside it (reading past its end to finish the last one),
  so a partition of [0, size) reproduces the whole-file parse's VALID
  records record-for-record — property-tested over random cut points
  for gzip, plain and mixed framing. A range-reading datasource only
  has to hand tasks (path, start, end).
* **Member decompression is window-fed** (``_ZWIN`` bytes per feed):
  zlib's ``unused_data`` is a bytes COPY of whatever input followed
  the stream end, so feeding the whole remaining mmap would allocate
  an O(file-tail) buffer per member — an OOM on exactly the
  beyond-memory files this seam exists for. Peak input-side memory is
  one window; output-side is one decompressed member.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from urllib.parse import quote

CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_GZ_MAGIC = b"\x1f\x8b"
# IRI→URI mapping for WARC-Target-URI: leave every printable-ASCII
# byte alone (so already-valid URLs, %xx escapes included, pass
# through untouched) and percent-encode everything else (UTF-8).
_URI_SAFE = "".join(chr(c) for c in range(0x21, 0x7F))

# Output schema of the Spark-side parse (see read_warc_blobs): one row
# per WARC record, dead-letter rows carry parse_error and NULL fields.
WARC_ROWS_SCHEMA = (
    "url string, warc_type string, warc_date string, http_status int, "
    "content_type string, body binary, parse_error string"
)


# --------------------------------------------------------------------------
# writer (fixture/builder side — also how an ingest tier EMITS warc)
# --------------------------------------------------------------------------

def build_http_response(
    body: bytes,
    status: int = 200,
    content_type: str = "text/plain; charset=utf-8",
) -> bytes:
    """Serialize a minimal HTTP/1.1 response message (the payload of a
    WARC ``response`` record). Headers encode latin-1 — the HTTP/1.1
    header charset and what ``_parse_headers`` decodes, so any
    latin-1-able Content-Type round-trips; beyond-latin-1 values raise
    ``UnicodeEncodeError`` and embedded CR/LF raises ``ValueError``
    (it would corrupt the frame) — callers skip-and-count, never
    write a broken record."""
    if "\r" in content_type or "\n" in content_type:
        raise ValueError("CR/LF in content_type would corrupt the frame")
    reason = {200: "OK", 404: "Not Found", 500: "Internal Server Error"}.get(
        status, "Unknown"
    )
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode("latin-1") + body


def build_warc_record(
    url: str,
    payload: bytes,
    warc_type: str = "response",
    warc_date: str = "2026-01-01T00:00:00Z",
    gzip_member: bool = False,
) -> bytes:
    """One WARC/1.0 record; with ``gzip_member=True`` the record is its
    own gzip member (the Common Crawl layout — members concatenate into
    a valid .warc.gz and are individually splittable).

    WARC-Target-URI must be a URI (ASCII): a non-ASCII ``url`` (an IRI
    — real crawl frontiers are full of them) is mapped to its URI form
    by UTF-8 percent-encoding exactly the bytes that are not printable
    ASCII, which also neutralizes CR/LF/space that would corrupt the
    header frame; ASCII URLs (including existing %xx escapes) pass
    through byte-identical. The record id hashes the ORIGINAL url so
    the mapping never aliases two IRIs onto one id."""
    rid = hashlib.md5((url + warc_date).encode("utf-8")).hexdigest()
    url = quote(url, safe=_URI_SAFE)
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    )
    raw = head.encode("ascii") + payload + _HDR_END
    if not gzip_member:
        return raw
    buf = io.BytesIO()
    # mtime pinned so fixture bytes are deterministic run to run
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


# --------------------------------------------------------------------------
# parser (pure functions — unit-testable without Spark)
# --------------------------------------------------------------------------

_GAP_PAD = b"\r\n\x00 \t"  # separator bytes legitimately between records
_MAX_HDR = 64 * 1024  # a WARC header block beyond this is damage
_ZWIN = 1 << 20  # bounded feed window for the gzip decompressor


def _ascii_int(s: str | None) -> int | None:
    """int(s) iff s is a plain ASCII decimal, else None. Not
    ``str.isdigit()``: latin-1-decoded damage can produce characters
    like '³' (U+00B3) for which isdigit() is True but int() RAISES —
    the byte-flip fuzz found exactly that task-killing pair."""
    if s is not None and s.isascii() and s.isdecimal():
        return int(s)
    return None


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(CRLF)[1:]:  # [0] is the version/status line
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.decode("latin-1").strip().lower()] = (
                v.decode("latin-1").strip()
            )
    return headers


def parse_http_response(payload: bytes) -> tuple[int, str, bytes]:
    """(status, content_type, body) from an HTTP/1.1 response message.
    Raises ValueError on garbage — callers dead-letter, never crash."""
    end = payload.find(_HDR_END)
    if end < 0 or not payload.startswith(b"HTTP/"):
        raise ValueError("payload is not an HTTP response message")
    head = payload[:end]
    status_line = head.split(CRLF, 1)[0].decode("latin-1", "replace")
    parts = status_line.split(" ", 2)
    status = _ascii_int(parts[1]) if len(parts) >= 2 else None
    if status is None:
        raise ValueError(f"bad HTTP status line: {status_line!r}")
    headers = _parse_headers(head)
    body = payload[end + len(_HDR_END):]
    n = _ascii_int(headers.get("content-length"))
    if n is not None:
        body = body[:n]
    return status, headers.get("content-type", ""), body


def _record_at(chunk, start: int, n: int | None = None
               ) -> tuple[dict, int, bool]:
    """Parse ONE record whose ``WARC/`` anchor sits at ``start`` — the
    single shared record parser (whole-file walk, plain pre-split and
    the byte-range walk all call it, so the fuzz-hardened logic can't
    drift between copies). Returns ``(row, next_pos, framed)``:

    * ``framed=True`` — the record FRAME is structurally sound (header
      block, ASCII Content-Length, CRLF/EOF after the payload). The
      row may still be a dead-letter (an HTTP payload that fails to
      parse), but the walk continues at ``next_pos`` with full
      confidence.
    * ``framed=False`` — truncated/corrupt header, bad Content-Length
      or a lying one (frame check). ``row`` is the dead-letter to emit
      in CONFIRMED contexts; a range walk probing a scanned anchor
      (possibly a stray ``WARC/`` inside a payload or inside
      compressed bytes) skips it silently instead.

    Frame check detail: a record's content block must be followed by
    the CRLF separator (or EOF). A corrupted Content-Length lands
    ``payload_end`` on arbitrary bytes — trusting it there would
    silently swallow whatever follows (review-found: one flipped digit
    ate the next gzip member). The payload's OWN bytes are never
    scanned, so embedded magic/``WARC/`` stays harmless in the valid
    case. Header search is bounded at ``_MAX_HDR``: real WARC header
    blocks are <1 KiB, and an unbounded find from a false anchor would
    scan O(split) bytes per probe."""
    if n is None:
        n = len(chunk)
    hdr_end = chunk.find(_HDR_END, start, start + _MAX_HDR)
    if hdr_end < 0:
        return _dead("truncated WARC header block"), start + 5, False
    headers = _parse_headers(chunk[start:hdr_end])
    url = headers.get("warc-target-uri")
    wtype = headers.get("warc-type", "")
    wdate = headers.get("warc-date", "")
    cl = _ascii_int(headers.get("content-length"))
    body_start = hdr_end + len(_HDR_END)
    if cl is None:
        return (_dead("missing/invalid WARC Content-Length", url),
                body_start, False)
    payload_end = body_start + cl
    payload = chunk[body_start:payload_end]
    if len(payload) < cl:
        # short payload = genuine truncation at EOF OR a Content-Length
        # inflated past EOF by damage — either way dead-letter this
        # record and resync right after the header so intact framing
        # after it survives
        return _dead("truncated WARC payload", url), body_start, False
    if payload_end < n and chunk[payload_end:payload_end + 2] != CRLF:
        return (_dead("record frame mismatch (corrupt Content-Length?)",
                      url), body_start, False)
    if wtype != "response":
        # warcinfo/request/metadata records ride along in real files;
        # surface them with NULL http fields
        return ({
            "url": url, "warc_type": wtype, "warc_date": wdate,
            "http_status": None, "content_type": None,
            "body": None, "parse_error": None,
        }, payload_end, True)
    try:
        status, ctype, body = parse_http_response(payload)
    except ValueError as exc:
        return _dead(str(exc), url, wtype, wdate), payload_end, True
    return ({
        "url": url, "warc_type": wtype, "warc_date": wdate,
        "http_status": status, "content_type": ctype,
        "body": body, "parse_error": None,
    }, payload_end, True)


def _records_in(chunk: bytes, pos: int = 0,
                stop_at_gzip: bool = False) -> tuple[list[dict], int]:
    """Content-Length-aware record walk over plaintext bytes starting
    at ``pos``: payload bytes are SKIPPED, never scanned, so a gzip
    magic inside a record body (a crawled .gz download — common) can
    never split a record (review-found regression in the segment
    pre-split). With ``stop_at_gzip`` a magic in the INTER-record gap
    ends the walk (the framing switches back to gzip members there).
    Returns (rows, position where the walk stopped)."""
    rows: list[dict] = []
    n = len(chunk)
    while True:
        start = chunk.find(b"WARC/", pos)
        if stop_at_gzip:
            # search ONLY the inter-record gap for a framing switch —
            # an unbounded find here scans to end-of-blob per record,
            # turning a 1 GiB plain segment quadratic (bench-found)
            gap_end = n if start < 0 else start
            gz = chunk.find(_GZ_MAGIC, pos, gap_end + 1)
            if gz >= 0 and (start < 0 or gz < start):
                return rows, gz
        if start < 0:
            return rows, n
        # whole-file context: every position is confirmed, so damaged
        # frames dead-letter (the walk KEEPS SCANNING — review-found:
        # returning early cost the rest of the file for one mangled
        # record)
        row, pos, _framed = _record_at(chunk, start, n)
        rows.append(row)


def iter_warc_records(blob: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record in ``blob`` (plain, gzip-member,
    or a mix — the framing is re-sniffed between records). Each dict
    has url/warc_type/warc_date/http_status/content_type/body/
    parse_error; a record that fails either parse layer yields a
    dead-letter dict (parse_error set, other fields None) and parsing
    continues at the NEXT record — one mangled record in a 1 GiB
    segment costs one row, not the file.

    Damage handling (property-tested over every byte position,
    tests/test_sources.py): a corrupted or truncated gzip member
    dead-letters one row and the walk resynchronizes at the next gzip
    magic — from ANY position, including a damaged magic at offset 0
    (fuzz-found: a leading-bytes-only sniff silently lost every member
    behind one flipped first byte). A plain region that yields no
    records at all (e.g. a member whose magic was corrupted, now
    unrecognizable compressed bytes) surfaces as one flagged row;
    ordinary record separators between regions stay silent.

    Header blocks are bounded at ``_MAX_HDR`` (64 KiB — real WARC
    headers are <1 KiB; an unbounded search from a false anchor would
    scan O(blob) per probe): a header block exceeding the bound
    dead-letters as truncated and the walk resynchronizes INSIDE it,
    so one pathological header can emit several dead rows as the scan
    rediscovers ``WARC/`` substrings — a deliberate DoS bound, pinned
    by test (oversized-header fixture)."""
    view = memoryview(blob)
    pos, n = 0, len(blob)
    while pos < n:
        if blob[pos:pos + 2] == _GZ_MAGIC:
            rows, pos, failed = _gzip_member_at(blob, pos)
            yield from rows
            if failed:
                # resync at whichever comes first: the next member OR
                # a plain record header (mixed framing — fuzz-found: a
                # magic-only scan skipped plain records sitting between
                # a damaged member and the next one)
                pos = _scan_anchor(blob, pos)
                if pos < 0:
                    return
        else:
            rows, new_pos = _records_in(blob, pos, stop_at_gzip=True)
            yield from rows
            if not rows and bytes(view[pos:new_pos]).strip(_GAP_PAD):
                yield _dead("no WARC records in segment")
            pos = max(new_pos, pos + 1)


def _dead(msg: str, url=None, wtype=None, wdate=None) -> dict:
    return {
        "url": url, "warc_type": wtype, "warc_date": wdate,
        "http_status": None, "content_type": None, "body": None,
        "parse_error": msg,
    }


def _gzip_member_at(blob, pos: int) -> tuple[list[dict], int, bool]:
    """Decompress and parse ONE gzip member starting at ``pos`` (the
    hardened member arm shared by the whole-file and range walkers —
    review-found: two drifting copies of fuzz-fixed logic). Returns
    ``(rows, next_pos, failed)``:

    * success → (records [+ a 'no WARC records' dead row for a
      non-empty recordless member], position after the member, False)
    * corrupt member → ([dead row], pos + 2 — the caller resyncs from
      there with ITS framing rules, True)
    * truncated member → (salvaged records + dead row, pos + 2, True):
      truncation consumed the rest of the BUFFER, but the raw bytes of
      any members behind it are still in the blob — a flipped header
      flag bit (e.g. FEXTRA) can make zlib silently eat everything
      without erroring (fuzz-found), so the caller must resync exactly
      as for corruption; genuine truncation-at-EOF just finds nothing.

    Input is fed in ``_ZWIN``-byte windows, never the whole tail:
    ``unused_data`` materializes a copy of every input byte past the
    stream end, so a single whole-tail feed costs O(file) memory per
    member and O(file²) bytes copied across a per-record-member
    segment. With windows, ``unused_data`` is at most one window (the
    tail of the window where ``eof`` landed) and the member end is
    ``fed − len(unused_data)``.
    """
    d = zlib.decompressobj(wbits=47)  # 32+15: gzip container
    mv = memoryview(blob)
    n = len(blob)
    fed = pos
    out: list[bytes] = []
    try:
        while fed < n and not d.eof:
            win = mv[fed:fed + _ZWIN]
            out.append(d.decompress(win))
            fed += len(win) - len(d.unused_data)
    except zlib.error as exc:
        return [_dead(f"corrupt gzip member: {exc}")], pos + 2, True
    data = b"".join(out)
    # member data is self-contained plaintext: no gzip-boundary scan
    # inside it (embedded magic in trailing garbage is skipped like
    # any other inter-record junk)
    rows, _ = _records_in(data)
    if not rows and data.strip(_GAP_PAD):
        rows.append(_dead("no WARC records in segment"))
    if not d.eof:
        rows.append(_dead("truncated gzip member"))
        return rows, pos + 2, True
    return rows, fed, False


def _scan_anchor(blob, pos: int) -> int:
    """Position of the next framing anchor at or after ``pos`` — a
    gzip magic or a plain ``WARC/`` header start, whichever comes
    first — or -1. Probes in ``_ZWIN`` windows so one call is a single
    bounded forward pass: an unbounded ``find`` for the ABSENT anchor
    kind (no ``WARC/`` anywhere in an all-gzip file, no magic in an
    all-plain one) would scan to end-of-blob per call, turning the
    range walk quadratic across splits (the same bench-found trap
    ``_records_in``'s gap-bounded magic search fixes)."""
    n = len(blob)
    while pos < n:
        hi = min(pos + _ZWIN, n)
        # +1/+4 so an anchor STARTING inside the window is found even
        # when its bytes straddle the window edge
        cands = [x for x in (blob.find(_GZ_MAGIC, pos, hi + 1),
                             blob.find(b"WARC/", pos, hi + 4))
                 if 0 <= x < hi]
        if cands:
            return min(cands)
        pos = hi
    return -1


_MAX_VERLINE = 64  # a WARC version line is ~10 bytes; 64 is damage


def _plausible_anchor(blob, pos: int) -> bool:
    """Cheap plausibility gate for a SCANNED plain anchor: a record's
    version line must END (CRLF) within ``_MAX_VERLINE`` bytes — true
    for every real version token (``WARC/1.0`` and any tolerated
    variant), false for stray ``WARC/`` text running into a payload.
    The gate exists as a DoS bound, NOT a validator: a full
    ``_record_at`` probe scans up to ``_MAX_HDR`` per candidate, so a
    hostile payload stuffed with ``WARC/`` bytes would cost
    O(strays × 64 KiB) without it; this check caps the reject cost at
    64 bytes per stray while accepting anything remotely version-
    shaped (review-found: a digits-only version check here silently
    dropped frame-valid records with nonstandard version tokens —
    the frame validation is the ownership test, never this gate).
    CHAINED positions bypass it so the confirmed trajectory stays
    byte-identical to the whole-file walk's; the residual divergence
    (a frame-valid record whose version line exceeds 64 bytes is
    skipped by scans but parsed whole-file) is pathological damage by
    construction."""
    return blob.find(CRLF, pos + 5, pos + 5 + _MAX_VERLINE) >= 0


def iter_warc_records_range(
    blob: bytes, start: int, end: int
) -> Iterator[dict]:
    """Records of every unit — gzip member OR frame-validated plain
    ``WARC/`` record — whose FIRST BYTE lies in ``[start, end)``: the
    Hadoop input-split ownership rule. Each unit belongs to exactly
    the split containing its first byte, a split reads past its end
    to finish its last unit, and a split landing mid-unit
    self-synchronizes forward to the next anchor it owns.
    Concatenating all splits' outputs over any partition of
    ``[0, len(blob))`` therefore reproduces ``iter_warc_records``'s
    VALID records record-for-record (property-tested over random cut
    points for gzip, plain, mixed, and padded framing, and fuzzed
    under single-byte damage × random cuts).

    Ownership of a gzip anchor is confirmed by the decompressor (a
    stray magic in compressed bytes fails and is skipped silently —
    see dead-letter rule below). Ownership of a plain anchor is
    confirmed by the version-line plausibility gate plus
    ``_record_at``'s frame validation: a scanned anchor that parses
    with a sound frame (``framed=True``) is a real record boundary
    and is owned; one that doesn't (a stray ``WARC/`` inside a
    payload the previous split's chain would have skipped) is dropped
    silently.

    KNOWN AMBIGUITY of plain framing (no sync marker exists): a
    payload that EMBEDS a complete frame-valid WARC record — most
    plausibly an archived ``.warc`` served as a response body — can
    be emitted as a phantom record by a split landing inside that
    payload; real records are never LOST (the chain re-synchronizes
    at the next true anchor), but the union can be a superset, and
    SUPERSET-ONLY is the pinned contract: the extra rows are exactly
    the embedded record(s), nothing else (tests/test_sources.py
    ``test_plain_embedded_record_ambiguity_and_exact_mode`` asserts
    both directions — ``whole ⊆ union ⊆ whole ∪ {embedded}`` over
    every cut — and that ``plain_exact=True`` is byte-exact). Gzip
    members don't have this problem (the decompressor is the proof),
    which is why per-record ``.warc.gz`` is the recommended
    interchange; ``read_warc_files_ranged`` therefore DEFAULTS to
    ``plain_exact=True`` — callers opt INTO split parallelism for
    plain files (accepting the phantom superset) rather than opting
    out of exactness.

    This is the beyond-memory seam: a range-reading datasource hands
    each task (path, start, end) and tasks parse independently with
    no coordination.

    Dead-letter accounting at split boundaries is CONFIRMED-BOUNDARY
    only (review-found): a parse failure at a position reached by
    scanning is skipped silently; failures at positions CHAINED from
    a successfully parsed unit (exact end-offset arithmetic) are
    genuine corruption in bytes this split owns and dead-letter.
    Without this rule a healthy 100 GiB segment would emit a false
    corruption row for a sizable fraction of its splits, poisoning
    the monitoring channel. (Corners: a cut landing exactly on a
    DAMAGED plain anchor, or in the padding just before one, loses
    that one dead row; likewise a cut landing exactly on a corrupt
    gzip member's own magic — a NONZERO split start is scanned, not
    confirmed, because a boundary landing on a stray ``\\x1f\\x8b``
    inside a plain record's payload (crawled .gz downloads — common)
    must not emit a false 'corrupt gzip member' row. Offset 0 is the
    exception: it cannot be inside a preceding payload, so the first
    split reports a corrupt first member exactly like the whole-file
    walk. Valid records are the contract either way: a REAL member at
    the start decompresses and its records surface regardless of
    confirmation, which only gates dead-letter emission on
    failure.)"""
    pos = start
    # a nonzero split start is never blindly trusted: gzip anchors
    # prove ownership through the decompressor, plain anchors through
    # frame validation — a cut landing on a stray magic or "WARC/"
    # inside a payload is a scanned (unconfirmed) position. Offset 0
    # is the one authoritative start (no preceding payload exists for
    # it to be inside), so the [0, ...) split stays dead-letter-
    # faithful to the whole-file walk — review-found: an unconditional
    # False here silently swallowed the corruption signal for a
    # corrupt FIRST member that iter_warc_records reports.
    confirmed = start == 0
    while 0 <= pos < end:
        if blob[pos:pos + 2] == _GZ_MAGIC:
            rows, nxt, failed = _gzip_member_at(blob, pos)
            if failed:
                # valid salvaged records always surface (a truncated
                # REAL member this split owns); dead rows only from
                # confirmed positions — scanned-prefix failures belong
                # to the previous split's healthy bytes. A failure in
                # a CONFIRMED region KEEPS confirmation across the
                # resync: the bytes up to the next valid unit are
                # owned corrupt bytes, and the whole-file walk
                # dead-letters every failed probe inside them — so
                # must this split (review-found: dropping to scanned
                # here made two consecutive corrupt head members
                # report only one dead row).
                for r in rows:
                    if r["parse_error"] is None or confirmed:
                        yield r
                pos = _scan_anchor(blob, nxt)
                continue
            yield from rows
            # nxt may land on legal inter-member padding, not an
            # anchor — the scan arm below walks it (review-found: a
            # blind _record_at probe here emitted a false dead row
            # AND overshot the next member's magic, losing it)
            pos, confirmed = nxt, True
        elif blob[pos:pos + 5] == b"WARC/":
            if not confirmed and not _plausible_anchor(blob, pos):
                pos, confirmed = _scan_anchor(blob, pos + 5), False
                continue
            row, nxt, framed = _record_at(blob, pos)
            if framed or confirmed:
                # framed: a real record this split owns (may still be
                # an HTTP-layer dead-letter). Unframed but chained:
                # genuine damage in owned bytes, same row the
                # whole-file walk emits.
                yield row
            if framed:
                pos, confirmed = nxt, True
            elif confirmed:
                # chained damage: continue where the whole-file walk
                # would (its _records_in resumes at _record_at's
                # next_pos), keeping dead-letter trajectories aligned
                pos, confirmed = max(nxt, pos + 1), False
            else:
                # scanned stray that survived the plausibility gate:
                # resync conservatively just past the probe
                pos, confirmed = _scan_anchor(blob, pos + 5), False
        else:
            # not on an anchor: chained past a unit into separator
            # bytes, or handed a mid-unit split start — scan forward.
            # A pure-padding gap keeps the chain confirmed (the
            # whole-file walk crosses it silently too); junk doesn't.
            nxt = _scan_anchor(blob, pos)
            if nxt < 0:
                return
            if confirmed and bytes(
                    memoryview(blob)[pos:nxt]).strip(_GAP_PAD):
                confirmed = False
            pos = nxt


# --------------------------------------------------------------------------
# Spark plumbing
# --------------------------------------------------------------------------

def read_warc_blobs(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Parse a DataFrame of WARC blobs (binary column) into one row per
    record (WARC_ROWS_SCHEMA). mapInPandas: Arrow-batched, one task per
    input partition, no shuffle — the parse parallelizes with the blob
    count."""
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_type", "warc_date", "http_status",
                "content_type", "body", "parse_error"]
        for pdf in batches:
            # parse the buffer Arrow handed us AS-IS (bytes or
            # bytearray both support the find/slice walk) — a
            # bytes(blob) here materialized a SECOND full copy of
            # every file beside Spark's own buffer, 2× file size per
            # task on the default whole-file path (review-found)
            rows = [
                rec
                for blob in pdf[blob_col]
                if blob is not None
                for rec in iter_warc_records(
                    blob if isinstance(blob, (bytes, bytearray))
                    else bytes(blob))
            ]
            yield pd.DataFrame(rows, columns=cols) if rows else (
                pd.DataFrame({c: [] for c in cols})
            )

    return blobs.mapInPandas(parse, WARC_ROWS_SCHEMA)


def read_warc_files(spark, path: str) -> DataFrame:
    """WARC records from .warc / .warc.gz files under ``path`` via the
    binaryFile source (one row per file, whole-file content). The
    standard segment size (~1 GiB) fits a task comfortably; see module
    docstring for the beyond-memory seam."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        # the glob is prefix-loose ("foo.warcx" matches); the exact
        # suffix check runs on the metadata column, same rule as the
        # ranged lister's endswith filter
        .filter(
            F.col("path").endswith(".warc")
            | F.col("path").endswith(".warc.gz")
        )
        .select("content")
    )
    return read_warc_blobs(files, "content")


def write_warc_files(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    body_col: str = "body",
    status_col: str | None = None,
    content_type_col: str | None = None,
    gzip_members: bool = True,
) -> DataFrame:
    """Distributed WARC sink — the EXPORT half of the interchange seam
    (the reference persists pages as Postgres rows, backend/src/
    crawler.py; a corpus pipeline hands downstream consumers segments
    instead). Each task serializes ITS partition as one segment of
    per-record gzip members (the Common Crawl layout, so the output
    is exactly what ``read_warc_files_ranged`` byte-range splits),
    writing executor-side to ``out_dir`` — a shared POSIX path here;
    on object stores the ``open()`` becomes a streaming PUT, the walk
    is identical. No shuffle: the export parallelizes with the input
    partitioning, memory is bounded by one record.

    Returns a manifest DataFrame (file, n_records, n_skipped), one
    row per partition — run the export by consuming it (``.collect()``
    is bounded by partition count). Rows that cannot serialize are
    SKIPPED, counted in ``n_skipped`` — never a task failure, never
    fabricated fields (review-found: ``int(None)`` used to kill the
    task): NULL url/body/status, plus rows whose headers cannot
    encode (a beyond-latin-1 content_type) or would corrupt the
    frame (CR/LF in a header value) — ``UnicodeEncodeError``/
    ``ValueError`` from the builders is the skip signal
    (review-found: a non-ASCII header byte used to kill the task,
    violating the documented skip discipline). Non-ASCII IRIs do
    NOT skip: ``build_warc_record`` percent-encodes them to their
    URI form, so real crawl frontiers serialize. Empty partitions
    write empty files, which the ranged lister's zero-size split
    rule skips.

    Task-commit protocol: each attempt writes to a private
    ``.inprogress-<attempt>`` name and atomically renames on
    completion, so a crashed or speculative attempt never leaves a
    truncated/interleaved segment at the published path (the same
    rename-on-commit rule Hadoop output committers apply), and the
    readers' exact-suffix filter ignores any orphaned temp files."""
    import os

    status = status_col
    ctype = content_type_col

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        suffix = ".warc.gz" if gzip_members else ".warc"
        path = os.path.join(out_dir, f"part-{ctx.partitionId():05d}{suffix}")
        tmp = f"{path}.inprogress-{ctx.taskAttemptId()}"
        n = skipped = 0
        with open(tmp, "wb") as f:
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    row = r._asdict()
                    url, body = row[url_col], row[body_col]
                    st = row[status] if status else 200
                    ct = row[ctype] if ctype else None
                    if url is None or body is None or pd.isna(st):
                        skipped += 1
                        continue
                    try:
                        payload = build_http_response(
                            bytes(body),
                            status=int(st),
                            content_type=(ct if isinstance(ct, str)
                                          else "text/plain; charset=utf-8"),
                        )
                        rec = build_warc_record(
                            url, payload, gzip_member=gzip_members)
                    except (UnicodeEncodeError, ValueError):
                        skipped += 1
                        continue
                    f.write(rec)
                    n += 1
        os.replace(tmp, path)  # atomic publish
        yield pd.DataFrame(
            {"file": [path], "n_records": [n], "n_skipped": [skipped]})

    return df.mapInPandas(
        write, "file string, n_records long, n_skipped long")


def read_warc_files_ranged(
    spark, path: str, split_bytes: int = 128 * 1024 * 1024,
    flush_rows: int = 2048, plain_exact: bool = True,
) -> DataFrame:
    """WARC records from .warc / .warc.gz files at ``path`` (a
    directory tree or a single file) via BYTE-RANGE splits — the
    beyond-memory path ``read_warc_files`` (whole-file binaryFile
    rows) can't take: the driver lists (file, start, end) split rows
    (metadata only, bounded by file count × splits per file), each
    task mmaps ITS file and runs the range walk, yielding Arrow
    batches every ``flush_rows`` records so task memory tracks the
    batch, not the split's decompressed size. Both framings
    range-split: gzip members self-synchronize by magic, plain
    records by frame validation (see ``iter_warc_records_range``,
    including the documented phantom-record ambiguity when a plain
    payload embeds a frame-valid record). ``plain_exact`` DEFAULTS to
    True — exactness first: each file is sniffed (one 2-byte read at
    driver listing time) and non-gzip files get ONE whole-file split,
    byte-exact by construction. Pass ``plain_exact=False`` to opt
    plain files INTO range splits, trading the pinned superset-only
    phantom ambiguity for their split parallelism (gzip files
    range-split either way — the decompressor makes them exact).
    Raises on a path with no WARC files: an empty frame from a typo'd
    path is silent data loss.

    Split-ownership equivalence with the whole-file parse is
    property-tested (iter_warc_records_range). mmap needs a POSIX
    path visible on every executor (local, NFS, fuse mounts); on
    object stores the same walk runs over ranged GETs — the seam is
    identical, only the byte source changes."""
    import os

    def _file_splits(p: str) -> list[tuple[str, int, int]]:
        size = os.path.getsize(p)
        if plain_exact and size:
            with open(p, "rb") as f:
                if f.read(2) != _GZ_MAGIC:
                    return [(p, -1, -1)]  # (-1, -1) = whole-file parse
        return [(p, off, min(off + split_bytes, size))
                for off in range(0, size, split_bytes)]

    splits: list[tuple[str, int, int]] = []
    if os.path.isfile(path):
        splits = _file_splits(path)
    else:
        for root, _dirs, names in os.walk(path):
            for name in sorted(names):
                if name.endswith((".warc", ".warc.gz")):
                    splits.extend(_file_splits(os.path.join(root, name)))
    if not splits:
        raise FileNotFoundError(
            f"no non-empty .warc/.warc.gz files under {path!r}")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import mmap

        cols = ["url", "warc_type", "warc_date", "http_status",
                "content_type", "body", "parse_error"]
        buf: list[dict] = []

        def _flush():
            out = pd.DataFrame(buf, columns=cols)
            buf.clear()
            return out

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                with open(r.file, "rb") as f, \
                        mmap.mmap(f.fileno(), 0,
                                  access=mmap.ACCESS_READ) as mm:
                    recs = (iter_warc_records(mm) if r.start < 0 else
                            iter_warc_records_range(mm, r.start, r.end))
                    for rec in recs:
                        buf.append(rec)
                        if len(buf) >= flush_rows:
                            yield _flush()
        yield _flush() if buf else pd.DataFrame({c: [] for c in cols})

    df = spark.createDataFrame(splits, "file string, start long, end long")
    # one task per split: the split list IS the parallelism
    return df.repartition(max(1, len(splits))).mapInPandas(
        parse, WARC_ROWS_SCHEMA)
