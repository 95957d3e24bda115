"""Unit tests for the interchange sources (WARC, sitemap), the
boilerplate classifier, and the judge client seam — the edge cases the
roundtrip value-oracles (queries_sources.py) cannot reach: dead-letter
rows, record-level resync after garbage, gzip member framing, sitemap
index indirection, transport failure degradation."""

from __future__ import annotations

import gzip
import json

import pytest

from crawler_spark.sources.warc import (
    build_http_response,
    build_warc_record,
    iter_warc_records,
    parse_http_response,
)


def _rec(url="https://a.example.com/1", body=b"hello world", **kw):
    return build_warc_record(url, build_http_response(body), **kw)


class TestWarcParser:
    def test_roundtrip_plain(self):
        blob = _rec() + _rec("https://a.example.com/2", b"second")
        out = list(iter_warc_records(blob))
        assert [r["url"] for r in out] == [
            "https://a.example.com/1", "https://a.example.com/2"]
        assert out[0]["body"] == b"hello world"
        assert out[0]["http_status"] == 200
        assert out[0]["content_type"] == "text/plain; charset=utf-8"
        assert all(r["parse_error"] is None for r in out)

    def test_gzip_members_equal_plain(self):
        recs = [("https://x/1", b"a" * 10), ("https://x/2", b"b" * 20)]
        plain = b"".join(
            build_warc_record(u, build_http_response(b)) for u, b in recs)
        gz = b"".join(
            build_warc_record(u, build_http_response(b), gzip_member=True)
            for u, b in recs)
        assert list(iter_warc_records(plain)) == list(iter_warc_records(gz))

    def test_whole_blob_gzip(self):
        # a .warc.gz written as ONE member (legal, just not splittable)
        blob = gzip.compress(_rec())
        (r,) = iter_warc_records(blob)
        assert r["body"] == b"hello world" and r["parse_error"] is None

    def test_non_response_record_rides_along(self):
        info = build_warc_record("https://x/i", b"software: test",
                                 warc_type="warcinfo")
        out = list(iter_warc_records(info + _rec()))
        assert out[0]["warc_type"] == "warcinfo"
        assert out[0]["http_status"] is None and out[0]["body"] is None
        assert out[1]["parse_error"] is None

    def test_bad_content_length_dead_letters_and_resyncs(self):
        bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://bad/1\r\n"
               b"Content-Length: nope\r\n\r\n")
        out = list(iter_warc_records(bad + _rec()))
        assert out[0]["parse_error"] is not None
        assert out[0]["url"] == "https://bad/1"
        # the record AFTER the garbage still parses
        assert out[1]["url"] == "https://a.example.com/1"
        assert out[1]["parse_error"] is None

    def test_truncated_payload_dead_letters(self):
        blob = _rec()[:-30]  # cut into the payload
        out = list(iter_warc_records(blob))
        assert out[-1]["parse_error"] is not None

    def test_non_http_payload_dead_letters(self):
        rec = build_warc_record("https://x/1", b"this is not http")
        (r,) = iter_warc_records(rec)
        assert r["parse_error"] is not None and r["url"] == "https://x/1"

    def test_http_parse_respects_content_length(self):
        status, ctype, body = parse_http_response(
            build_http_response(b"abc") + b"trailing-junk")
        assert (status, body) == (200, b"abc")

    def test_embedded_gzip_magic_in_plain_record_body(self):
        """Review-found regression: a PLAIN record whose body contains
        the gzip magic (a crawled .gz download) must parse whole —
        Content-Length skipping makes embedded magic invisible, and
        the record after it still parses."""
        gz_payload = b"PK\x03\x04 fake zip then " + b"\x1f\x8b" + b"\x08tail"
        blob = (_rec("https://x/a", gz_payload)
                + _rec("https://x/b", b"after"))
        out = list(iter_warc_records(blob))
        assert [r["url"] for r in out] == ["https://x/a", "https://x/b"]
        assert out[0]["body"] == gz_payload
        assert all(r["parse_error"] is None for r in out)

    def test_embedded_magic_inside_gzip_member_body(self):
        # same property through the gzip-member path
        gz_payload = b"\x1f\x8b inside a compressed record body"
        blob = (_rec("https://x/a", gz_payload, gzip_member=True)
                + _rec("https://x/b", b"after", gzip_member=True))
        out = list(iter_warc_records(blob))
        assert [r["url"] for r in out] == ["https://x/a", "https://x/b"]
        assert out[0]["body"] == gz_payload

    def test_corrupt_content_length_never_swallows_next_member(self):
        """Review-found: a plain record whose Content-Length was
        inflated by damage must dead-letter (frame mismatch), not
        silently absorb the following gzip member into its body — and
        the member's record must survive via resync."""
        plain = bytearray(_rec("https://x/p", b"x" * 100))
        # the FIRST Content-Length in the bytes is the WARC-level one
        # (WARC headers precede the HTTP payload); inflate its leading
        # digit — one flipped byte, the reviewer's exact scenario
        digit = plain.index(b"Content-Length: ") + len(b"Content-Length: ")
        plain[digit] = ord("9")
        blob = bytes(plain) + _rec("https://x/gz", b"after",
                                   gzip_member=True)
        out = list(iter_warc_records(blob))
        good = [r["url"] for r in out if r["parse_error"] is None]
        assert "https://x/gz" in good, out
        assert "https://x/p" not in good
        assert any(r["parse_error"] is not None for r in out)

    def test_truncated_plain_header_keeps_following_members(self):
        """Review-found: a plain record cut inside its header block
        must cost one dead-letter row — gzip members after it still
        parse."""
        cut = b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/t"
        blob = cut + _rec("https://x/gz1", b"one", gzip_member=True) \
                   + _rec("https://x/gz2", b"two", gzip_member=True)
        out = list(iter_warc_records(blob))
        good = [r["url"] for r in out if r["parse_error"] is None]
        assert good == ["https://x/gz1", "https://x/gz2"], out
        assert any("header" in (r["parse_error"] or "") for r in out)

    def test_mixed_plain_then_gzip_framing(self):
        # framing re-sniffed between records: plain record followed by
        # gzip members parses completely, no spurious dead letters
        blob = (_rec("https://x/plain", b"plaintext record")
                + _rec("https://x/gz1", b"member one", gzip_member=True)
                + _rec("https://x/gz2", b"member two", gzip_member=True))
        out = list(iter_warc_records(blob))
        assert [r["url"] for r in out] == [
            "https://x/plain", "https://x/gz1", "https://x/gz2"]
        assert all(r["parse_error"] is None for r in out)

    def test_trailing_garbage_after_last_gzip_member(self):
        # garbage after the final member must dead-letter ONE row, not
        # fail the task (ADVICE r5: zlib.error used to propagate)
        blob = _rec(gzip_member=True) + b"\x00\x01GARBAGE"
        out = list(iter_warc_records(blob))
        good = [r for r in out if r["parse_error"] is None]
        dead = [r for r in out if r["parse_error"] is not None]
        assert [r["url"] for r in good] == ["https://a.example.com/1"]
        assert len(dead) == 1  # the garbage is one flagged row

    def test_corrupt_gzip_member_resyncs_to_next(self):
        # bit-flip inside member 2 of 3: members 1 and 3 survive,
        # member 2 becomes a dead-letter row
        m1 = _rec(gzip_member=True)
        m2 = bytearray(_rec("https://x/2", b"b" * 50, gzip_member=True))
        m2[len(m2) // 2] ^= 0xFF
        m3 = _rec("https://x/3", b"c" * 10, gzip_member=True)
        out = list(iter_warc_records(m1 + bytes(m2) + m3))
        good = [r["url"] for r in out if r["parse_error"] is None]
        dead = [r for r in out if r["parse_error"] is not None
                and "gzip" in r["parse_error"]]
        assert "https://a.example.com/1" in good and "https://x/3" in good
        assert "https://x/2" not in good
        assert len(dead) >= 1

    def test_truncated_gzip_member_flagged(self):
        blob = _rec(gzip_member=True)[:-8]  # cut into the member
        out = list(iter_warc_records(blob))
        assert any(r["parse_error"] is not None for r in out)

    def test_any_single_byte_corruption_never_raises(self):
        """Property (hypothesis): flip ANY byte anywhere in a 3-member
        .warc.gz — the parser must never raise, the two UNDAMAGED
        members' records must survive, and at most the damaged member
        is lost. This is the permissive-posture contract the module
        docstring claims, fuzzed instead of hand-picked."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        members = [
            _rec("https://f/0", b"a" * 30, gzip_member=True),
            _rec("https://f/1", b"b" * 40, gzip_member=True),
            _rec("https://f/2", b"c" * 50, gzip_member=True),
        ]
        lens = [len(m) for m in members]
        blob = bytearray(b"".join(members))

        @given(st.integers(min_value=0, max_value=len(blob) - 1),
               st.integers(min_value=1, max_value=255))
        @settings(max_examples=200, deadline=None)
        def check(pos, flip):
            damaged = bytearray(blob)
            damaged[pos] ^= flip
            # which member did the flip land in?
            hit, off = 0, pos
            while off >= lens[hit]:
                off -= lens[hit]
                hit += 1
            out = list(iter_warc_records(bytes(damaged)))  # must not raise
            good = {r["url"] for r in out if r["parse_error"] is None
                    and r["url"] is not None}
            for i in range(3):
                if i != hit:
                    assert f"https://f/{i}" in good, (pos, flip, i, out)

        check()

    def test_mixed_framing_single_flip_bounded_loss(self):
        """Property (hypothesis): in a MIXED plain+gzip blob, flipping
        any single byte never raises and every unit the flip does not
        touch still parses with its exact body — the damage-bounding
        contract across framing switches (second-pass review found two
        holes here: inflated Content-Length and truncated headers both
        used to swallow following members)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        units = [("https://m/p1", b"plain-one " * 4, False),
                 ("https://m/g1", b"gzip-one " * 5, True),
                 ("https://m/p2", b"plain-two " * 6, False),
                 ("https://m/g2", b"gzip-two " * 3, True)]
        recs = [_rec(u, body, gzip_member=gz) for u, body, gz in units]
        lens = [len(r) for r in recs]
        blob = bytearray(b"".join(recs))
        bodies = {u: body for u, body, _ in units}

        @given(st.integers(min_value=0, max_value=len(blob) - 1),
               st.integers(min_value=1, max_value=255))
        @settings(max_examples=200, deadline=None)
        def check(pos, flip):
            damaged = bytearray(blob)
            damaged[pos] ^= flip
            hit, off = 0, pos
            while off >= lens[hit]:
                off -= lens[hit]
                hit += 1
            out = list(iter_warc_records(bytes(damaged)))  # never raises
            # compare (url, body) PAIRS, not a dict keyed by url: a
            # flip inside the HIT unit's own URL can alias it onto a
            # neighbor's url (fuzz-found: '2'^3 = '1'), and that
            # correctly-parsed mutant must not shadow the neighbor
            good = {(r["url"], r["body"]) for r in out
                    if r["parse_error"] is None and r["url"] is not None}
            for i, (u, body, _gz) in enumerate(units):
                if i != hit:
                    assert (u, body) in good, (pos, flip, u, out)

        check()

    def test_range_splits_reproduce_whole_parse(self):
        """Property (hypothesis): for ANY partition of a .warc.gz into
        byte-range splits, concatenating iter_warc_records_range over
        the splits yields exactly the whole-file VALID records, each
        once, in order — the Hadoop-split ownership contract the
        beyond-memory seam rests on. (A split whose start lands inside
        a member may emit a spurious dead-letter while resyncing if
        the compressed bytes contain a stray magic; valid records are
        the contract.)"""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from crawler_spark.sources.warc import iter_warc_records_range

        recs = [
            _rec(f"https://r/{i}", (f"payload {i} " * (i + 1)).encode(),
                 gzip_member=True)
            for i in range(10)
        ]
        blob = b"".join(recs)
        whole = [(r["url"], r["body"])
                 for r in iter_warc_records(blob)
                 if r["parse_error"] is None]

        @given(st.lists(st.integers(min_value=1, max_value=len(blob) - 1),
                        min_size=0, max_size=5))
        @settings(max_examples=100, deadline=None)
        def check(cuts):
            bounds = sorted({0, len(blob), *cuts})
            got, dead = [], []
            for a, b in zip(bounds, bounds[1:]):
                for r in iter_warc_records_range(blob, a, b):
                    if r["parse_error"] is None:
                        got.append((r["url"], r["body"]))
                    else:
                        dead.append(r)
            assert got == whole, (bounds, [u for u, _ in got])
            # confirmed-boundary rule: a HEALTHY file emits zero dead
            # rows no matter where splits land (a stray magic in a
            # resync prefix is skipped silently, not flagged)
            assert dead == [], (bounds, dead)

        check()

    @staticmethod
    def _assert_range_union_equals_whole(blob, max_examples=100):
        """Shared property body: any partition of ``blob`` into
        byte-range splits reproduces the whole-file VALID records,
        each once, in order, with zero dead rows on healthy input."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from crawler_spark.sources.warc import iter_warc_records_range

        whole = [(r["url"], r["body"])
                 for r in iter_warc_records(blob)
                 if r["parse_error"] is None]
        assert whole  # fixture sanity

        @given(st.lists(st.integers(min_value=1, max_value=len(blob) - 1),
                        min_size=0, max_size=5))
        @settings(max_examples=max_examples, deadline=None)
        def check(cuts):
            bounds = sorted({0, len(blob), *cuts})
            got, dead = [], []
            for a, b in zip(bounds, bounds[1:]):
                for r in iter_warc_records_range(blob, a, b):
                    if r["parse_error"] is None:
                        got.append((r["url"], r["body"]))
                    else:
                        dead.append(r)
            assert got == whole, (bounds, [u for u, _ in got])
            assert dead == [], (bounds, dead)

        check()

    def test_plain_range_splits_reproduce_whole_parse(self):
        """Property: plain (uncompressed) records range-split via
        frame validation — a split landing mid-record scans forward,
        rejects stray ``WARC/`` bytes inside payloads (the decoy
        record below plants several) and owns exactly the framed
        anchors in its range."""
        recs = [
            _rec(f"https://p/{i}", (f"plain payload {i} " * (i + 1)).encode())
            for i in range(10)
        ]
        # decoy: payload full of WARC/-ish text that must NOT
        # frame-validate from any scan position
        recs.insert(3, _rec("https://p/decoy",
                            b"look: WARC/1.0\r\nnot a real header " * 3))
        self._assert_range_union_equals_whole(b"".join(recs))

    def test_nonstandard_version_token_range_splits(self):
        """Review-found: a digits-only version gate silently dropped
        frame-valid records with nonstandard version tokens
        ('WARC/1.0-x') from EVERY plain split — the whole-file parse
        accepts them, so the range union must too (the gate is a DoS
        bound on probe cost, never a validator)."""
        recs = [_rec(f"https://v/{i}", (f"versioned {i} " * 4).encode())
                for i in range(6)]
        blob = b"".join(recs).replace(b"WARC/1.0\r\n", b"WARC/1.0-x\r\n")
        assert b"WARC/1.0-x" in blob
        self._assert_range_union_equals_whole(blob)

    def test_mixed_framing_range_splits_reproduce_whole_parse(self):
        """Property: a blob interleaving plain records and gzip
        members (legal — framing re-sniffs between records) still
        satisfies the split-union contract."""
        blob = b"".join(
            _rec(f"https://m/{i}", (f"mixed body {i} " * (i + 2)).encode(),
                 gzip_member=(i % 2 == 0))
            for i in range(8)
        )
        self._assert_range_union_equals_whole(blob)

    def test_padded_members_range_splits_reproduce_whole_parse(self):
        """Review-found: legal separator padding (CRLF, NULs) between
        gzip members made the range walk probe the padding as a plain
        record — emitting a FALSE dead row and overshooting the next
        member's magic (silent loss of a healthy record). The walk
        must now scan across padding, keeping the chain."""
        members = [_rec(f"https://pad/{i}", (f"padded {i} " * 6).encode(),
                        gzip_member=True) for i in range(6)]
        blob = b"\r\n".join(bytes(m) for m in members)
        self._assert_range_union_equals_whole(blob)
        # plain records with extra padding between them, too
        plain = (b"\x00\x00".join(
            bytes(_rec(f"https://padp/{i}", b"plain body %d" % i))
            for i in range(5)))
        self._assert_range_union_equals_whole(plain)

    def test_plain_embedded_record_ambiguity_and_exact_mode(
            self, spark, tmp_path):
        """A plain payload EMBEDDING a complete frame-valid WARC
        record (an archived .warc served as a response body) is the
        documented ambiguity of plain framing: under range splits real
        records are never LOST (asserted), though a split landing
        inside the payload may emit the embedded record as a phantom.
        plain_exact=True restores byte-exact parses by whole-filing
        non-gzip files."""
        from crawler_spark.sources.warc import (
            iter_warc_records,
            iter_warc_records_range,
            read_warc_files_ranged,
        )

        inner = _rec("https://phantom/inner", b"embedded archive body")
        blob = (_rec("https://outer/1", b"before " * 5)
                + _rec("https://outer/carrier", inner)  # .warc as payload
                + _rec("https://outer/2", b"after " * 5))
        whole = {(r["url"], r["body"]) for r in iter_warc_records(blob)
                 if r["parse_error"] is None}
        phantom = ("https://phantom/inner", b"embedded archive body")
        assert phantom not in whole  # whole-file parse never scans payloads
        # SUPERSET-ONLY contract, pinned both directions on EVERY cut:
        # no real record is lost, and the only possible extra row is
        # the embedded record itself — any other fabrication fails
        phantom_seen = False
        for cut in range(1, len(blob)):
            got: list[tuple] = []
            for part in (iter_warc_records_range(blob, 0, cut),
                         iter_warc_records_range(blob, cut, len(blob))):
                for r in part:
                    if r["parse_error"] is None:
                        got.append((r["url"], r["body"]))
            assert set(got) >= whole, cut                 # never lost
            assert set(got) <= whole | {phantom}, cut     # phantom-only
            # within the superset, nothing is emitted twice
            assert len(got) == len(set(got)), cut
            phantom_seen = phantom_seen or phantom in got
        assert phantom_seen  # the ambiguity is real, not vacuous

        (tmp_path / "seg.warc").write_bytes(blob)
        exact = read_warc_files_ranged(
            spark, str(tmp_path), split_bytes=128,
            plain_exact=True).collect()
        assert {(r.url, bytes(r.body)) for r in exact
                if r.parse_error is None} == whole

    def test_range_splits_damage_fuzz(self):
        """Property (hypothesis): flip ANY byte of a mixed plain+gzip
        blob AND partition it at random cut points — the range-walk
        union must never raise, every unit the flip does not touch
        must surface with its exact body EXACTLY ONCE (no split loses
        it, no two splits both own it), and at most the damaged unit
        is lost. This is the whole-file damage-bounding fuzz lifted to
        the split walk: split ownership (scan + frame validation /
        decompressor confirmation) has to keep holding when the bytes
        it resynchronizes over are hostile."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from crawler_spark.sources.warc import iter_warc_records_range

        units = [("https://rd/p1", b"plain-one " * 4, False),
                 ("https://rd/g1", b"gzip-one " * 5, True),
                 ("https://rd/p2", b"plain-two " * 6, False),
                 ("https://rd/g2", b"gzip-two " * 3, True)]
        recs = [_rec(u, body, gzip_member=gz) for u, body, gz in units]
        lens = [len(r) for r in recs]
        blob = bytearray(b"".join(recs))
        n = len(blob)

        @given(st.integers(min_value=0, max_value=n - 1),
               st.integers(min_value=1, max_value=255),
               st.lists(st.integers(min_value=1, max_value=n - 1),
                        min_size=0, max_size=3))
        @settings(max_examples=150, deadline=None)
        def check(pos, flip, cuts):
            damaged = bytearray(blob)
            damaged[pos] ^= flip
            hit, off = 0, pos
            while off >= lens[hit]:
                off -= lens[hit]
                hit += 1
            bounds = sorted({0, n, *cuts})
            got: list[tuple] = []
            for a, b in zip(bounds, bounds[1:]):
                for r in iter_warc_records_range(bytes(damaged), a, b):
                    if r["parse_error"] is None and r["url"] is not None:
                        got.append((r["url"], r["body"]))
            for i, (u, body, _gz) in enumerate(units):
                if i != hit:
                    assert got.count((u, body)) == 1, \
                        (pos, flip, bounds, u, got)

        check()

    def test_gzip_member_feed_is_bounded(self, monkeypatch):
        """The member decompressor must never be fed more than _ZWIN
        input bytes at a time: a whole-tail feed materializes an
        O(file-tail) unused_data copy PER MEMBER — the OOM trap on
        the beyond-memory path. Pin it by shrinking the window and
        spying every decompress() call."""
        import zlib as _zlib

        import crawler_spark.sources.warc as W

        fed: list[int] = []
        real = _zlib.decompressobj

        class Spy:
            def __init__(self, inner):
                self._d = inner

            def decompress(self, buf, *a):
                fed.append(len(buf))
                return self._d.decompress(buf, *a)

            def __getattr__(self, k):
                return getattr(self._d, k)

        monkeypatch.setattr(W.zlib, "decompressobj",
                            lambda *a, **k: Spy(real(*a, **k)))
        monkeypatch.setattr(W, "_ZWIN", 64)
        blob = b"".join(_rec(f"https://w/{i}", b"x" * 300, gzip_member=True)
                        for i in range(6))
        out = list(W.iter_warc_records(blob))
        assert [r["url"] for r in out] == [f"https://w/{i}" for i in range(6)]
        assert all(r["parse_error"] is None for r in out)
        assert fed and max(fed) <= 64, max(fed)

    def test_oversized_header_dead_letters_bounded(self):
        """_MAX_HDR pin: a header block beyond 64 KiB dead-letters as
        truncated (possibly several rows as the scan rediscovers
        WARC/ inside it) instead of an unbounded O(blob) search, and
        intact records after it still parse."""
        import crawler_spark.sources.warc as W

        huge = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                + b"X-Pad: " + b"a" * (W._MAX_HDR + 1024) + b"\r\n\r\n")
        out = list(iter_warc_records(huge + _rec("https://ok/1", b"fine")))
        deads = [r for r in out if r["parse_error"] is not None]
        goods = [r for r in out if r["parse_error"] is None]
        assert deads and all(
            "truncated WARC header" in r["parse_error"] for r in deads)
        assert [r["url"] for r in goods] == ["https://ok/1"]

    def test_ranged_reader_plain_file_and_file_path(self, spark, tmp_path):
        """Review-found: the lister admitted plain .warc files the
        range walk can't parse (silent loss) and returned an empty
        frame for single-file or missing paths. Plain files now parse
        whole-file; a file path works; a missing path raises."""
        import pytest as _pytest

        from crawler_spark.sources.warc import read_warc_files_ranged

        plain = _rec("https://pl/1", b"plain body one") + _rec(
            "https://pl/2", b"plain body two")
        gz = b"".join(_rec(f"https://gz/{i}", b"zzz " * 10,
                           gzip_member=True) for i in range(4))
        (tmp_path / "plain.warc").write_bytes(plain)
        (tmp_path / "comp.warc.gz").write_bytes(gz)

        rows = read_warc_files_ranged(spark, str(tmp_path),
                                      split_bytes=150).collect()
        urls = sorted(r.url for r in rows if r.parse_error is None)
        assert urls == sorted(
            ["https://pl/1", "https://pl/2"]
            + [f"https://gz/{i}" for i in range(4)])

        # single-file path
        one = read_warc_files_ranged(
            spark, str(tmp_path / "plain.warc")).collect()
        assert sorted(r.url for r in one) == ["https://pl/1",
                                              "https://pl/2"]
        with _pytest.raises(FileNotFoundError):
            read_warc_files_ranged(spark, str(tmp_path / "nope"))

    def test_read_warc_files(self, spark, tmp_path):
        p = tmp_path / "seg-00000.warc.gz"
        p.write_bytes(_rec(gzip_member=True)
                      + _rec("https://a.example.com/2", b"x", gzip_member=True))
        # suffix over-match guard: a .warcx file must be ignored by
        # both readers (review-found on the ranged lister)
        (tmp_path / "decoy.warcx").write_bytes(_rec("https://bad/1", b"no"))
        from crawler_spark.sources.warc import (
            read_warc_files,
            read_warc_files_ranged,
        )

        rows = read_warc_files(spark, str(tmp_path)).collect()
        assert sorted(r.url for r in rows) == [
            "https://a.example.com/1", "https://a.example.com/2"]
        assert all(r.parse_error is None for r in rows)
        ranged = read_warc_files_ranged(spark, str(tmp_path)).collect()
        assert sorted(r.url for r in ranged) == [
            "https://a.example.com/1", "https://a.example.com/2"]

    def test_write_warc_files_sink(self, spark, tmp_path):
        """The distributed sink: one segment per partition (empty
        partitions → empty files the ranged lister skips), per-record
        members, read-back equals input; plain mode exercises the
        uncompressed arm."""
        from crawler_spark.sources.warc import (
            read_warc_files_ranged, write_warc_files,
        )

        rows = [(f"https://s/{i}", f"body {i}".encode()) for i in range(10)]
        df = spark.createDataFrame(rows, "url string, body binary") \
            .repartition(16)  # > row count: some partitions are empty
        out = tmp_path / "gz"
        out.mkdir()
        manifest = write_warc_files(df, str(out)).collect()
        assert sum(m.n_records for m in manifest) == 10
        assert len(manifest) == 16
        back = read_warc_files_ranged(spark, str(out)).collect()
        assert sorted((r.url, bytes(r.body)) for r in back) == sorted(rows)
        assert all(r.parse_error is None for r in back)

        out2 = tmp_path / "plain"
        out2.mkdir()
        write_warc_files(df.coalesce(2), str(out2),
                         gzip_members=False).collect()
        names = sorted(p.name for p in out2.iterdir())
        assert all(n.endswith(".warc") for n in names)
        back2 = read_warc_files_ranged(spark, str(out2)).collect()
        assert sorted((r.url, bytes(r.body)) for r in back2) == sorted(rows)

    def test_write_warc_files_skips_null_rows(self, spark, tmp_path):
        """Review-found: int(None) on a NULL status used to kill the
        task. Rows missing url, body, or (when a status column is
        wired) status are SKIPPED and counted — never fabricated,
        never a task failure; a NULL content_type falls back to the
        default header instead of serializing 'None'."""
        from crawler_spark.sources.warc import (
            read_warc_files_ranged, write_warc_files,
        )

        rows = [
            ("https://n/ok", b"good", 200, "text/x-ok"),
            (None, b"no url", 200, "text/x-ok"),          # skip: url
            ("https://n/nobody", None, 200, "text/x-ok"),  # skip: body
            ("https://n/nostatus", b"x", None, "text/x-ok"),  # skip: status
            ("https://n/noct", b"ct dflt", 404, None),     # kept, default ct
        ]
        df = spark.createDataFrame(
            rows, "url string, body binary, status int, ct string"
        ).coalesce(1)
        out = tmp_path / "nulls"
        out.mkdir()
        (m,) = write_warc_files(
            df, str(out), status_col="status", content_type_col="ct"
        ).collect()
        assert (m.n_records, m.n_skipped) == (2, 3)
        back = {r.url: r for r in
                read_warc_files_ranged(spark, str(out)).collect()}
        assert set(back) == {"https://n/ok", "https://n/noct"}
        assert back["https://n/ok"].http_status == 200
        assert back["https://n/ok"].content_type == "text/x-ok"
        assert back["https://n/noct"].http_status == 404
        assert back["https://n/noct"].content_type.startswith("text/plain")

    def test_write_warc_files_unicode_rows(self, spark, tmp_path):
        """Real crawl data carries IRIs and odd header values; the
        sink's documented discipline is write-or-skip, NEVER a task
        failure (review-found: head.encode('ascii') killed the task
        on the first non-ASCII url). Pins: an IRI serializes as its
        percent-encoded URI form; a latin-1 content_type round-trips;
        a beyond-latin-1 or CR/LF-injecting content_type skips and
        counts."""
        from urllib.parse import quote

        from crawler_spark.sources.warc import (
            read_warc_files_ranged, write_warc_files,
        )

        iri = "https://bücher.example/weg?q=naïve"
        rows = [
            (iri, b"iri body", 200, "text/html"),
            ("https://u/latin1", b"l1", 200, "text/x-é"),   # é: latin-1
            ("https://u/cjk-ct", b"bad ct", 200, "text/x-中"),  # skip
            ("https://u/crlf", b"inj", 200, "text/x\r\nX-Evil: 1"),  # skip
        ]
        df = spark.createDataFrame(
            rows, "url string, body binary, status int, ct string"
        ).coalesce(1)
        out = tmp_path / "uni"
        out.mkdir()
        (m,) = write_warc_files(
            df, str(out), status_col="status", content_type_col="ct"
        ).collect()
        assert (m.n_records, m.n_skipped) == (2, 2)
        back = {r.url: r for r in
                read_warc_files_ranged(spark, str(out)).collect()
                if r.parse_error is None}
        safe = "".join(chr(c) for c in range(0x21, 0x7F))
        assert set(back) == {quote(iri, safe=safe), "https://u/latin1"}
        assert back[quote(iri, safe=safe)].body == b"iri body"
        assert back["https://u/latin1"].content_type == "text/x-é"

    def test_parse_accepts_bytearray_no_copy(self):
        """The Spark parse path hands iter_warc_records whatever
        buffer Arrow produced (bytes OR bytearray) without a bytes()
        copy — 2× file size per task on the whole-file path
        (review-found). Pin that a bytearray parses identically to
        bytes, gzip and plain framing both."""
        blob = (_rec("https://ba/1", b"plain " * 9)
                + _rec("https://ba/2", b"zipped " * 9, gzip_member=True))
        as_bytes = [(r["url"], r["body"], r["parse_error"])
                    for r in iter_warc_records(blob)]
        as_ba = [(r["url"], bytes(r["body"]), r["parse_error"])
                 for r in iter_warc_records(bytearray(blob))]
        assert as_ba == as_bytes
        assert [u for u, _, _ in as_ba] == ["https://ba/1", "https://ba/2"]

    def test_ranged_split_start_on_stray_gzip_magic_is_silent(self):
        """ADVICE-found: the range walk used to CONFIRM any split
        start that carried a gzip magic — a boundary landing exactly
        on a stray \\x1f\\x8b inside a plain record's payload (a
        crawled .gz download) then emitted a false 'corrupt gzip
        member' dead row, the exact monitoring noise the
        confirmed-boundary rule exists to prevent. The start is now
        scanned: the stray fails decompression SILENTLY, and every
        real record still surfaces exactly once."""
        from crawler_spark.sources.warc import iter_warc_records_range

        stray_payload = b"A" * 40 + b"\x1f\x8b" + b"not gzip" * 5
        blob = (_rec("https://sg/1", stray_payload)
                + _rec("https://sg/2", b"clean body " * 3))
        stray_at = blob.find(b"\x1f\x8b")
        assert 0 < stray_at < len(blob)
        whole = [(r["url"], r["body"]) for r in iter_warc_records(blob)
                 if r["parse_error"] is None]
        # cut exactly on the stray magic: the second split starts ON it
        parts = [r for seg in (iter_warc_records_range(blob, 0, stray_at),
                               iter_warc_records_range(
                                   blob, stray_at, len(blob)))
                 for r in seg]
        assert [r for r in parts if r["parse_error"] is not None] == [], \
            "stray magic at a split start emitted a false dead-letter"
        assert [(r["url"], r["body"]) for r in parts
                if r["parse_error"] is None] == whole

    def test_ranged_offset_zero_reports_corrupt_first_member(self):
        """Review-found regression of the stray-magic fix: treating
        EVERY split start as scanned also swallowed the corruption
        signal for a corrupt FIRST member — offset 0 cannot be inside
        a preceding payload, so the [0, ...) split must stay
        dead-letter-faithful to the whole-file walk."""
        from crawler_spark.sources.warc import iter_warc_records_range

        good = _rec("https://z0/ok", b"healthy " * 4, gzip_member=True)
        bad = bytearray(
            _rec("https://z0/bad", b"damaged " * 4, gzip_member=True))
        bad[12] ^= 0xFF  # corrupt the stream body, keep the magic
        bad2 = bytearray(
            _rec("https://z0/bad2", b"ruined " * 5, gzip_member=True))
        bad2[12] ^= 0xFF
        # TWO consecutive corrupt members: a failure in a confirmed
        # region must KEEP confirmation across the resync, or the
        # second member's dead row is swallowed (review-found)
        blob = bytes(bad) + bytes(bad2) + good
        whole_dead = [r["parse_error"] for r in iter_warc_records(blob)
                      if r["parse_error"] is not None]
        assert sum("corrupt gzip member" in e for e in whole_dead) >= 2
        ranged = list(iter_warc_records_range(blob, 0, len(blob)))
        ranged_dead = [r["parse_error"] for r in ranged
                       if r["parse_error"] is not None]
        assert ranged_dead == whole_dead, (
            "offset-0 split lost corrupt-member dead-letters"
        )
        assert [r["url"] for r in ranged if r["parse_error"] is None] == \
            ["https://z0/ok"]

    def test_read_warc_files_ranged_equals_whole(self, spark, tmp_path):
        """The Spark ranged reader (mmap + byte-range splits) must
        yield exactly the whole-file reader's records, with several
        splits per file actually exercised."""
        from crawler_spark.sources.warc import (
            read_warc_files,
            read_warc_files_ranged,
        )

        recs = b"".join(
            _rec(f"https://r/{i}", (f"text {i} " * 20).encode(),
                 gzip_member=True)
            for i in range(12)
        )
        (tmp_path / "a.warc.gz").write_bytes(recs)
        (tmp_path / "b.warc.gz").write_bytes(recs[: len(recs) // 2])

        whole = sorted(
            (r.url, bytes(r.body)) for r in
            read_warc_files(spark, str(tmp_path)).collect()
            if r.parse_error is None)
        # 200-byte splits → many ranges per file, most starting
        # mid-member
        ranged = sorted(
            (r.url, bytes(r.body)) for r in
            read_warc_files_ranged(spark, str(tmp_path),
                                   split_bytes=200).collect()
            if r.parse_error is None)
        assert ranged == whole and len(whole) >= 12


from crawler_spark.sources.sitemap import (  # noqa: E402
    build_sitemap_xml,
    parse_sitemap,
)


class TestSitemap:
    def test_roundtrip(self):
        xml = build_sitemap_xml(
            [("https://s/a", "2026-01-02"), ("https://s/b", None)])
        rows = parse_sitemap(xml)
        assert rows == [
            {"url": "https://s/a", "lastmod": "2026-01-02",
             "parse_error": None},
            {"url": "https://s/b", "lastmod": None, "parse_error": None},
        ]

    def test_roundtrip_with_query_string_url(self):
        # '&' in a loc must be XML-escaped on serialize (ADVICE r5:
        # unescaped it corrupted the blob and lost EVERY entry in it)
        url = "https://s/a?x=1&y=2"
        rows = parse_sitemap(build_sitemap_xml([(url, "2026<01&02")]))
        assert rows == [{"url": url, "lastmod": "2026<01&02",
                         "parse_error": None}]

    def test_no_namespace_and_whitespace(self):
        xml = ("<urlset><url><loc>\n  https://s/a \n</loc>"
               "<lastmod>2026-02-03</lastmod></url></urlset>")
        (r,) = parse_sitemap(xml)
        assert r["url"] == "https://s/a" and r["lastmod"] == "2026-02-03"

    def test_sitemapindex_entries(self):
        xml = (f'<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
               f'sitemap/0.9"><sitemap><loc>https://s/map1.xml</loc>'
               f"</sitemap></sitemapindex>")
        (r,) = parse_sitemap(xml)
        assert r["url"] == "https://s/map1.xml" and r["parse_error"] is None

    def test_missing_loc_is_error_row(self):
        xml = "<urlset><url><lastmod>2026-01-01</lastmod></url></urlset>"
        (r,) = parse_sitemap(xml)
        assert r["url"] is None and "loc" in r["parse_error"]

    def test_malformed_xml_single_dead_letter(self):
        rows = parse_sitemap("<urlset><url><loc>https://s/a")
        assert len(rows) == 1 and rows[0]["parse_error"] is not None

    def test_frontier_anti_join_and_dedup(self, spark):
        from crawler_spark.sources.sitemap import frontier_from_sitemaps

        xml1 = build_sitemap_xml([("https://s/a", "2026-01-01"),
                                  ("https://s/b", "2026-01-02")])
        xml2 = build_sitemap_xml([("https://s/b", "2026-01-02"),
                                  ("https://s/c", None)])
        blobs = spark.createDataFrame([(xml1,), (xml2,)], "xml string")
        crawled = spark.createDataFrame([("https://s/a",)], "url string")
        out = {r.url for r in frontier_from_sitemaps(blobs, crawled).collect()}
        assert out == {"https://s/b", "https://s/c"}

    def test_roundtrip_property_any_text(self):
        """Property (hypothesis): serialize→parse is identity for ANY
        printable loc/lastmod content (XML metacharacters included) —
        the escaping fix generalized, not just the '&' case."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        text = st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            min_size=1, max_size=40,
        ).map(str.strip).filter(bool)

        @given(text, text)
        @settings(max_examples=200, deadline=None)
        def check(loc, lastmod):
            rows = parse_sitemap(build_sitemap_xml([(loc, lastmod)]))
            assert rows == [{"url": loc, "lastmod": lastmod,
                             "parse_error": None}], (loc, lastmod)

        check()

    def test_discover_sitemaps_from_robots(self):
        from crawler_spark.sources.fetch import StubFetcher
        from crawler_spark.sources.sitemap import discover_sitemaps

        robots = (b"User-agent: *\nDisallow: /private\n"
                  b"sitemap: https://s/map1.xml\n"   # lower-case key
                  b"Sitemap:https://s/map2.xml\n"    # no space
                  b"Sitemap: https://s/map3.xml # updated weekly\n"
                  b"Sitemap: https://s/map1.xml\n")  # duplicate
        f = StubFetcher({"https://s/robots.txt": ("text/plain", robots)})
        # comments stripped (review-found: hand-rolled parse kept them)
        assert discover_sitemaps(f, ["https://s", "https://missing.example"]) \
            == ["https://s/map1.xml", "https://s/map2.xml",
                "https://s/map3.xml"]

    def test_discover_sitemaps_distributed(self, spark):
        from crawler_spark.sources.fetch import StubFetcher
        from crawler_spark.sources.sitemap import (
            discover_sitemaps_distributed,
        )

        f = StubFetcher({
            "https://a/robots.txt": (
                "text/plain", b"Sitemap: https://a/m1.xml\n"
                              b"Sitemap: https://a/m2.xml\n"),
            "https://b/robots.txt": ("text/plain", b"User-agent: *\n"),
        })
        origins = spark.createDataFrame(
            [("https://a",), ("https://b",), ("https://missing",),
             ("https://a",)],  # duplicate origin collapses
            "origin string")
        rows = sorted(
            (r.origin, r.sitemap_url)
            for r in discover_sitemaps_distributed(spark, f, origins)
            .collect())
        assert rows == [("https://a", "https://a/m1.xml"),
                        ("https://a", "https://a/m2.xml")]

    def test_fetch_sitemap_blobs_follows_index(self):
        from crawler_spark.sources.fetch import StubFetcher
        from crawler_spark.sources.sitemap import fetch_sitemap_blobs

        leaf = build_sitemap_xml([("https://s/a", None)])
        index = ('<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
                 'sitemap/0.9"><sitemap><loc>https://s/leaf.xml</loc>'
                 "</sitemap><sitemap><loc>https://s/gone.xml</loc>"
                 "</sitemap></sitemapindex>")
        f = StubFetcher({
            "https://s/index.xml": ("application/xml", index.encode()),
            "https://s/leaf.xml": ("application/xml", leaf.encode()),
        })
        # the index resolves to its leaf; the 404 entry skips
        assert fetch_sitemap_blobs(f, ["https://s/index.xml"]) == [leaf]
        # an index AT the depth cap is dropped, never returned as a
        # leaf (review-found: flattened, its entries would leak into
        # the frontier as crawlable page URLs)
        assert fetch_sitemap_blobs(
            f, ["https://s/index.xml"], max_index_depth=0) == []

    def test_fetch_sitemap_blobs_two_level_index(self):
        from crawler_spark.sources.fetch import StubFetcher
        from crawler_spark.sources.sitemap import fetch_sitemap_blobs

        leaf = build_sitemap_xml([("https://s/a", None)])
        inner = ('<sitemapindex><sitemap><loc>https://s/leaf.xml</loc>'
                 "</sitemap></sitemapindex>")
        outer = ('<sitemapindex><sitemap><loc>https://s/inner.xml</loc>'
                 "</sitemap></sitemapindex>")
        f = StubFetcher({
            "https://s/outer.xml": ("application/xml", outer.encode()),
            "https://s/inner.xml": ("application/xml", inner.encode()),
            "https://s/leaf.xml": ("application/xml", leaf.encode()),
        })
        # depth 2 reaches the leaf through both index levels
        assert fetch_sitemap_blobs(
            f, ["https://s/outer.xml"], max_index_depth=2) == [leaf]
        # default depth 1 stops at the inner index and DROPS it — no
        # sitemap URLs masquerading as page URLs
        assert fetch_sitemap_blobs(f, ["https://s/outer.xml"]) == []

    def test_frontier_cross_sitemap_lastmod_deterministic(self, spark):
        # same URL in two sitemaps with DIFFERENT lastmods must collapse
        # to max(lastmod), not an arbitrary partition-dependent survivor
        from crawler_spark.sources.sitemap import frontier_from_sitemaps

        xml1 = build_sitemap_xml([("https://s/b", "2026-01-02")])
        xml2 = build_sitemap_xml([("https://s/b", "2026-03-09")])
        blobs = spark.createDataFrame([(xml1,), (xml2,)], "xml string") \
                     .repartition(4)
        crawled = spark.createDataFrame([], "url string")
        (r,) = frontier_from_sitemaps(blobs, crawled).collect()
        assert (r.url, r.lastmod) == ("https://s/b", "2026-03-09")


class TestCorpusPipelineE2E:
    """Value-level lockstep for the registered ``pipeline_corpus_e2e``
    composition (sitemap → crawl → text dispatch → boilerplate strip →
    judge gate → dedup → MERGE): the rows-only driver check proves it
    runs; this pins the exact rows."""

    def test_exact_rows_and_stage_semantics(self, spark):
        from crawler_spark.plans import registry
        from crawler_spark.plans.queries_sources import (
            _corpus_prose,
            pipeline_corpus_e2e,
        )

        registry.load_all()
        prose = _corpus_prose()
        rows = [(r.url, r.main_content, r.score)
                for r in pipeline_corpus_e2e(spark, "unused").collect()]
        assert rows == [
            # dup collapsed to the lexicographically-first url
            ("https://corpus.test/a/art1", prose["art1"], 54),
            ("https://corpus.test/a/art2", prose["art2"], 92),
            # reachable only through the sitemap seed
            ("https://corpus.test/orphan", prose["orphan"], 59),
        ]
        # the judge-rejected article and the already-crawled sitemap
        # entry never land
        urls = {u for u, _, _ in rows}
        assert "https://corpus.test/a/low" not in urls
        assert "https://corpus.test/already" not in urls
        # idempotent: re-running the pipeline re-merges the same keys
        again = [(r.url, r.main_content, r.score)
                 for r in pipeline_corpus_e2e(spark, "unused").collect()]
        assert again == rows


class TestTextContentType:
    def test_classify_text_plain(self):
        from crawler_spark.sources.file_handlers import classify_content_type

        assert classify_content_type("text/plain") == "text"
        assert classify_content_type("text/plain; charset=utf-8") == "text"
        assert classify_content_type("application/json") is None

    def test_parse_stage_text_tier_preserves_newlines(self, spark):
        from crawler_spark.plans.ingest import parse_stage, split_dead_letter

        fetched = spark.createDataFrame(
            [("https://t/1", "text/plain; charset=utf-8",
              b"line one\nline two\n", None),
             ("https://t/2", "text/plain", b"   ", None)],
            "url string, content_type string, body binary, "
            "fetch_error string",
        )
        ok, dead = split_dead_letter(parse_stage(fetched))
        (r,) = ok.collect()
        assert r.url == "https://t/1"
        assert r.content == "line one\nline two"  # newlines intact
        assert r.file_type == "text"
        (d,) = dead.collect()
        assert d.url == "https://t/2" and "empty" in d.error


class TestJudgeClient:
    def test_stub_deterministic_and_bounded(self):
        from crawler_spark.functions.judge import KEEP_THRESHOLD, StubJudge

        j = StubJudge()
        a, b = j.judge("some doc"), j.judge("some doc")
        assert a == b
        parsed = json.loads(a)
        assert 0 <= parsed["score"] <= 100
        expect = "keep" if parsed["score"] >= KEEP_THRESHOLD else "drop"
        assert parsed["verdict"] == expect
        assert j.judge(None) == "{}"

    def test_ollama_judge_happy_path_via_transport(self):
        from crawler_spark.functions.judge import OllamaJudge, judge_prompt

        calls = []

        def transport(url, payload):
            calls.append((url, payload))
            return {"message": {"content":
                                '{"score": 88, "verdict": "keep"}'}}

        j = OllamaJudge(transport=transport)
        assert json.loads(j.judge("doc text")) == {
            "score": 88, "verdict": "keep"}
        url, payload = calls[0]
        assert url.endswith("/api/chat") and payload["format"] == "json"
        assert payload["messages"][0]["content"] == judge_prompt("doc text")

    @pytest.mark.parametrize("reply", [
        {"message": {"content": "not json"}},
        {"message": {"content": "[1, 2]"}},  # JSON but not a dict
        {},                                   # missing keys
    ])
    def test_ollama_judge_degrades_to_empty(self, reply):
        from crawler_spark.functions.judge import OllamaJudge

        j = OllamaJudge(transport=lambda u, p: reply)
        assert j.judge("x") == "{}"

    def test_ollama_judge_transport_exception_degrades(self):
        from crawler_spark.functions.judge import OllamaJudge

        def boom(u, p):
            raise OSError("connection refused")

        assert OllamaJudge(transport=boom).judge("x") == "{}"


class TestStripBoilerplate:
    def _run(self, spark, page):
        from pyspark.sql import functions as F

        from crawler_spark.functions.text import strip_boilerplate

        df = spark.createDataFrame([(page,)], "page string")
        return df.select(strip_boilerplate(F.col("page")).alias("m")) \
                 .first()["m"]

    def test_each_rule_fires_independently(self, spark):
        prose = ("the quick brown fox jumps over the lazy dog near the "
                 "riverbank at dawn")
        page = "\n".join([
            "HOME | ABOUT | CONTACT | PRODUCTS | BLOG",   # pipes
            "SUBSCRIBE TO OUR NEWSLETTER TODAY AND SAVE BIG",  # caps ratio
            prose,
            "Accept cookies?",                            # too short
            "© 2026 example Media Group — all rights reserved.",  # © mark
            "(c) 2026 example media group all rights reserved here",  # (c)
        ])
        assert self._run(spark, page) == prose

    def test_multiline_prose_preserved_in_order(self, spark):
        l1 = "first paragraph of the article with plenty of words here"
        l2 = "second paragraph of the article with plenty of words too"
        assert self._run(spark, f"NAV | NAV\n{l1}\n{l2}") == f"{l1}\n{l2}"

    def test_all_chrome_yields_empty(self, spark):
        assert self._run(spark, "HOME | ABOUT\nAccept cookies?") == ""

    def test_null_propagates(self, spark):
        assert self._run(spark, None) is None


class TestStreamingWarcIngest:
    def test_resume_is_idempotent(self, spark):
        """Running the streaming ingest twice in one process resumes
        the SAME checkpoint: no new segments -> no batches, and the
        idempotent merge leaves the landed table byte-identical —
        the exactly-once contract, observed end-to-end."""
        from crawler_spark.plans import registry

        registry.load_all()
        q = registry.QUERIES["streaming_warc_ingest_e2e"]
        sf = "/root/testdata/sf0.001"
        first = sorted((r.url, r.text, r.n_bytes)
                       for r in q(spark, sf).collect())
        second = sorted((r.url, r.text, r.n_bytes)
                        for r in q(spark, sf).collect())
        assert first == second and len(first) > 0
        assert len({u for u, _, _ in first}) == len(first)  # unique keys
