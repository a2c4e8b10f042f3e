"""WARC source (sources/warc.py): writer→reader round trips for plain
and gzip-member streams, HTTP parse with chunked transfer decoding, and
the quarantine contract — torn or fuzzed framing never raises (a corrupt
record in a 100 TB crawl segment must drop, not kill the job)."""

from __future__ import annotations

import gzip
import random

from network_iq_spark.sources.warc import (
    _dechunk,
    build_http_response,
    build_warc_record,
    encode_warc_gz,
    iter_warc,
    parse_http_response,
)


def _fixture_records():
    recs = [
        build_warc_record(
            "warcinfo",
            b"software: test\r\n",
            record_seq=0,
            content_type="application/warc-fields",
        )
    ]
    bodies = [b"<html><body>hello world</body></html>", b"x" * 450, b"not found"]
    flags = [(False, 200), (True, 200), (False, 404)]
    for i, (body, (chunked, status)) in enumerate(zip(bodies, flags)):
        http = build_http_response(body, status=status, chunked=chunked)
        recs.append(
            build_warc_record(
                "response",
                http,
                target_uri=f"https://example.org/doc/{i}",
                record_seq=i + 1,
            )
        )
    return recs, bodies


def test_round_trip_plain_and_gzip_members():
    recs, bodies = _fixture_records()
    for payload in (b"".join(recs), encode_warc_gz(recs)):
        out = list(iter_warc(payload))
        assert len(out) == 4
        assert out[0]["rec_type"] == "warcinfo"
        assert out[0]["http_status"] is None and out[0]["chunked"] is None
        for i, r in enumerate(out[1:]):
            assert r["rec_type"] == "response"
            assert r["target_uri"] == f"https://example.org/doc/{i}"
            assert r["body"] == bodies[i]
            assert r["warc_date"] == "2026-01-01T00:00:00Z"
        assert out[1]["chunked"] is False and out[2]["chunked"] is True
        assert out[3]["http_status"] == 404


def test_http_parse_and_dechunk():
    body = bytes(range(256)) * 3
    status, mime, chunked, got = parse_http_response(
        build_http_response(body, chunked=True)
    )
    assert (status, mime, chunked) == (200, "text/html", True)
    assert got == body
    # content-length path truncates to the buffer actually present
    torn = build_http_response(body)[:-100]
    assert parse_http_response(torn) is None
    # malformed chunk framing quarantines
    assert _dechunk(b"zz\r\nabc") is None
    assert _dechunk(b"5\r\nabc") is None


def test_gzip_truncation_yields_clean_prefix():
    recs, _ = _fixture_records()
    gz = encode_warc_gz(recs)
    # a cut mid-member yields only the records whose members framed whole
    counts = {len(list(iter_warc(gz[:cut]))) for cut in range(0, len(gz), 13)}
    assert counts <= {0, 1, 2, 3, 4}
    assert len(list(iter_warc(gz))) == 4
    # a multi-member stream read by plain gzip (sanity: layout is legal)
    assert gzip.decompress(gz) == b"".join(recs)


def test_fuzz_never_raises():
    recs, _ = _fixture_records()
    seeds = [b"".join(recs), encode_warc_gz(recs)]
    rnd = random.Random(7)
    for _ in range(2000):
        b = bytearray(rnd.choice(seeds))
        for _ in range(rnd.randint(1, 8)):
            op = rnd.random()
            if op < 0.5 and b:
                b[rnd.randrange(len(b))] = rnd.randrange(256)
            elif op < 0.75 and b:
                del b[rnd.randrange(len(b))]
            else:
                b.insert(rnd.randrange(len(b) + 1), rnd.randrange(256))
        for rec in iter_warc(bytes(b)):  # must not raise
            assert rec["rec_type"] is not None


def test_lost_framing_quarantines_remainder():
    recs, _ = _fixture_records()
    # valid record, then garbage, then another valid record: the reader
    # stops at the garbage instead of resyncing into a misparse
    stream = recs[0] + b"NOT A RECORD" + recs[1]
    out = list(iter_warc(stream))
    assert len(out) == 1 and out[0]["rec_type"] == "warcinfo"
