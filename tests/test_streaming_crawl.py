"""Continual crawl ingestion (streaming/crawl.py): a binaryFile stream of
.warc.gz segments, exploded and extracted statelessly, feeding the
at-rest near-dup admission sink. Proves the end-to-end composition: WARC
framing → HTTP parse (incl. chunked) → HTML→text → LSH near-dup against
the growing index — with availableNow drains resuming from a checkpoint,
exactly how a cron-triggered crawl pipeline runs."""

from __future__ import annotations

import pytest

from network_iq_spark.sources.warc import (
    build_http_response,
    build_warc_record,
    encode_warc_gz,
)


@pytest.fixture(scope="module")
def spark():
    from network_iq_spark.session import get_spark

    s = get_spark(app_name="test-streaming-crawl")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _page(text: str) -> bytes:
    # no <title>: html_to_text keeps title text, so a bare body keeps the
    # extracted string equal to the input text (easier assertions)
    return f"<html><head></head><body><p>{text}</p></body></html>".encode()


def _segment(docs: list[tuple[int, str]], extra_noise: bool = False) -> bytes:
    recs = [
        build_warc_record(
            "warcinfo",
            b"software: test\r\n",
            record_seq=0,
            content_type="application/warc-fields",
        )
    ]
    for i, text in docs:
        recs.append(
            build_warc_record(
                "response",
                build_http_response(_page(text), status=200, chunked=bool(i % 2)),
                target_uri=f"https://example.org/p/{i}",
                record_seq=i + 1,
            )
        )
    if extra_noise:
        # rows the stream must FILTER, not ingest: a 404, and a non-HTML 200
        recs.append(
            build_warc_record(
                "response",
                build_http_response(b"gone", status=404),
                target_uri="https://example.org/missing",
                record_seq=9001,
            )
        )
        recs.append(
            build_warc_record(
                "response",
                build_http_response(b"{}", status=200, mime="application/json"),
                target_uri="https://example.org/api",
                record_seq=9002,
            )
        )
    return encode_warc_gz(recs)


BASE = (
    "the quick brown fox jumps over the lazy dog again and again today "
    "while the merry little band of travellers watches from the old hill"
)
OTHER = "some other unrelated text entirely here okay with more words appended"
NEAR_DUP = BASE.replace("lazy", "sleepy")
NOVEL = (
    "completely different words about spark parquet shuffles and joins "
    "plus executors partitions codegen catalyst and adaptive planning"
)


def test_crawl_ingest_end_to_end(spark, tmp_path):
    from network_iq_spark.streaming.crawl import crawl_ingest_query

    warc_dir = tmp_path / "segments"
    warc_dir.mkdir()
    corpus = str(tmp_path / "corpus")
    args = (
        str(warc_dir),
        corpus,
        str(tmp_path / "bands"),
        str(tmp_path / "sets"),
        str(tmp_path / "ckpt"),
    )

    (warc_dir / "seg-000.warc.gz").write_bytes(_segment([(1, BASE), (2, OTHER)]))
    q = crawl_ingest_query(spark, *args, threshold=0.6)
    q.awaitTermination()

    rows = {r.url: r.text for r in spark.read.parquet(corpus).collect()}
    assert rows == {
        "https://example.org/p/1": BASE,
        "https://example.org/p/2": OTHER,
    }

    # second drain: a near-dup of doc 1 must be dropped against the
    # at-rest index; the novel doc survives; noise records never ingest
    (warc_dir / "seg-001.warc.gz").write_bytes(
        _segment([(10, NEAR_DUP), (11, NOVEL)], extra_noise=True)
    )
    q = crawl_ingest_query(spark, *args, threshold=0.6)
    q.awaitTermination()

    rows = {r.url: r.text for r in spark.read.parquet(corpus).collect()}
    assert rows == {
        "https://example.org/p/1": BASE,
        "https://example.org/p/2": OTHER,
        "https://example.org/p/11": NOVEL,
    }

    # ids are the URI hash (the pre-registry crawl identity)
    from pyspark.sql import functions as F

    expect = {
        r.url: r.h
        for r in spark.createDataFrame(
            [(u,) for u in rows], "url string"
        ).select("url", F.xxhash64("url").alias("h")).collect()
    }
    got = {r.url: r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got == expect


def test_document_stream_extraction_matches_batch_chain(spark, tmp_path):
    """The streaming extraction is the SAME html_to_text chain as batch:
    run the stream into memory and compare against the batch operator
    applied to the same pages."""
    from pyspark.sql import functions as F

    from network_iq_spark.operators.text import html_to_text
    from network_iq_spark.streaming.crawl import warc_document_stream

    warc_dir = tmp_path / "seg2"
    warc_dir.mkdir()
    docs = [(3, "alpha   beta\tgamma"), (4, OTHER)]
    (warc_dir / "a.warc.gz").write_bytes(_segment(docs))

    q = (
        warc_document_stream(spark, str(warc_dir))
        .writeStream.format("memory")
        .queryName("t_crawl_extract")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.url: r.text for r in spark.sql("SELECT * FROM t_crawl_extract").collect()
    }
    batch = html_to_text(
        spark.createDataFrame(
            [(f"https://example.org/p/{i}", _page(t).decode()) for i, t in docs],
            "url string, html string",
        )
    )
    exp = {r.url: r.text for r in batch.select("url", "text").collect()}
    assert got == exp and len(got) == 2
