"""JSONL edge-format tier (sources/jsonl.py): schema-first scan, corrupt-
line quarantine, round-trip fidelity, and the edge→parquet conversion hop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from network_iq_spark.sources import load_table
from network_iq_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA,
    jsonl_to_parquet,
    read_jsonl_split,
    write_jsonl,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents")


def _rows(df):
    return sorted(
        (r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in df.collect()
    )


def test_jsonl_roundtrip_exact(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back, corrupt = read_jsonl_split(spark, out, DOCUMENTS_SCHEMA)
    assert _rows(back) == _rows(docs)
    assert corrupt.count() == 0


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s", "n_chars": 5}\n'
        "this line is not json at all\n"
        '{"doc_id": 2, "text": "beta", "lang": "en", "source": "s", "n_chars": 4}\n'
        '{"doc_id": 3, "text": "gamma", "lang"\n'
    )
    valid, corrupt = read_jsonl_split(spark, str(p), DOCUMENTS_SCHEMA)
    assert sorted(r.doc_id for r in valid.collect()) == [1, 2]
    bad = corrupt.collect()
    assert len(bad) == 2
    assert {r.raw_line for r in bad} == {
        "this line is not json at all",
        '{"doc_id": 3, "text": "gamma", "lang"',
    }
    # provenance survives the quarantine
    assert all(r.src_file.endswith("mixed.jsonl") for r in bad)


def test_jsonl_to_parquet_hop(spark, tmp_path):
    docs = _docs(spark)
    src = str(tmp_path / "edge_jsonl")
    dst = str(tmp_path / "lake_parquet")
    write_jsonl(docs, src, compression=None)
    lake = jsonl_to_parquet(spark, src, dst, DOCUMENTS_SCHEMA)
    assert _rows(lake) == _rows(docs)
    # downstream plans get real pruning: a 1-column projection of the
    # parquet copy reads 1 column, which the JSONL scan can never do
    plan = (
        lake.select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_jsonl_schema_is_explicit_no_inference(spark, tmp_path):
    """A column absent from the declared schema is ignored, and a declared
    column absent from the data comes back null — schema-first semantics,
    no inference pass."""
    p = tmp_path / "extra.jsonl"
    p.write_text('{"doc_id": 7, "text": "x", "surprise": true}\n')
    valid, corrupt = read_jsonl_split(spark, str(p), DOCUMENTS_SCHEMA)
    row = valid.collect()[0]
    assert row.doc_id == 7 and row.lang is None
    assert "surprise" not in valid.columns
    assert corrupt.count() == 0


def test_xml_records_schema_first_scan(spark, tmp_path):
    from pyspark.sql import types as T

    from network_iq_spark.sources.jsonl import read_xml_records

    lines = [
        "<record><doc_id>1</doc_id><text>alpha beta</text></record>",
        "",
        "<record><doc_id>2</doc_id><text>gamma</text></record>",
        "<notarecord>skip me</notarecord>",
    ]
    p = tmp_path / "recs.xml"
    p.write_text("\n".join(lines))
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    out = sorted(
        (r["doc_id"], r["text"]) for r in read_xml_records(spark, str(p), schema).collect()
    )
    assert out == [(1, "alpha beta"), (2, "gamma")]
