"""Round-trip + dead-letter tests for the format-dispatched sources
(sources/formats.py): every supported format round-trips a frame
value-identically; malformed csv/json rows land in the corrupt column
instead of failing the read; csv/json refuse to run without a schema."""

from __future__ import annotations

import pytest

from crawler_spark.sources import read_source, split_corrupt, write_sink

ROWS = [(1, "alpha", 1.5), (2, "beta", -2.0), (3, None, 0.25)]
DDL = "id long, name string, score double"


def _frame(spark):
    return spark.createDataFrame(ROWS, DDL)


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip_value_identical(spark, tmp_path, fmt):
    path = str(tmp_path / f"t.{fmt}")
    write_sink(_frame(spark), path, fmt)
    back = read_source(spark, path, fmt, schema=DDL)
    clean, bad = split_corrupt(back)
    assert bad.count() == 0
    got = sorted((r.id, r.name, r.score) for r in clean.collect())
    assert got == sorted(ROWS)


def test_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "part")
    write_sink(_frame(spark), path, "parquet", partition_by=["id"])
    back = read_source(spark, path, "parquet").where("id = 2")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain(True)
    assert "PartitionFilters: [isnotnull(id" in buf.getvalue()
    assert back.count() == 1


def test_schema_required_for_inference_formats(spark, tmp_path):
    p = str(tmp_path / "x.json")
    _frame(spark).write.json(p)
    with pytest.raises(ValueError, match="explicit schema"):
        read_source(spark, p, "json")
    with pytest.raises(ValueError, match="explicit schema"):
        read_source(spark, p, "csv")


def test_malformed_jsonl_dead_letters_not_fails(spark, tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"id": 1, "name": "ok", "score": 1.0}\n'
        "this is not json at all\n"
        '{"id": 2, "name": "also ok", "score": 2.0}\n'
    )
    df = read_source(spark, str(p), "json", schema=DDL)
    clean, bad = split_corrupt(df)
    assert {r.id for r in clean.collect()} == {1, 2}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "not json" in bad_rows[0]._corrupt_record


def test_caller_schema_object_not_mutated(spark, tmp_path):
    """ADVICE formats.py:55: read_source must not grow the caller's
    StructType with the corrupt column in place."""
    from pyspark.sql.types import StructType

    p = tmp_path / "raw"
    p.mkdir()
    (p / "a.jsonl").write_text('{"id": 1, "name": "x", "score": 0.5}\n')
    schema = StructType.fromDDL(DDL)
    before = schema.fieldNames()
    read_source(spark, str(p), "json", schema=schema).count()
    assert schema.fieldNames() == before


def test_split_corrupt_consume_unpersists_eagerly(spark, tmp_path):
    """ADVICE formats.py:79: the pipeline-shaped variant materializes
    the dead-letter side and releases the cached raw scan immediately."""
    from crawler_spark.sources.formats import split_corrupt_consume

    p = tmp_path / "raw"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"id": 1, "name": "ok", "score": 1.0}\nnot json\n')
    df = read_source(spark, str(p), "json", schema=DDL)
    clean, bad_rows = split_corrupt_consume(df)
    assert len(bad_rows) == 1 and "not json" in bad_rows[0]._corrupt_record
    assert {r.id for r in clean.collect()} == {1}
    assert not df.is_cached


def test_text_format_reads_lines(spark, tmp_path):
    p = tmp_path / "lines"
    p.mkdir()
    (p / "a.txt").write_text("one\ntwo\n")
    df = read_source(spark, str(p), "text")
    assert sorted(r.value for r in df.collect()) == ["one", "two"]


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported read format"):
        read_source(spark, str(tmp_path), "avro")
