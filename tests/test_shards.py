"""Tests for deterministic shuffle-shard export (operators/shards.py):
coverage/disjointness, reproducibility across runs and partitionings,
seed sensitivity, and the one-file-per-shard write layout."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestAssignShards:
    def test_covers_all_rows_disjointly(self, spark):
        from crawler_spark.operators.shards import assign_shards

        docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
        out = assign_shards(docs, num_shards=8)
        assert out.count() == docs.count()
        stats = out.agg(
            F.min("shard_id").alias("lo"), F.max("shard_id").alias("hi"),
            F.countDistinct("shard_id").alias("n"),
        ).first()
        assert stats["lo"] == 0 and stats["hi"] == 7 and stats["n"] == 8

    def test_deterministic_across_partitionings(self, spark):
        from crawler_spark.operators.shards import assign_shards

        docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
        a = assign_shards(docs.repartition(2), num_shards=8).collect()
        b = assign_shards(docs.repartition(17), num_shards=8).collect()
        assert {(r.doc_id, r.shard_id, r.sort_key) for r in a} == {
            (r.doc_id, r.shard_id, r.sort_key) for r in b
        }

    def test_seed_changes_permutation(self, spark):
        from crawler_spark.operators.shards import assign_shards

        docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
        a = {r.doc_id: r.shard_id for r in assign_shards(docs, seed=1).collect()}
        b = {r.doc_id: r.shard_id for r in assign_shards(docs, seed=2).collect()}
        assert any(a[k] != b[k] for k in a)


class TestWriteShards:
    def test_layout_order_and_reproducibility(self, spark, tmp_path):
        from crawler_spark.operators.shards import write_shards

        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "lang"
        )
        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        write_shards(docs, p1, num_shards=4)
        write_shards(docs, p2, num_shards=4)

        dirs = sorted(os.path.basename(d) for d in glob.glob(f"{p1}/shard_id=*"))
        assert dirs == [f"shard_id={i}" for i in range(4)]
        for d in dirs:
            files = [f for f in glob.glob(f"{p1}/{d}/*.parquet")]
            assert len(files) == 1, f"{d} should hold exactly one file"

        back1 = spark.read.parquet(p1)
        back2 = spark.read.parquet(p2)
        assert back1.count() == docs.count()
        rows1 = [(r.doc_id, r.shard_id) for r in
                 back1.orderBy("shard_id", "sort_key", "doc_id").collect()]
        rows2 = [(r.doc_id, r.shard_id) for r in
                 back2.orderBy("shard_id", "sort_key", "doc_id").collect()]
        assert rows1 == rows2

        # within a shard file, rows are physically ordered by sort_key
        one = spark.read.parquet(f"{p1}/shard_id=0")
        keys = [r.sort_key for r in one.collect()]
        assert keys == sorted(keys)
