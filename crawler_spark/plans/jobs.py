"""Job state machine + feature flags (SURVEY.md §2.10 D6-D7).

The reference keeps crawl jobs in a Postgres table with a status state
machine (pending → queued → running → completed|failed — main.py:142-166,
tasks.py:26-48) and small feature-flag rows gating pipeline behavior
(feature_flags.py:12-44). Here jobs are a DataFrame maintained through
the merge operators; flags collapse to a broadcast-able dict — the
Spark analogue of the reference's lru_cache.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark import schemas
from crawler_spark.operators.upsert import delete_by_key, update_columns

VALID_TRANSITIONS = {
    "pending": {"queued", "running", "failed"},
    "queued": {"running", "failed"},
    "running": {"completed", "failed"},
    "completed": set(),
    "failed": set(),
}


def empty_jobs(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], schemas.JOBS)


def create_job(spark: SparkSession, jobs: DataFrame, parameters: dict) -> tuple[DataFrame, str]:
    """S10: append a pending job row; returns (jobs', job_id)."""
    job_id = str(uuid.uuid4())
    row = spark.createDataFrame(
        [(job_id, "pending", json.dumps(parameters), None, None, None)], schemas.JOBS
    ).select(
        "id", "status", "parameters", "result",
        F.current_timestamp().alias("created_at"),
        F.current_timestamp().alias("updated_at"),
    )
    return jobs.unionByName(row), job_id


def transition_job(
    jobs: DataFrame, job_id: str, new_status: str, result: dict | None = None
) -> DataFrame:
    """D6/S11: move a job along the state machine, stamping updated_at;
    invalid target states AND invalid transitions raise (the reference
    would silently write — we enforce the machine the reference
    implies: pending → queued/running → completed|failed,
    main.py:142-166, tasks.py:26-48).

    The current-status lookup is one driver action over the (tiny,
    reference-scale) jobs table — the same read-before-write the
    reference's UPDATE ... WHERE id does."""
    if new_status not in schemas.JOB_STATES:
        raise ValueError(f"unknown status {new_status!r}")
    current = jobs.filter(F.col("id") == job_id).select("status").collect()
    if not current:
        raise ValueError(f"unknown job {job_id!r}")
    cur_status = current[0]["status"]
    if new_status not in VALID_TRANSITIONS[cur_status]:
        raise ValueError(
            f"invalid transition {cur_status!r} -> {new_status!r} for job {job_id!r}"
        )
    updates: dict[str, object] = {"status": new_status}
    if result is not None:
        updates["result"] = json.dumps(result)
    out = update_columns(jobs, "id", job_id, updates)
    return out.withColumn(
        "updated_at",
        F.when(F.col("id") == job_id, F.current_timestamp()).otherwise(F.col("updated_at")),
    )


def delete_job(jobs: DataFrame, job_id: str) -> DataFrame:
    """S12: anti-join delete."""
    spark = jobs.sparkSession
    return delete_by_key(jobs, spark.createDataFrame([(job_id,)], "id string"), "id")


def jobs_page(jobs: DataFrame, limit: int = 100, offset: int = 0) -> DataFrame:
    """O2: recency-ordered jobs page (reference db.py:121-124)."""
    return (
        jobs.orderBy(F.col("created_at").desc_nulls_last(), F.col("id"))
        .offset(offset)
        .limit(limit)
    )


def default_flags(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(schemas.DEFAULT_FLAGS, schemas.FEATURE_FLAGS)


def flags_dict(flags: DataFrame) -> dict[str, bool]:
    """D7: collect the tiny flags table once per run (the reference's
    lru_cache, feature_flags.py:12) — callers branch in Python."""
    return {r["name"]: bool(r["is_enabled"]) for r in flags.collect()}


def is_feature_enabled(flags: DataFrame, name: str) -> bool:
    return flags_dict(flags).get(name, False)
