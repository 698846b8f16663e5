"""Streaming data-quality gate: per-micro-batch expectation checks with
row-level quarantine routing.

The batch catalog has the two halves separately: raw_quarantine
(plans/elt.py — the reference's ingest error path, main.py:142-217, as
data) and dq_expectations (plans/llmdata5.py — Deequ-style declarative
checks). This module runs them CONTINUOUSLY: every micro-batch is
evaluated against a list of named row-level expectations; rows failing
any check are appended to a quarantine directory (with the failed check
names attached), clean rows to the good directory, and one audit row per
(batch, check) records the violation counts — the shape a pipeline
health dashboard tails.

All checks are Column predicates evaluated in one projection — the
routing adds no shuffle on top of the stream itself. foreachBatch is
used (not two filtered sinks) so the batch is evaluated ONCE per trigger
and both outputs plus the audit write stay consistent within a batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def failed_checks_col(checks: list[tuple[str, Column]]) -> Column:
    """Array of names of the checks a row VIOLATES.

    ``checks`` maps a name to a *violation predicate* (true = row is bad).
    Null predicate results count as violations — an unevaluable check
    must not wave a row through.
    """
    parts = [
        F.when(F.coalesce(pred, F.lit(True)), F.lit(name)).otherwise(F.lit(None))
        for name, pred in checks
    ]
    return F.array_compact(F.array(*parts))


def split_by_expectations(
    df: DataFrame, checks: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) — quarantined rows carry ``failed_checks``."""
    flagged = df.withColumn("failed_checks", failed_checks_col(checks))
    good = flagged.filter(F.size("failed_checks") == 0).drop("failed_checks")
    bad = flagged.filter(F.size("failed_checks") > 0)
    return good, bad


def batch_audit(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """One row per check: checked/violation counts for this batch —
    computed in a single aggregate pass (conditional sums), then
    unpivoted with stack."""
    aggs = [F.count(F.lit(1)).alias("n_checked")]
    for i, (_, pred) in enumerate(checks):
        aggs.append(
            F.sum(
                F.when(F.coalesce(pred, F.lit(True)), 1).otherwise(0)
            ).alias(f"v{i}")
        )
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', v{i}" for i, (name, _) in enumerate(checks)
    )
    return one.selectExpr(
        "n_checked",
        f"stack({len(checks)}, {stack_args}) AS (check_name, n_violations)",
    ).select(
        "check_name",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def start_quality_gate(
    stream: DataFrame,
    checks: list[tuple[str, Column]],
    good_dir: str,
    quarantine_dir: str,
    audit_dir: str,
    checkpoint_dir: str,
):
    """Run the gate continuously. Returns the StreamingQuery.

    foreachBatch evaluates each micro-batch exactly once per trigger:
    the three writes (good, quarantine, audit) are all derived from one
    persisted evaluation, so a batch's outputs are mutually consistent.
    Appends are idempotent at the directory level only per Spark's
    file-sink semantics; for exactly-once across restarts the target
    would be a transactional table format, same note as the upsert sink
    (streaming/incremental.py).
    """

    def _gate(batch: DataFrame, batch_id: int) -> None:
        flagged = batch.withColumn(
            "failed_checks", failed_checks_col(checks)
        ).persist()
        try:
            flagged.filter(F.size("failed_checks") == 0).drop(
                "failed_checks"
            ).write.mode("append").parquet(good_dir)
            bad = flagged.filter(F.size("failed_checks") > 0).withColumn(
                "failed_checks", F.array_join("failed_checks", ",")
            )
            bad.write.mode("append").parquet(quarantine_dir)
            audit = batch_audit(flagged, checks).withColumn(
                "_batch_id", F.lit(batch_id)
            )
            audit.write.mode("append").parquet(audit_dir)
        finally:
            flagged.unpersist()

    for d in (good_dir, quarantine_dir, audit_dir):
        os.makedirs(d, exist_ok=True)
    return (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def event_expectations() -> list[tuple[str, Column]]:
    """The stock expectation set for the events stream — violation
    predicates, mirroring the batch dq_expectations/raw_quarantine
    split: identity present, type in domain, value in range."""
    return [
        ("event_id_present", F.col("event_id").isNull()),
        (
            "event_type_in_domain",
            ~F.col("event_type").isin("view", "click", "purchase", "signup", "error"),
        ),
        ("value_non_negative", F.col("value") < 0),
        ("ts_present", F.col("ts").isNull()),
    ]
