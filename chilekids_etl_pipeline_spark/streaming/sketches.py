"""Streaming sketches: HyperLogLog registers and Count-Min cells as
continuously-maintained streaming aggregates.

The batch entry (plans/analytics5.py hll_distinct_portable) computes
the registers in one pass; this module maintains the SAME registers
over a stream. The reason HLL streams (and exact COUNT DISTINCT does
not) is that a register is a MAX — max is associative, commutative and
idempotent, so per-micro-batch maxima merge into running state without
ever revisiting history, and state is bounded at m registers per group
regardless of stream length. The estimate is derived from the register
table per trigger (a second aggregation — kept outside the streaming
query because Structured Streaming allows one aggregation per query;
the register table is tiny, m rows per group).

The Count-Min twin (cms_cell_updates) streams for the dual reason: its
cell is a SUM — associative and commutative — so per-micro-batch
partial counts merge into d×w bounded state where an exact streaming
term-frequency table would grow with the vocabulary.

All expressions come from functions/sketch.py, so the streaming
registers/cells are bit-identical to the batch entries'
(hll_distinct_portable, heavy_hitters_cms), pinned by
tests/test_streaming.py against the batch computation on the same
inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sketch import (
    CMS_D,
    HLL_M,
    HLL_POW,
    cms_bucket_sql,
    hll_bucket_sql,
    hll_estimate_from_fp_sql,
    hll_hash_sql,
    hll_rho_sql,
    hll_shifted_sql,
    hll_w_sql,
)
from ..functions.text import words_sql


def hll_register_updates(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Streaming (or batch) events → per-(event_type, bucket) register
    maxima. On a stream this is an update-mode aggregation whose state
    is at most m rows per event_type — the mergeability that makes the
    sketch feasible where exact distinct state would grow without
    bound."""
    hashed = events.selectExpr(
        "event_type", f"{hll_hash_sql('spark', key)} AS h"
    )
    parts = hashed.selectExpr(
        "event_type",
        f"{hll_bucket_sql('spark')} AS bucket",
        f"{hll_w_sql('spark')} AS w",
    )
    ranks = parts.selectExpr("event_type", "bucket", f"{hll_rho_sql()} AS rho")
    return ranks.groupBy("event_type", "bucket").agg(F.max("rho").alias("r"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Register table → per-group estimate (batch-side; runs on at most
    m rows per group). Reuses the exact fixed-point estimate expression
    of the batch catalog entry."""
    sums = registers.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
        F.expr(f"cast(sum({hll_shifted_sql('spark')}) AS bigint)").alias(
            "present_sum"
        ),
    )
    est = sums.selectExpr(
        "event_type",
        "n_present",
        f"present_sum + ({HLL_M} - n_present) * cast({HLL_POW} AS bigint)"
        " AS harmonic_fp",
        f"{HLL_M} - n_present AS zeros",
    )
    return est.selectExpr(
        "event_type",
        "n_present",
        f"{hll_estimate_from_fp_sql('harmonic_fp', 'zeros')} AS hll_estimate",
    )


def cms_cell_updates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming (or batch) documents → Count-Min sketch cells.

    The CMS cell is a SUM — associative and commutative — so per-micro-
    batch partial counts merge into running state without revisiting
    history, exactly the way the HLL register's MAX does; state is
    bounded at d×w cells regardless of stream length, where an exact
    streaming term-frequency table would grow with the vocabulary. The
    bucket expression is shared with the batch heavy_hitters_cms entry
    (functions/sketch.py), so a cell probed from the streamed sketch
    equals the batch sketch's cell on the same corpus."""
    tokens = docs.selectExpr(
        f"explode({words_sql('spark', text_col)}) AS term"
    )
    salted = tokens.selectExpr("term", f"explode(sequence(0, {CMS_D - 1})) AS i")
    cells = salted.selectExpr("i", f"{cms_bucket_sql('spark', 'i', 'term')} AS b")
    return cells.groupBy("i", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("cell")
    )


def cms_probe(sketch: DataFrame, terms: DataFrame) -> DataFrame:
    """Point-frequency estimates for a term table against the d×w
    sketch: min over the d row cells each term hashes to (batch-side;
    the sketch is tiny). Missing cells count as 0."""
    probes = terms.selectExpr(
        "term", f"explode(sequence(0, {CMS_D - 1})) AS i"
    ).selectExpr("term", "i", f"{cms_bucket_sql('spark', 'i', 'term')} AS b")
    hit = probes.join(sketch, ["i", "b"], "left").na.fill({"cell": 0})
    return hit.groupBy("term").agg(F.min("cell").alias("cms_estimate"))


def start_cms_stream(docs: DataFrame, table_name: str = "cms_cells"):
    """Maintain the sketch continuously into a memory sink (complete
    mode: d×w rows, idempotent to re-emit). Returns the StreamingQuery;
    probe with cms_probe(spark.table(table_name), terms)."""
    cells = cms_cell_updates(docs)
    return (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )


def start_register_stream(events: DataFrame, table_name: str = "hll_registers"):
    """Run the register maintenance continuously into a memory sink
    (complete mode: the register table is tiny and idempotent to
    re-emit). Returns the StreamingQuery; read the estimate with
    hll_estimate(spark.table(table_name))."""
    regs = hll_register_updates(events)
    return (
        regs.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
