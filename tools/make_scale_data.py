"""Deterministic 10x scale-up of the driver testdata for sweep testing.

The per-round correctness gate runs at sf0.01 and the committed sweep at
sf0.1; history shows each 10x step surfaces real cross-engine traps
(round-2: round() ties; round-4: decimal literal precision). This tool
builds an sf1-equivalent dataset from sf0.1 WITHOUT touching the
read-only /root/testdata: each fact table is replicated k times with
key offsets, so referential integrity holds within every replica.

Fidelity rules:
- offsets are multiples of lcm(1..9, 10, 63)·large so key mod-classes
  (o_orderkey % 7, event_id % 10, bloom's % 63 words...) keep their
  distribution;
- document text gets a per-replica suffix token (and n_chars adjusts)
  so the exact/near-dup structure is replicated, not multiplied —
  10 identical corpora would quadratically inflate every pair query;
- documents/embeddings use SMALL strides (multiples of their own mod
  conventions: lcm(10,20,25,30,50)=300 and lcm(25,50)=50) so replica
  ids stay BELOW the catalog's planted-copy sentinel (ids >= 100000
  mark synthetic new-batch rows in the llmdata oracles; a real id
  crossing it breaks the oracle-side reconstruction of the planted
  split, observed as an ann_lsh_cosine row blow-up);
- embeddings perturb their first component per replica for the same
  reason (cosine structure preserved, exact-duplicate vectors not);
- dims (region, nation) copy as-is; timestamps are untouched so
  calendar-bounded aggregates stay calendar-bounded.

The output is for the Spark-vs-DuckDB sweep only (both engines read the
SAME parquet, so any deterministic data is a valid comparator); it is
not committed.

Usage: python tools/make_scale_data.py [--src sf_dir] [--out dir] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# lcm(2520, 63, 10) = 2520; scale it up so offsets dwarf every key range
MOD_BASE = 2520 * 63  # 158760; divisible by 1..9, 10, 63


def stride_for(max_key: int) -> int:
    return ((max_key // MOD_BASE) + 1) * MOD_BASE


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scaledata/sf1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list: replicate ONLY these tables (dims always copy). "
        "Documents/embeddings are sentinel-capped at ~16 replicas of the "
        "driver corpus, so a deeper business-table-only step (e.g. sf3 = "
        "--src .scaledata/sf1 --k 3 --tables "
        "customer,supplier,part,orders,lineitem,events) skips them; copy "
        "their sf1 parquet alongside so every entry still loads.",
    )
    ap.add_argument(
        "--vec-mode",
        choices=("nudge", "shift"),
        default="nudge",
        help="embedding replica decorrelation. 'nudge' (default, the "
        "historical scheme) adds i*0.001 to the first component — "
        "replicas stay ~0.9999 cosine to their source, so every planted "
        "near-dup matches ALL k replicas and pair output grows k^2; fine "
        "for the business-table sweeps where the vector family isn't the "
        "target. 'shift' cyclically rotates each replica's components by "
        "i positions (components are mean-centered: measured cos(x, "
        "shift(x)) avg 0.009 / max 0.38) so replicas are DECORRELATED and "
        "planted-neighbor density stays constant across the step — the "
        "required mode for vector-axis scaling decades, where a k^2 pair "
        "blow-up would masquerade as a compute quadratic.",
    )
    ap.add_argument(
        "--sentinel",
        type=int,
        default=100_000,
        help="planted-id sentinel the output must respect (round 11, "
        "VERDICT r10 #2): natural doc/vec ids stay BELOW this value. The "
        "default matches the catalog's gate convention; a deep document "
        "step (e.g. sf1 -> 10x docs) passes a larger value, and every "
        "measurement against that output must set "
        "SPARK_GRAFT_ID_SENTINEL to the same value so the plans' planted "
        "copies land above the natural id range (plans/llmdata.py "
        "PLANT_SENTINEL).",
    )
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"'{args.src}/{t}.parquet'"

    def emit(t: str, sql: str) -> None:
        if only is not None and t not in only and t not in ("region", "nation"):
            return
        con.execute(
            f"COPY ({sql}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{args.out}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")

    # dims unchanged
    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM {src(t)}")

    def max_key(t: str, col: str) -> int:
        return con.execute(
            f"SELECT max({col}) FROM {src(t)}"
        ).fetchone()[0]

    k = args.k
    s_cust = stride_for(max_key("customer", "c_custkey"))
    s_supp = stride_for(max_key("supplier", "s_suppkey"))
    s_part = stride_for(max_key("part", "p_partkey"))
    s_ord = stride_for(max_key("orders", "o_orderkey"))
    s_ev = stride_for(max_key("events", "event_id"))
    s_user = stride_for(
        con.execute(f"SELECT max(user_id) FROM {src('events')}").fetchone()[0]
    )
    # sentinel-safe strides: multiples of the doc/vec mod conventions,
    # small enough that 10 replicas stay below id 100000
    def small_stride(mx: int, base: int) -> int:
        return ((mx // base) + 1) * base

    s_doc = s_vec = 0
    if only is None or "documents" in only:
        s_doc = small_stride(max_key("documents", "doc_id"), 300)
        assert max_key("documents", "doc_id") + (k - 1) * s_doc < args.sentinel, (
            "doc ids would cross the planted-id sentinel "
            f"{args.sentinel}; lower --k or raise --sentinel (and measure "
            "with SPARK_GRAFT_ID_SENTINEL set to match)"
        )
    if only is None or "embeddings" in only:
        s_vec = small_stride(max_key("embeddings", "vec_id"), 50)
        assert max_key("embeddings", "vec_id") + (k - 1) * s_vec < args.sentinel, (
            "vec ids would cross the planted-id sentinel "
            f"{args.sentinel}; lower --k or raise --sentinel (and measure "
            "with SPARK_GRAFT_ID_SENTINEL set to match)"
        )

    rep = f"(SELECT unnest(range(0, {k})) AS i)"

    emit("customer", f"""
        SELECT c_custkey + i * {s_cust} AS c_custkey,
               c_name || CASE WHEN i = 0 THEN '' ELSE '#' || i END AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')} CROSS JOIN {rep}""")
    emit("supplier", f"""
        SELECT s_suppkey + i * {s_supp} AS s_suppkey,
               s_name || CASE WHEN i = 0 THEN '' ELSE '#' || i END AS s_name,
               s_nationkey, s_acctbal
        FROM {src('supplier')} CROSS JOIN {rep}""")
    emit("part", f"""
        SELECT p_partkey + i * {s_part} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {src('part')} CROSS JOIN {rep}""")
    emit("orders", f"""
        SELECT o_orderkey + i * {s_ord} AS o_orderkey,
               o_custkey + i * {s_cust} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')} CROSS JOIN {rep}""")
    emit("lineitem", f"""
        SELECT l_orderkey + i * {s_ord} AS l_orderkey,
               l_partkey + i * {s_part} AS l_partkey,
               l_suppkey + i * {s_supp} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')} CROSS JOIN {rep}""")
    emit("events", f"""
        SELECT event_id + i * {s_ev} AS event_id, ts,
               user_id + i * {s_user} AS user_id,
               event_type, value, props
        FROM {src('events')} CROSS JOIN {rep}""")
    emit("documents", f"""
        SELECT doc_id + i * {s_doc} AS doc_id,
               text || CASE WHEN i = 0 THEN ''
                            ELSE ' zrep' || i END AS text,
               lang, source,
               n_chars + CASE WHEN i = 0 THEN 0
                              ELSE length(' zrep' || i) END AS n_chars
        FROM {src('documents')} CROSS JOIN {rep}""")
    if args.vec_mode == "shift":
        # cyclic rotation by (i % dim) decorrelates the replica; the
        # first-component nudge keeps i = dim, 2*dim, ... (shift 0)
        # from being exact duplicates of the source when k > dim
        emb_expr = """
               CASE WHEN i = 0 THEN embedding
                    WHEN i % len(embedding) = 0 THEN
                         [embedding[1] + cast(i AS float) * 0.001]
                         || embedding[2:]
                    ELSE list_concat(
                         embedding[(1 + (i % len(embedding))):],
                         embedding[1:(i % len(embedding))])
               END AS embedding"""
    else:
        emb_expr = """
               CASE WHEN i = 0 THEN embedding
                    ELSE [embedding[1] + cast(i AS float) * 0.001]
                         || embedding[2:] END AS embedding"""
    emit("embeddings", f"""
        SELECT vec_id + i * {s_vec} AS vec_id,
               {emb_expr},
               label
        FROM {src('embeddings')} CROSS JOIN {rep}""")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
