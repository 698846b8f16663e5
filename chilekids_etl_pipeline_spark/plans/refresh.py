"""Mart persistence: compute every mart and land it on the lake.

The reference refreshes marts as Postgres views and upserts the
campaigns summary into a mart table (src/marts.py:29-42, main.py's
refresh step). The lake-native equivalent composed here:

- the time-partitioned mart (``financials_monthly``) lands via dynamic
  partition overwrite — a rerun (or a late-arriving month slice) swaps
  only the partitions present in the batch and leaves every other month's
  files untouched, which is the idempotent-upsert story at partition
  granularity;
- snapshot marts (dimensions, category rollups, campaign summaries) are
  small, fully-recomputed outputs — plain atomic overwrite, exactly like
  a view refresh.

At 100 TB only the partitioned path ever rewrites data proportional to
the batch, not the history; the snapshot marts stay KB-MB sized however
large the fact tables grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.sinks import write_partitioned

# mart name → partition columns (None = snapshot overwrite)
MART_LAYOUT: dict[str, list[str] | None] = {
    "financials_monthly": ["year_month"],
    "expenses_by_category": None,
    "web_transactions": None,
    "dim_clients": None,
    "dim_categories": None,
    "dim_vendors": None,
    "campaigns_summary": None,
}


def refresh_marts(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    only: list[str] | None = None,
    slice_filter: str | None = None,
) -> dict[str, str]:
    """Build and persist every mart (reference ``marts.build_all`` +
    campaign upsert, src/marts.py:29-45). Returns mart → output path.

    ``only`` restricts to a subset; ``slice_filter`` (SQL predicate applied
    to the partitioned marts) expresses an incremental rerun — e.g.
    ``"year_month = '1997-03'"`` recomputes and atomically swaps just that
    month, the dynamic-overwrite analog of the reference's keyed upsert.
    """
    from .registry import queries as _qs

    qs = _qs()
    written: dict[str, str] = {}
    for mart, parts in MART_LAYOUT.items():
        if only is not None and mart not in only:
            continue
        df: DataFrame = qs[mart](spark, sf_dir)
        path = f"{out_dir}/{mart}"
        if parts:
            if slice_filter:
                df = df.filter(slice_filter)
            write_partitioned(df, path, parts)
        else:
            df.write.mode("overwrite").parquet(path)
        written[mart] = path
    return written
