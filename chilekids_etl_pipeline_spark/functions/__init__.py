from .normalize import (  # noqa: F401
    money_sql,
    int_sql,
    ts_sql_spark,
    ts_sql_duckdb,
    parse_money,
    parse_int,
    parse_timestamp_multi,
)
