"""Text-analysis SQL expression builders, dual-dialect (Spark + DuckDB).

Everything here returns SQL strings so each operator's DuckDB oracle is
generated from the same template as the Spark plan. All expressions are
built-in functions / higher-order array lambdas — JVM codegen on the Spark
side, no Python UDFs.
"""

from __future__ import annotations

HEX = "0123456789abcdef"


def words_sql(dialect: str, col: str = "text") -> str:
    """Non-empty whitespace tokens as an array."""
    if dialect == "spark":
        return f"filter(split({col}, ' '), x -> x <> '')"
    return f"list_filter(string_split({col}, ' '), x -> x <> '')"


def shingles_sql(dialect: str, words: str, n: int = 3) -> str:
    """Distinct word n-gram shingles from a words-array expression."""
    if dialect == "spark":
        gram = ", ".join(f"element_at({words}, i + {j + 1})" for j in range(n))
        return (
            f"array_distinct(CASE WHEN size({words}) >= {n} THEN "
            f"transform(sequence(0, size({words}) - {n}), "
            f"i -> concat_ws(' ', {gram})) "
            f"ELSE array() END)"
        )
    gram = ", ".join(f"({words})[i + {j}]" for j in range(n))
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({words}) - {n - 2}, 1)), "
        f"i -> concat_ws(' ', {gram})))"
    )


def word_len_sum_sql(dialect: str, words: str) -> str:
    if dialect == "spark":
        return f"aggregate({words}, 0, (acc, x) -> acc + length(x))"
    return f"cast(coalesce(list_sum(list_transform({words}, x -> length(x))), 0) AS bigint)"


def stop_hits_sql(dialect: str, words: str, stopwords: list[str]) -> str:
    """Count of tokens (with multiplicity) that are in the stopword list."""
    inlist = ", ".join(f"'{w}'" for w in stopwords)
    if dialect == "spark":
        return f"size(filter({words}, x -> x IN ({inlist})))"
    return f"len(list_filter({words}, x -> x IN ({inlist})))"


def bpe_token_count_sql(dialect: str, col: str = "text") -> str:
    """BPE-ish token count: letter runs, digit runs, other non-space chars."""
    pattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    if dialect == "spark":
        return f"size(regexp_extract_all({col}, '{pattern}', 0))"
    return f"len(regexp_extract_all({col}, '{pattern}'))"


def subword_count_sql(dialect: str, words: str, chunk: int = 4) -> str:
    """ceil(len/chunk) summed over tokens — a deterministic subword proxy."""
    if dialect == "spark":
        return (
            f"aggregate({words}, cast(0 AS bigint), "
            f"(acc, x) -> acc + (length(x) + {chunk - 1}) DIV {chunk})"
        )
    return (
        f"cast(coalesce(list_sum(list_transform({words}, "
        f"x -> (length(x) + {chunk - 1}) // {chunk})), 0) AS bigint)"
    )


def hex_nibble_sql(dialect: str, digit: str) -> str:
    """Value 0-15 of a single lowercase hex digit expression."""
    if dialect == "spark":
        return f"(position({digit}, '{HEX}') - 1)"
    return f"(strpos('{HEX}', {digit}) - 1)"


def intdiv(dialect: str, a: str, b: str) -> str:
    return f"({a} DIV {b})" if dialect == "spark" else f"({a} // {b})"
