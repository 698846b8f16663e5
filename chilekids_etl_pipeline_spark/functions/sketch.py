"""Portable sketch-primitive SQL builders (shared by the batch catalog
and the streaming sketches).

HyperLogLog pieces: md5 → register index (first 8 bits) + rank field
(next 56 bits); rho = leading-zero rank from the binary-string length
(bin() prints identically in Spark and DuckDB). The harmonic mean is
summed in FIXED POINT (2^53 >> rho — exact int64) because a double
2^-rho sum is order-dependent across engines; rho > 53 truncates to 0
identically on both sides (probability 2^-53 per row).
"""

from __future__ import annotations

HLL_M = 256          # registers (b = 8 index bits)
HLL_WBITS = 56       # remaining digest bits fed to the rank
HLL_POW = 1 << 53    # fixed-point unit for the harmonic sum


CMS_D = 4    # Count-Min hash rows
CMS_W = 512  # buckets per row (3 hex nibbles = 12 bits, mod w)


def cms_bucket_sql(dialect: str, i: str, term: str) -> str:
    """Count-Min row-``i`` bucket of ``term``: md5 of the salted term,
    first 3 hex nibbles → 0..4095, mod w. Integer-exact and identical
    across engines (same construction as the HLL register index)."""
    s = "string" if dialect == "spark" else "varchar"
    h = f"md5(concat(cast({i} AS {s}), ':', {term}))"
    if dialect == "spark":
        return f"(cast(conv(substr({h}, 1, 3), 16, 10) AS int) % {CMS_W})"
    return f"(cast(('0x' || substr({h}, 1, 3)) AS bigint) % {CMS_W})"


def hll_hash_sql(dialect: str, key: str) -> str:
    s = "string" if dialect == "spark" else "varchar"
    return f"md5(cast({key} AS {s}))"


def hll_bucket_sql(dialect: str, h: str = "h") -> str:
    if dialect == "spark":
        return f"cast(conv(substr({h}, 1, 2), 16, 10) AS int)"
    return f"cast(('0x' || substr({h}, 1, 2)) AS bigint)"


def hll_w_sql(dialect: str, h: str = "h") -> str:
    if dialect == "spark":
        return f"cast(conv(substr({h}, 3, 14), 16, 10) AS bigint)"
    return f"cast(('0x' || substr({h}, 3, 14)) AS bigint)"


def hll_rho_sql(w: str = "w") -> str:
    """Rank of the first set bit (1-based from the MSB of the 56-bit
    field); identical text in both dialects."""
    return (
        f"CASE WHEN {w} = 0 THEN {HLL_WBITS + 1} "
        f"ELSE {HLL_WBITS} - length(bin({w})) + 1 END"
    )


def hll_shifted_sql(dialect: str, r: str = "r") -> str:
    """2^53 >> rho as exact integer — the fixed-point harmonic term."""
    if dialect == "spark":
        return f"shiftright(cast({HLL_POW} AS bigint), {r})"
    return f"({HLL_POW} >> {r})"


def hll_alpha_m2_sql() -> str:
    """alpha_m * m^2 with every literal forced to double — bare decimal
    literals parse as DECIMAL with engine-specific precision rules."""
    return (
        f"(cast(0.7213 AS double) / (cast(1.0 AS double) "
        f"+ cast(1.079 AS double) / {HLL_M})) * {HLL_M} * {HLL_M}"
    )


def hll_estimate_from_fp_sql(harmonic_fp: str, zeros: str) -> str:
    """Estimate from the fixed-point harmonic sum + empty-register count
    (small-range linear counting below 2.5m); identical text in both
    dialects."""
    raw = f"({hll_alpha_m2_sql()}) * {HLL_POW} / cast({harmonic_fp} AS double)"
    return (
        f"CASE WHEN {raw} <= cast(2.5 AS double) * {HLL_M} AND {zeros} > 0 "
        f"THEN {HLL_M} * ln({HLL_M} / cast({zeros} AS double)) "
        f"ELSE {raw} END"
    )
