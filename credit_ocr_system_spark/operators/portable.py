"""Cross-engine portable rounding for oracle-checked float outputs.

``ROUND(double, d)`` is NOT portable at decimal-tie boundaries: Spark
rounds the *shortest decimal string* of the double
(``BigDecimal.valueOf`` → HALF_UP on "0.5085" → 0.509) while
DuckDB/Postgres round the *binary* value (0.5085 as a double is
0.50849999…, → 0.508). A seeded corpus at sf0.1 produced exactly this
divergence on a composite score, so every oracle-facing round in this
engine uses the formula below instead — plain IEEE double arithmetic
(multiply, add, floor, divide) that every engine evaluates
bit-identically:

    pround(x, d) = floor(x * 10^d + 0.5) / 10^d

This is round-half-up *on the binary value* (ties break toward +inf —
fine for the non-negative ratios/similarities emitted here; revisit
before using on negative columns). The SQL twin ``sql_pround``
generates the identical expression for the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def pround(col, digits: int):
    """Engine-portable round-half-up of a non-negative double column."""
    scale = float(10 ** digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def sql_pround(expr: str, digits: int) -> str:
    """The SQL twin of :func:`pround` (same IEEE operation sequence)."""
    scale = 10 ** digits
    return f"floor(({expr}) * {scale}.0 + 0.5) / {scale}.0"


def pround_signed(col, digits: int):
    """:func:`pround` for columns that may go negative (e.g. trained
    model weights). Same formula — floor-based round-half-up is
    *toward +inf* for negatives (-0.0005 → 0.0), which is fine for
    the only property these rounds exist for: both engines evaluate
    the identical IEEE sequence, so the tie direction is shared.
    ``sql_pround`` is the twin for this too."""
    return pround(col, digits)


def hex_prefix_val(col, n_chars: int):
    """First ``n_chars`` lowercase-hex chars of ``col`` -> BIGINT via
    a Horner ascii fold ('0'-'9' -> 48..57, 'a'-'f' -> 97..102) — the
    numeric position of a hash prefix in its value space, computed
    identically by any engine (no engine-specific parsing). 15 chars
    (60 bits) stays exact in BIGINT; a later cast to DOUBLE rounds
    values above 2^53 (53-bit mantissa), but both engines apply the
    identical IEEE round-to-nearest on the identical integer, so
    cross-engine results are deterministically identical after
    rounding — use <=13 chars (52 bits) where true DOUBLE exactness
    is required."""
    v = F.lit(0).cast("bigint")
    for i in range(1, n_chars + 1):
        c = F.ascii(F.substring(col, i, 1))
        hv = c - 48 - F.when(c >= 97, F.lit(39)).otherwise(F.lit(0))
        v = v * 16 + hv
    return v


def sql_hex_prefix_val(expr: str, n_chars: int) -> str:
    """The SQL twin of :func:`hex_prefix_val` — same fold, term for
    term."""
    v = "CAST(0 AS BIGINT)"
    for i in range(1, n_chars + 1):
        c = f"ascii(substr({expr}, {i}, 1))"
        hv = f"({c} - 48 - CASE WHEN {c} >= 97 THEN 39 ELSE 0 END)"
        v = f"({v} * 16 + {hv})"
    return v
