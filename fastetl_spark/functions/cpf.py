"""F5 — Brazilian CPF (tax id) validation/normalization as pure column
expressions (reference CPFCleaner, patchwork.py:607-726; check-digit
algorithm at patchwork.py:611-621).

Rules carried over: strip '.'/'-' separators, reject any other garbage,
reject all-same-digit values, left-pad to 11, verify the two mod-11
check digits. The check-digit sums are unrolled over substring() — all
JVM-side, no UDF, so validation runs at full codegen speed over any
number of rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _digit(c: Column, i: int) -> Column:
    return F.substring(c, i, 1).cast("int")


def cpf_check_digit_1(base9: Column) -> Column:
    """dv1 = ((sum d_i * (11-i)) * 10) % 11 % 10 for i=1..9."""
    s = sum((_digit(base9, i) * (11 - i) for i in range(1, 10)), F.lit(0))
    return (s * 10) % 11 % 10


def cpf_check_digit_2(base9: Column, dv1: Column) -> Column:
    """dv2 over the 10-digit prefix with weights 11..2."""
    s = sum((_digit(base9, i) * (12 - i) for i in range(1, 10)), F.lit(0)) + dv1 * 2
    return (s * 10) % 11 % 10


def cpf_normalize(c: Column) -> Column:
    """Strip separators and left-pad to 11 digits; non-digit garbage
    (beyond './-') makes the value invalid downstream."""
    return F.lpad(F.regexp_replace(c, "[.\\-]", ""), 11, "0")


def cpf_is_valid(c: Column) -> Column:
    """Full validation on a normalized 11-char value."""
    norm = cpf_normalize(c)
    all_digits = norm.rlike("^[0-9]{11}$")
    base9 = F.substring(norm, 1, 9)
    dv1 = cpf_check_digit_1(base9)
    dv2 = cpf_check_digit_2(base9, dv1)
    # all-same-digit rejection; expressed via repeat() (no backreference)
    # so the same logic is portable to RE2-based oracles
    not_repeated = norm != F.repeat(F.substring(norm, 1, 1), 11)
    checks_ok = (_digit(norm, 10) == dv1) & (_digit(norm, 11) == dv2)
    return all_digits & not_repeated & checks_ok


def cpf_clean(c: Column) -> Column:
    """Normalized CPF when valid, NULL otherwise (CAST_NULL semantics)."""
    return F.when(cpf_is_valid(c), cpf_normalize(c))
