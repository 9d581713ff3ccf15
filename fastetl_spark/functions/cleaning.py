"""Column-expression cleaners F1–F11 (SURVEY §2.7).

The reference implements these as pandas row loops (`df.apply(axis=1)`,
patchwork.py:395-409 etc.); every one is re-expressed as a native
Column expression so it stays inside whole-stage codegen — no Python in
the hot path at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F6: the 27 Brazilian state codes (UFCleaner, patchwork.py:728-758)
VALID_UFS = [
    "AC", "AL", "AP", "AM", "BA", "CE", "DF", "ES", "GO", "MA", "MT", "MS",
    "MG", "PA", "PB", "PR", "PE", "PI", "RJ", "RN", "RS", "RO", "RR", "SC",
    "SP", "SE", "TO",
]


def fix_decimal_comma(c: Column) -> Column:
    """F1 (patchwork.py:445-471): ','->'.' then tolerant double cast;
    garbage -> NULL. try_cast keeps ANSI mode safe."""
    return F.regexp_replace(c, ",", ".").try_cast("double")


def fix_coordinate_scale(c: Column, lo: float, hi: float, factor: float = 1e5) -> Column:
    """F2 (patchwork.py:490-544): coordinates that lost their decimal
    separator are off by `factor`. Repair only values that are both far
    outside the range (|c| > 10*hi — the reference's magnitude windows
    generalized) AND land inside [lo, hi] after dividing; merely-invalid
    values fall through to bounds-nulling (F3) instead of being
    'rescued' into the range."""
    return F.when(
        ~c.between(lo, hi) & (F.abs(c) > 10 * hi) & (c / factor).between(lo, hi), c / factor
    ).otherwise(c)


def null_out_of_bounds(c: Column, lo: float, hi: float) -> Column:
    """F3 (patchwork.py:546-587): out-of-range coordinate -> NULL."""
    return F.when(c.between(lo, hi), c)


def wkt_point(longitude: Column, latitude: Column, mssql: bool = False) -> Column:
    """F4 (sql_point, patchwork.py:591-605): WKT 'POINT(long lat)' at 5
    decimals; NULL if either coordinate is NULL."""
    fmt = "geography::Point(%.5f, %.5f, 4326)" if mssql else "POINT(%.5f %.5f)"
    args = (latitude, longitude) if mssql else (longitude, latitude)
    return F.when(
        longitude.isNotNull() & latitude.isNotNull(), F.format_string(fmt, *args)
    )


def domain_check(c: Column, valid_values: list[str], uppercase: bool = False) -> Column:
    """F6 (UFCleaner, patchwork.py:728-758) generalized: value must be in
    the domain, else NULL."""
    v = F.upper(c) if uppercase else c
    return F.when(v.isin(valid_values), v)


def uf_clean(c: Column) -> Column:
    return domain_check(F.trim(c), VALID_UFS, uppercase=True)


def text_crop(c: Column, size: int) -> Column:
    """F7 (TextCropperCleaner, patchwork.py:760-819): truncate to size-3
    + '...' when longer than size."""
    return F.when(F.length(c) > size, F.concat(F.substring(c, 1, size - 3), F.lit("..."))).otherwise(c)


def parse_iso_z(c: Column) -> Column:
    """F10 (string_formatting.py:30-42): GSheets ISO-with-Z timestamps."""
    return F.to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss.SSSX")


def last_day_of_month(c: Column) -> Column:
    """F11 (utils/date.py:111-122)."""
    return F.last_day(c)


def last_day_of_last_month(c: Column) -> Column:
    return F.last_day(F.add_months(c, -1))


def nullif_empty(c: Column) -> Column:
    """F13 (patchwork.py:222-227): '' -> NULL before numeric cast."""
    return F.nullif(c, F.lit(""))


def strip_chars(c: Column, chars: str) -> Column:
    """P7 (db_to_csv_operator.py:90-94): remove the given characters.
    Regex-escape into a character class."""
    cls = "[" + "".join("\\" + ch for ch in chars) + "]"
    return F.regexp_replace(c, cls, "")
