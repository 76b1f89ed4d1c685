"""Date/time scalar functions (reference: DateHelper.java:17-98).

All are thin, composable wrappers over built-in Catalyst expressions
(SURVEY §2.7 F10-F14) — zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DateHelper.java:17 default pattern yyyy-MM-dd HH:mm:ss.SSS
DEFAULT_PATTERN = "yyyy-MM-dd HH:mm:ss.SSS"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_ts(col: Column | str, pattern: str = DEFAULT_PATTERN) -> Column:
    """String -> timestamp with an explicit pattern (DateHelper.java:17-29)."""
    return F.to_timestamp(_c(col), pattern)


def offset_days(col: Column | str, n: int) -> Column:
    """±days (DateHelper.java:39-42)."""
    return F.date_add(_c(col), n)


def offset_months(col: Column | str, n: int) -> Column:
    """±months (DateHelper.java:44-47)."""
    return F.add_months(_c(col), n)


def day_start(col: Column | str) -> Column:
    """Truncate to 00:00:00 (DateHelper.java:55-61)."""
    return F.date_trunc("day", _c(col))


def day_end(col: Column | str) -> Column:
    """23:59:59 of the same day (DateHelper.java:63-69)."""
    return day_start(col) + F.expr("INTERVAL 1 DAY") - F.expr("INTERVAL 1 SECOND")


def date_str(col: Column | str) -> Column:
    """Format as yyyy-MM-dd (DateHelper.java:76-79)."""
    return F.date_format(_c(col), "yyyy-MM-dd")


def epoch_millis(col: Column | str) -> Column:
    """Epoch milliseconds at UTC midnight of the DATE
    (DateHelper.java:93-94 is a day-granularity helper).

    ``unix_date`` counts days timezone-free; the previous
    ``unix_millis(cast('timestamp'))`` interpreted midnight in the
    SESSION timezone, so the same date produced different epochs on
    differently-configured sessions (caught by the vanilla-session
    oracle run under America/New_York).
    """
    return F.unix_date(_c(col).cast("date")).cast("long") * 86400000
