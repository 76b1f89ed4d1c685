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
    """Naive-UTC epoch milliseconds (DateHelper.java:93-94): the wall
    clock is read AS IF it were UTC, independent of the session
    timezone.

    Timezone-free by construction: days via ``unix_date`` plus tz-free
    field extraction of the time of day. DATE inputs give midnight;
    TIMESTAMP_NTZ keeps full millisecond precision. (The previous
    ``unix_millis(cast('timestamp'))`` interpreted the wall clock in
    the SESSION timezone — caught by the vanilla-session oracle run
    under America/New_York.) A with-timezone TIMESTAMP input is first
    converted to its session-tz wall clock by the NTZ cast — pass NTZ
    or DATE for fully session-independent results.
    """
    t = _c(col).cast("timestamp_ntz")
    return (
        F.unix_date(t.cast("date")).cast("long") * 86400000
        + F.hour(t).cast("long") * 3600000
        + F.minute(t).cast("long") * 60000
        + F.second(t).cast("long") * 1000
        + F.date_format(t, "SSS").cast("long")
    )
