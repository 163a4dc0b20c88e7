"""Scalar function surface (SURVEY §2.8 F1-F9).

Every Java utility in the reference maps to a built-in column expression —
zero Python UDFs, so all of these stay inside whole-stage codegen. The
helpers exist to pin the exact reference semantics (formats, rounding mode,
sentinels) in one place.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(ts: Column | str) -> Column:
    """Integer microseconds since the epoch, for TIMESTAMP and TIMESTAMP_NTZ
    alike.

    Parquet naive timestamps (isAdjustedToUTC=false, the driver testdata's
    encoding) read as TIMESTAMP_NTZ under Spark 4's NTZ inference, and
    ``unix_micros`` rejects that type outright. Casting to ``timestamp_ltz``
    first is a no-op for already-LTZ columns and interprets NTZ wall time in
    the session timezone — exact and engine-portable because the engine pins
    the session timezone to UTC (session.py / sources/catalog.py), matching
    DuckDB's naive-timestamp ``epoch_us``.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(c.cast("timestamp_ltz"))


def epoch_us_sql(col_sql: str) -> str:
    """SQL-text form of :func:`epoch_us` for ``F.expr`` call sites."""
    return f"unix_micros(cast({col_sql} as timestamp_ltz))"


def date_key(ts: Column) -> Column:
    """F4: DateUtils.formatDateKey — 'yyyyMMdd' (util/DateUtils.java:141-148)."""
    return F.date_format(ts, "yyyyMMdd")


def date_hour_key(ts: Column) -> Column:
    """F4: DateUtils.getDateHour — 'yyyy-MM-dd_HH' (util/DateUtils.java:~100)."""
    return F.date_format(ts, "yyyy-MM-dd_HH")


def time_minute_key(ts: Column) -> Column:
    """F4: DateUtils.formatTimeMinute — 'yyyyMMddHHmm' (streaming per-minute
    key, AdClickRealTimeSpark.java:734-735)."""
    return F.date_format(ts, "yyyyMMddHHmm")


def round_half_up(col: Column, scale: int = 2) -> Column:
    """F5: NumberUtils.formatDouble — BigDecimal HALF_UP to ``scale`` dp
    (util/NumberUtils.java:17-20). Spark's round() is HALF_UP — identical."""
    return F.round(col, scale)


def null_sentinel(col: Column, sentinel: int = -1) -> Column:
    """P8: the reference's `row.getAs(i)==null ? -1 : ...` projection
    (UserVisitSessionAnalyzeSpark.java:997-998)."""
    return F.coalesce(col, F.lit(sentinel))


def parse_packed(col: Column) -> Column:
    """F1: read a legacy `k=v|k=v` packed string into a map — boundary
    compatibility only (util/StringUtils.java:61-79); inside the engine these
    are real columns and this function must never appear in a hot path."""
    return F.str_to_map(col, F.lit(r"\|"), F.lit("="))


def trim_comma(col: Column) -> Column:
    """F2: StringUtils.trimComma (util/StringUtils.java:31-41)."""
    return F.regexp_replace(col, "^,|,$", "")


def zero_pad(col: Column, width: int = 2) -> Column:
    """F2: StringUtils.fulfuill zero-padding (util/StringUtils.java:46-52)."""
    return F.lpad(col.cast("string"), width, "0")


def json_field(col: Column, field: str) -> Column:
    """F6: get_json_object(extend_info, '$.field')
    (AreaTop3ProductSpark.java:453)."""
    return F.get_json_object(col, f"$.{field}")
