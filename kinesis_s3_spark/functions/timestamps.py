"""Enriched-event collector timestamp extraction (reference O7).

The reference splits an enriched-event TSV on tabs, takes field index
3 (``collector_tstamp``, the only field it ever parses —
monitoring/StatsD.scala:19), and parses ``yyyy-MM-dd HH:mm:ss[.SSS]``
as UTC (Common.scala:88-96 does ``replaceAll(" ", "T") + "Z"``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

COLLECTOR_TSTAMP_IDX = 3  # StatsD.scala:19


def collector_tstamp_col(tsv_line: Column) -> Column:
    """Parse the collector timestamp out of a TSV line column.
    Returns NULL (the Either.Left analogue) when the field is missing
    or unparseable — callers treat NULL as the failure branch."""
    # element_at via get(): short lines → NULL, not an ANSI index error
    field = F.get(F.split(tsv_line, "\t"), COLLECTOR_TSTAMP_IDX)
    # try_to_timestamp: unparseable → NULL instead of ANSI error — the
    # Either.Left branch of Common.getTstamp. The pattern-less fallback
    # accepts fractional seconds ("2020-11-26 00:01:05.123"), matching
    # the reference's Instant.parse of "[.SSS]" payloads.
    return F.coalesce(
        F.try_to_timestamp(field, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(field),
    )
