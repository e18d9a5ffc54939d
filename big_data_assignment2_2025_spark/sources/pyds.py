"""User-defined Python data source (Spark 4 ``pyspark.sql.datasource`` API).

``CalendarDataSource`` generates a deterministic date-dimension table —
the canonical "rows from thin air" source every warehouse needs (gap-fill
calendars, date spines). One input partition per month, so a year's read
runs as 12 parallel splits; at larger ranges the same pattern splits by
(year, month) and scales linearly with no storage at all.

This is the extension point for systems Spark lacks a built-in connector
for: the reader contract (name/schema/partitions/read) is identical
whether rows come from a generator, a REST API, or a proprietary store.
(No reference counterpart — the reference reads only HDFS text/parquet and
Cassandra, SURVEY.md §2.1.)
"""

from __future__ import annotations

import calendar
import datetime

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class CalendarReader(DataSourceReader):
    def __init__(self, options):
        self.year = int(options.get("year", 1995))

    def partitions(self):
        return [InputPartition(m) for m in range(1, 13)]

    def read(self, partition):
        y, m = self.year, partition.value
        for d in range(1, calendar.monthrange(y, m)[1] + 1):
            dt = datetime.date(y, m, d)
            yield (dt, y, m, d, dt.isoweekday(), dt.isoweekday() >= 6)


class CalendarDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "calendar"

    def schema(self) -> str:
        return (
            "day DATE, year INT, month INT, dom INT, isodow INT, "
            "is_weekend BOOLEAN"
        )

    def reader(self, schema) -> CalendarReader:
        return CalendarReader(self.options)
