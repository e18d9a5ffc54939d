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


class TickSimpleReader:
    """Deterministic offset-based tick stream (see TickStreamDataSource)."""

    def __init__(self, options):
        self.batch = int(options.get("rowsPerBatch", 5))

    def initialOffset(self):
        return {"n": 0}

    def read(self, start):
        n = int(start["n"])
        rows = [(i, i % 7) for i in range(n, n + self.batch)]
        return iter(rows), {"n": n + self.batch}

    def readBetweenOffsets(self, start, end):
        # deterministic replay between committed offsets — this is what
        # makes restart recovery exactly-once for a generator source
        return iter([(i, i % 7) for i in range(int(start["n"]), int(end["n"]))])

    def commit(self, end):
        pass


def _tick_stream_classes():
    """Deferred import: pyspark.sql.datasource streaming ABCs exist only on
    Spark 4+; keep module import safe everywhere."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    # TickSimpleReader FIRST in the MRO: the ABC's raise-NotImplemented
    # defaults must not shadow the mixin's implementations
    class _Reader(TickSimpleReader, SimpleDataSourceStreamReader):
        def __init__(self, options):
            TickSimpleReader.__init__(self, options)

    class TickStreamDataSource(DataSource):
        """User-defined STREAMING Python data source (Spark 4
        ``SimpleDataSourceStreamReader``): a monotone tick generator with
        dict offsets. The contract demonstrated: ``initialOffset`` →
        ``read(start) -> (rows, nextOffset)`` per micro-batch, and
        ``readBetweenOffsets`` for deterministic committed-range replay
        after a restart. The simple-reader variant executes reads on the
        driver and is the right fit for low-volume control/metadata
        streams (config pushes, heartbeat ticks, polling a REST API);
        high-volume sources implement the partitioned streamReader
        instead."""

        @classmethod
        def name(cls):
            return "tickstream"

        def schema(self):
            return "tick BIGINT, bucket BIGINT"

        def simpleStreamReader(self, schema):
            return _Reader(self.options)

    return TickStreamDataSource


def register_tick_stream(spark) -> None:
    spark.dataSource.register(_tick_stream_classes())
