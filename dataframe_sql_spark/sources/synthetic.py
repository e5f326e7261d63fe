"""Custom Python DataSource: partition-parallel deterministic synthetic
events (Spark 4 ``pyspark.sql.datasource`` API).

Why a generator source at all: scale testing. At 100 TB you cannot
stage test inputs through the filesystem first — a source that
*generates* its partitions directly on the executors produces any
volume with zero I/O, and deterministically (seed + partition index),
so two runs of the same job see identical data on every executor.

Extension surface relative to the reference, which has exactly one
ingestion path (pandas ``read_csv`` fixtures registered as tables —
``/root/reference/dataframe_sql/tests/utils.py:15-19``); SURVEY.md
§2.1 S4.

Each partition yields Arrow RecordBatches (vectorized, no per-row
Python), sized by ``batch_rows`` so executor memory stays bounded
regardless of ``rows``.

Usage::

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows", 100_000).option("partitions", 32)
          .option("seed", 7).load())
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

__all__ = ["SyntheticEventsDataSource", "register_synthetic_source"]

_EVENT_TYPES = np.array(["click", "view", "purchase", "signup", "error"])
_BASE_EPOCH_S = 1_704_067_200  # 2024-01-01 00:00:00 UTC
_SPAN_S = 30 * 24 * 3600


class _GenPartition(InputPartition):
    def __init__(self, index: int, start_row: int, n_rows: int, seed: int, batch_rows: int):
        self.index = index
        self.start_row = start_row
        self.n_rows = n_rows
        self.seed = seed
        self.batch_rows = batch_rows


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("users", max(1, self.rows // 10)))
        self.batch_rows = int(options.get("batch_rows", 100_000))

    def partitions(self):
        base, rem = divmod(self.rows, self.n_partitions)
        parts, start = [], 0
        for i in range(self.n_partitions):
            n = base + (1 if i < rem else 0)
            parts.append(_GenPartition(i, start, n, self.seed, self.batch_rows))
            start += n
        return parts

    def read(self, partition: _GenPartition):
        # independent deterministic stream per partition: same (seed,
        # index) → same rows on any executor, any cluster size
        rng = np.random.default_rng((partition.seed, partition.index))
        remaining, row0 = partition.n_rows, partition.start_row
        while remaining > 0:
            n = min(remaining, partition.batch_rows)
            event_id = np.arange(row0, row0 + n, dtype=np.int64)
            ts_us = (
                (_BASE_EPOCH_S + rng.uniform(0, _SPAN_S, n)) * 1_000_000
            ).astype(np.int64)
            yield pa.record_batch(
                {
                    "event_id": pa.array(event_id),
                    "ts": pa.array(ts_us, pa.timestamp("us")),
                    "user_id": pa.array(
                        rng.integers(0, self.n_users, n, dtype=np.int64)
                    ),
                    "event_type": pa.array(
                        _EVENT_TYPES[rng.integers(0, len(_EVENT_TYPES), n)]
                    ),
                    "value": pa.array(np.round(rng.exponential(50.0, n), 2)),
                }
            )
            remaining -= n
            row0 += n


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


# --------------------------------------------------------------------------
# streaming half: the same deterministic generator as an unbounded
# micro-batch source (offset = absolute row position)
# --------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class _SyntheticEventsStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))
        self.n_partitions = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("users", 100))
        self.batch_rows = int(options.get("batch_rows", 100_000))

    def initialOffset(self):
        return {"row": 0}

    def latestOffset(self):
        # one fixed-size batch per trigger; unbounded like a queue that
        # always has rows_per_batch more available
        self._latest = getattr(self, "_latest", 0) + self.rows_per_batch
        return {"row": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["row"], end["row"]
        total = hi - lo
        base, rem = divmod(total, self.n_partitions)
        parts, cursor = [], lo
        for i in range(self.n_partitions):
            n = base + (1 if i < rem else 0)
            if n:
                # partition index derives from the absolute row range so
                # re-reading the same offset range regenerates identical
                # data (replay after failure = exactly the same batch)
                parts.append(
                    _GenPartition(cursor, cursor, n, self.seed, self.batch_rows)
                )
                cursor += n
        return parts

    def read(self, partition: _GenPartition):
        yield from _SyntheticEventsReader.read(self, partition)  # type: ignore[arg-type]

    def commit(self, end: dict) -> None:
        pass


def _stream_reader(self, schema):
    return _SyntheticEventsStreamReader(self.options)


SyntheticEventsDataSource.streamReader = _stream_reader
