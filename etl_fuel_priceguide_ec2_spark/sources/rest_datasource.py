"""S2/S3 at scale — a Spark 4 Python Data Source for the station REST
API.

``rest.py`` covers the driver-side list fetch + mapInPandas fan-out;
this module is the full-fidelity form: a ``DataSource`` whose reader
PARTITIONS the id keyspace, so the per-key detail fetches
(``index.js:112-116``, the reference's sequential bottleneck) execute as
N_partitions parallel executor tasks with connection reuse inside each
task. Registered like any source:

    spark.dataSource.register(FuelStationDataSource)
    df = (spark.read.format("fuelstations")
          .option("endpoint", "mock://stations")
          .option("num_stations", "200")
          .option("num_partitions", "8")
          .load())

Transport is resolved from the endpoint scheme; the ``mock://`` scheme
generates deterministic station records in-process (no network in this
environment) while ``https://`` would use urllib — partitioning,
schema, and row semantics are identical either way, which is exactly
the part Spark sees.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATION_SCHEMA = StructType(
    [
        StructField("Codigo", LongType(), False),
        StructField("Nome", StringType(), True),
        StructField("Marca", StringType(), True),
        StructField("Preco", DoubleType(), True),
    ]
)


def _mock_detail(key: int) -> str:
    """Deterministic fake detail response (stands in for
    GET ENDPOINT_02 + id, index.js:114)."""
    return json.dumps(
        {
            "Codigo": key,
            "Nome": f"station {key}",
            "Marca": f"brand{key % 5}",
            "Preco": round(1.5 + (key % 40) / 100.0, 2),
        }
    )


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _StationReader(DataSourceReader):
    def __init__(self, options: dict):
        self.endpoint = options.get("endpoint", "mock://stations")
        self.n = int(options.get("num_stations", "100"))
        self.num_partitions = int(options.get("num_partitions", "8"))

    def partitions(self):
        per = max(1, self.n // self.num_partitions)
        return [
            _IdRange(i, min(i + per, self.n)) for i in range(0, self.n, per)
        ]

    def read(self, partition: _IdRange) -> Iterator[tuple]:
        # one task per id-range: this loop is the reference's sequential
        # for-loop, now running num_partitions-wide on executors
        for key in range(partition.start, partition.end):
            if self.endpoint.startswith("mock://"):
                body = _mock_detail(key)
            else:  # pragma: no cover — no network in this environment
                from urllib.request import urlopen

                body = urlopen(f"{self.endpoint}{key}").read().decode()
            try:
                row = json.loads(body)
                yield (row["Codigo"], row.get("Nome"), row.get("Marca"), row.get("Preco"))
            except Exception:
                continue  # P6: bad row skipped, never fatal (index.js:137-140)


class FuelStationDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fuelstations"

    def schema(self) -> StructType:
        return STATION_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _StationReader(self.options)


TICK_SCHEMA = StructType(
    [
        StructField("tick", LongType(), False),
        StructField("Codigo", LongType(), False),
        StructField("Preco", DoubleType(), True),
    ]
)


def _tick_price(tick: int, key: int) -> float:
    """Deterministic per-(run, station) price — replayable from the
    offset alone, which is what makes readBetweenOffsets exact."""
    return round(1.5 + (key % 40) / 100.0 + (tick % 7) / 1000.0, 3)


class _TickStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the reference's scheduled re-run: each
    micro-batch is one "ETL run" (index.js appends one timestamped
    snapshot per run; here each offset step emits one price tick per
    station). Offsets are plain dicts; replay between any two offsets
    regenerates identical rows, so the source supports exactly-once
    recovery from the checkpoint with no external state."""

    def __init__(self, options: dict):
        self.n = int(options.get("num_stations", "50"))
        self.ticks_per_batch = int(options.get("ticks_per_batch", "1"))
        self.max_ticks = int(options.get("max_ticks", "0"))  # 0 = unbounded

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def read(self, start: dict):
        t0 = start["tick"]
        if self.max_ticks and t0 >= self.max_ticks:
            return [], {"tick": t0}
        t1 = t0 + self.ticks_per_batch
        if self.max_ticks:
            t1 = min(t1, self.max_ticks)
        return self._rows(t0, t1), {"tick": t1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["tick"], end["tick"])

    def _rows(self, t0: int, t1: int) -> list[tuple]:
        # concrete list, not a generator — prefetched rows are pickled
        # between the driver-side prefetcher and the planner
        return [
            (t, key, _tick_price(t, key))
            for t in range(t0, t1)
            for key in range(self.n)
        ]


class FuelPriceTickStream(DataSource):
    """spark.readStream.format("fuelpriceticks") — deterministic price
    tick stream over the station keyspace."""

    @classmethod
    def name(cls) -> str:
        return "fuelpriceticks"

    def schema(self) -> StructType:
        return TICK_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _TickStreamReader(self.options)
