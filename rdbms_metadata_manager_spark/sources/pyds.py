"""Spark 4 Python DataSource serving the metadata-catalog fixtures.

The reference reaches its catalog through a SQLAlchemy engine
(`/root/reference/app.py:27-35`); the Spark-native equivalent of "a
pluggable place rows come from" is the DataSource V2 API, exposed to
Python in Spark 4 as ``pyspark.sql.datasource``. This module
implements it for the same catalog surface the JDBC reader and the
in-memory fixtures already provide, so the engine demonstrates all
three source shapes Spark supports:

- JDBC relation  (``catalog/jdbc_source.py`` — live databases),
- in-memory rows (``catalog/fixtures.py`` — tests/offline),
- **custom DataSource** (this file — any bespoke catalog protocol).

The reader is partition-aware the way a real catalog source must be:
``partitions()`` returns one ``InputPartition`` per *table*, and each
``read(partition)`` emits only that table's rows — Spark schedules
the partitions across executors, so a catalog with 10⁵ tables scans
in parallel instead of through one driver loop (the N+1 trap the
reference fell into; SURVEY.md §2.3(1)). Each partition re-derives
its rows from the module-level fixture tuples: the class ships no
row payloads to executors, only the partition key — exactly how a
real implementation would carry a connection string + table id.

Registration is per-session (``spark.dataSource.register``);
``read_catalog_fixture`` wraps register + read + option plumbing.
Options: ``face`` = columns|indexes|foreign_keys, ``dataset`` =
ecommerce|quirks.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from ..catalog import fixtures, schemas

_FACES = {
    "columns": ("ECOMMERCE_COLUMNS", "QUIRKS_COLUMNS", schemas.COLUMNS_META_SCHEMA),
    "indexes": ("ECOMMERCE_INDEXES", "QUIRKS_INDEXES", schemas.INDEXES_META_SCHEMA),
    "foreign_keys": (
        "ECOMMERCE_FOREIGN_KEYS",
        "QUIRKS_FOREIGN_KEYS",
        schemas.FOREIGN_KEYS_META_SCHEMA,
    ),
}


def _rows(face: str, dataset: str) -> Sequence[tuple]:
    ecom_attr, quirks_attr, _ = _FACES[face]
    attr = ecom_attr if dataset == "ecommerce" else quirks_attr
    return getattr(fixtures, attr)


class _TablePartition(InputPartition):
    def __init__(self, table_name: str):
        self.table_name = table_name


class _CatalogFixtureReader(DataSourceReader):
    def __init__(self, face: str, dataset: str):
        self.face = face
        self.dataset = dataset

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per table: the unit a real catalog protocol
        # can fetch independently (and the unit of scan parallelism)
        tables = sorted({r[1] for r in _rows(self.face, self.dataset)})
        return [_TablePartition(t) for t in tables]

    def read(self, partition: _TablePartition) -> Iterator[tuple]:
        for r in _rows(self.face, self.dataset):
            if r[1] == partition.table_name:
                yield r


class CatalogFixtureDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "catalog_fixture"

    def schema(self) -> StructType:
        face = self.options.get("face", "columns")
        if face not in _FACES:
            raise ValueError(f"unknown face {face!r}; one of {sorted(_FACES)}")
        return _FACES[face][2]

    def reader(self, schema: StructType) -> DataSourceReader:
        face = self.options.get("face", "columns")
        dataset = self.options.get("dataset", "ecommerce")
        if dataset not in ("ecommerce", "quirks"):
            raise ValueError(f"unknown dataset {dataset!r}")
        return _CatalogFixtureReader(face, dataset)


def read_catalog_fixture(
    spark: SparkSession, face: str = "columns", dataset: str = "ecommerce"
) -> DataFrame:
    spark.dataSource.register(CatalogFixtureDataSource)
    return (
        spark.read.format("catalog_fixture").option("face", face).option("dataset", dataset).load()
    )
