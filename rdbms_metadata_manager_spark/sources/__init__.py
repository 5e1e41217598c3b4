from .pg_catalog import PgCatalogDataSource, read_pg_catalog
from .pyds import (
    CatalogFixtureDataSource,
    TickStreamDataSource,
    read_catalog_fixture,
    read_tick_stream,
)

__all__ = [
    "CatalogFixtureDataSource",
    "PgCatalogDataSource",
    "TickStreamDataSource",
    "read_catalog_fixture",
    "read_pg_catalog",
    "read_tick_stream",
]
