from .pyds import CatalogFixtureDataSource, read_catalog_fixture

__all__ = ["CatalogFixtureDataSource", "read_catalog_fixture"]
