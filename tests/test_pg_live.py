"""Live-PostgreSQL integration test for the reference's primary mode.

The reference's main workflow is: connect to a live database, reflect
its catalog, run the 5 rules (reference app.py:123-125). This test
provisions a REAL PostgreSQL server (binaries ship in this container;
initdb + pg_ctl in a temp dir, unix socket, trust auth), creates the
ecommerce_db scenario with actual DDL, reads the catalog back through
``catalog.pg_live`` (same SQL text as the JDBC reader), runs
``detect_schema_flaws``, and checks it two ways:

1. engine-vs-oracle: the DuckDB rules oracle rendered from the SAME
   live-read tuples must match the Spark output row for row;
2. scenario parity: the (table, column, rule_id) hit set must equal
   the MySQL-flavored fixture's set plus exactly the two Rule-4 rows
   PostgreSQL necessarily adds (pg has no DATETIME type, so
   ``order_date TIMESTAMP`` mismatches the expected 'DATETIME' —
   SQLAlchemy reflection on pg gives the reference the same result).

Skips (cleanly) when server binaries or the postgres user are absent.
"""

from __future__ import annotations

import os
import pwd
import shutil
import subprocess
import tempfile
import time

import pytest

from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.catalog import fixtures, pg_live
from rdbms_metadata_manager_spark.queries.metadata import _rules_oracle_sql
from rdbms_metadata_manager_spark.rules import detect_schema_flaws

DDL = """
CREATE TABLE "Users" (
  user_id integer PRIMARY KEY,
  username varchar(255),
  email varchar(100)
);
CREATE UNIQUE INDEX uq_users_email ON "Users"(email);
CREATE TABLE "Products" (
  product_id integer PRIMARY KEY,
  product_name varchar(255),
  price double precision,
  created_at date NOT NULL
);
CREATE TABLE "Orders" (
  order_id integer PRIMARY KEY,
  user_id integer NOT NULL REFERENCES "Users"(user_id),
  order_date timestamp,
  total_amount numeric(10,2)
);
CREATE INDEX ix_orders_user ON "Orders"(user_id);
CREATE TABLE "Order_Items" (
  item_id integer PRIMARY KEY,
  order_id integer NOT NULL REFERENCES "Orders"(order_id),
  product_id integer NOT NULL REFERENCES "Products"(product_id),
  price double precision
);
CREATE INDEX ix_oi_order ON "Order_Items"(order_id);
CREATE INDEX ix_oi_product ON "Order_Items"(product_id);
CREATE TABLE "Reviews" (
  review_id integer PRIMARY KEY,
  user_id integer NOT NULL REFERENCES "Users"(user_id),
  product_id integer NOT NULL REFERENCES "Products"(product_id),
  rating smallint
);
CREATE INDEX ix_rev_user ON "Reviews"(user_id);
CREATE INDEX ix_rev_product ON "Reviews"(product_id);
CREATE TABLE orders_teste (
  order_id integer PRIMARY KEY,
  user_id integer NOT NULL,
  order_date timestamp,
  total_amount numeric(10,2)
);
CREATE TABLE users_teste (
  id integer PRIMARY KEY,
  username varchar(255),
  email varchar(255)
);
-- composite-FK quirk table (reference app.py:35 keeps only
-- constrained_columns[0]) so the live path also exercises
-- group_foreign_keys' ordered-array collapse
CREATE TABLE warehouse_bins (
  warehouse_id integer,
  bin_id integer,
  PRIMARY KEY (warehouse_id, bin_id)
);
CREATE TABLE shipments (
  shipment_id integer PRIMARY KEY,
  warehouse_id integer NOT NULL,
  bin_id integer NOT NULL,
  FOREIGN KEY (warehouse_id, bin_id) REFERENCES warehouse_bins (warehouse_id, bin_id)
);
CREATE INDEX ix_ship_wh ON shipments(warehouse_id);
-- PostgreSQL constraint names are unique only PER TABLE: these two
-- same-named FKs cross-join under an information_schema name join
-- (the bug the pg_constraint-based FK query exists to avoid)
CREATE TABLE dup_a (
  id integer PRIMARY KEY,
  ref_id integer NOT NULL,
  CONSTRAINT fk_dup FOREIGN KEY (ref_id) REFERENCES "Users"(user_id)
);
CREATE TABLE dup_b (
  id integer PRIMARY KEY,
  ref_id integer NOT NULL,
  CONSTRAINT fk_dup FOREIGN KEY (ref_id) REFERENCES "Products"(product_id)
);
-- PK-name ambiguity: a same-named table in ANOTHER schema whose PK
-- constraint carries the same name as public."Users"'s auto-named
-- "Users_pkey", but on a DIFFERENT column. A PK subquery joined on
-- constraint_name alone would (a) duplicate public rows through the
-- tc x kcu cross-match and (b) mark public.Users.username as a
-- primary key it does not have.
CREATE SCHEMA backup;
CREATE TABLE backup."Users" (
  user_id integer,
  username varchar(255) CONSTRAINT "Users_pkey" PRIMARY KEY
);
-- views expose columns but can never expose indexes: auditing them
-- would fire false Rule-1 hits the reference (tables-only
-- reflection) never reports
CREATE VIEW v_users_export AS SELECT username, email FROM "Users";
-- partitioned table: its index lives on relkind 'p'/'I' relations,
-- so an index face restricted to relkind='r' would go blind on it
CREATE TABLE part_events (
  id integer,
  note varchar(300) NOT NULL,
  PRIMARY KEY (id)
) PARTITION BY RANGE (id);
CREATE INDEX ix_part_note ON part_events(note);
CREATE TABLE part_events_p0 PARTITION OF part_events FOR VALUES FROM (0) TO (100);
"""


def _have_pg() -> bool:
    if not all(shutil.which(b) for b in ("initdb", "pg_ctl", "psql")):
        return False
    if os.geteuid() == 0:
        try:
            pwd.getpwnam("postgres")
        except KeyError:
            return False
        return shutil.which("runuser") is not None
    return True


pytestmark = pytest.mark.skipif(not _have_pg(), reason="PostgreSQL server binaries not available")


def _as_pg(args: list[str]) -> list[str]:
    if os.geteuid() == 0:
        return ["runuser", "-u", "postgres", "--", *args]
    return args


@pytest.fixture(scope="module")
def pg_host():
    """initdb + start a throwaway server; yield its socket dir."""
    root = tempfile.mkdtemp(prefix="pg_live_")
    data, sock = os.path.join(root, "data"), os.path.join(root, "sock")
    os.makedirs(data)
    os.makedirs(sock)
    if os.geteuid() == 0:
        pg = pwd.getpwnam("postgres")
        os.chmod(root, 0o755)
        for p in (root, data, sock):
            os.chown(p, pg.pw_uid, pg.pw_gid)
    try:
        subprocess.run(
            _as_pg(["initdb", "-D", data, "-A", "trust", "-U", "postgres"]),
            check=True, capture_output=True,
        )
        subprocess.run(
            _as_pg([
                "pg_ctl", "-D", data, "-w",
                "-o", f"-c listen_addresses='' -c unix_socket_directories={sock}",
                "-l", os.path.join(root, "log"), "start",
            ]),
            check=True, capture_output=True,
        )
        for _ in range(50):
            r = subprocess.run(["psql", "-h", sock, "-U", "postgres", "-c", "select 1"],
                               capture_output=True)
            if r.returncode == 0:
                break
            time.sleep(0.2)
        else:
            pytest.skip("postgres failed to accept connections")
        subprocess.run(["psql", "-h", sock, "-U", "postgres", "-X", "-q",
                        "-c", "CREATE DATABASE ecommerce_db"], check=True, capture_output=True)
        subprocess.run(["psql", "-h", sock, "-U", "postgres", "-d", "ecommerce_db", "-X", "-q",
                        "-v", "ON_ERROR_STOP=1", "-c", DDL], check=True, capture_output=True)
        yield sock
    finally:
        subprocess.run(_as_pg(["pg_ctl", "-D", data, "-m", "immediate", "stop"]),
                       capture_output=True)
        shutil.rmtree(root, ignore_errors=True)


@pytest.fixture(scope="module")
def live_catalog(spark, pg_host):
    return pg_live.read_catalog_live(spark, "ecommerce_db", pg_host)


def test_live_columns_contract(live_catalog):
    cols, _, _ = live_catalog
    collected = cols.collect()
    rows = {(r.table_name, r.column_name): r for r in collected}
    # 26 ecommerce columns + 2 warehouse_bins + 3 shipments + 4 dup_a/b
    # + 2 part_events + 2 part_events_p0; the backup-schema table and
    # the view contribute nothing
    assert len(rows) == 39
    # no duplicates: the same-named "Users_pkey" in the backup schema
    # must not cross-match public rows through the PK subquery
    assert len(collected) == len(rows)
    assert not rows[("Users", "username")].is_primary_key
    assert "v_users_export" not in {t for t, _ in rows}
    r = rows[("Users", "email")]
    assert (r.data_type, r.char_max_length, r.is_nullable, r.is_primary_key) == ("VARCHAR", 100, True, False)
    assert rows[("Orders", "total_amount")].data_type == "NUMERIC"
    assert rows[("Orders", "order_date")].data_type == "TIMESTAMP"
    assert rows[("Products", "price")].data_type == "FLOAT"
    assert rows[("Reviews", "rating")].data_type == "SMALLINT"
    assert rows[("Users", "user_id")].is_primary_key
    assert rows[("Users", "user_id")].is_unique is None


def test_live_indexes_and_composite_fk(live_catalog):
    _, idx, fks = live_catalog
    idx_rows = {(r.table_name, r.index_name): r for r in idx.collect()}
    assert idx_rows[("Users", "uq_users_email")].is_unique
    assert not idx_rows[("Orders", "ix_orders_user")].is_unique
    assert all(r.table_name not in ("pg_class", "pg_attribute") for r in idx_rows.values())
    # partitioned parent's index (relkind 'p') and the auto-created
    # child index on its partition are both visible
    assert ("part_events", "ix_part_note") in idx_rows
    assert any(t == "part_events_p0" and r.column_name == "note"
               for (t, _n), r in idx_rows.items())
    fk_rows = {(r.table_name, r.constraint_name): r for r in fks.collect()}
    comps = [r for (t, _n), r in fk_rows.items() if t == "shipments"]
    assert len(comps) == 1
    comp = comps[0]
    assert comp.constrained_columns == ["warehouse_id", "bin_id"]
    assert comp.referred_columns == ["warehouse_id", "bin_id"]
    assert comp.referred_table == "warehouse_bins"
    # same-named constraints on different tables must NOT cross-join:
    # each resolves to exactly its own single column and parent
    da = fk_rows[("dup_a", "fk_dup")]
    db = fk_rows[("dup_b", "fk_dup")]
    assert (da.constrained_columns, da.referred_table, da.referred_columns) == (
        ["ref_id"], "Users", ["user_id"])
    assert (db.constrained_columns, db.referred_table, db.referred_columns) == (
        ["ref_id"], "Products", ["product_id"])


def test_transport_distinguishes_null_from_backslash_n(pg_host):
    """COPY text format keeps SQL NULL apart from the literal
    two-character string '\\N' and round-trips tabs/newlines."""
    rows = pg_live.run_sql(
        r"SELECT NULL, '\N', 'a' || chr(9) || 'b', 'x' || chr(10) || 'y', ''",
        "ecommerce_db",
        pg_host,
    )
    assert rows == [[None, "\\N", "a\tb", "x\ny", ""]]


def test_live_rules_match_duckdb_oracle(spark, live_catalog):
    """Engine-vs-oracle over the LIVE rows: render the rules oracle
    from the tuples just read out of PostgreSQL and compare in full."""
    import duckdb

    cols, idx, fks = live_catalog
    col_t = [tuple(r) for r in cols.collect()]
    idx_t = [tuple(r) for r in idx.collect()]
    fk_t = [tuple(r) for r in fks.collect()]

    got = [tuple(r) for r in detect_schema_flaws(cols, idx, fks).drop("rule_id").collect()]
    want = [tuple(r)[:-1] for r in duckdb.connect().execute(
        _rules_oracle_sql(col_t, idx_t, fk_t)).fetchall()]
    assert sorted(got) == sorted(want)
    assert len(got) >= 19


def test_live_scenario_matches_fixture(spark, live_catalog):
    """The live DDL reproduces the reference scenario: same rule hits
    as the MySQL-flavored fixture, plus exactly the deltas PostgreSQL's
    type system forces (no DATETIME → Rule 4 fires on order_date) and
    the quirks composite-FK table carried in the same database."""
    cols, idx, fks = live_catalog
    live = {
        (r.table, r.column, r.rule_id)
        for r in detect_schema_flaws(cols, idx, fks).collect()
    }
    fixture = {
        (r.table, r.column, r.rule_id)
        for r in detect_schema_flaws(
            fixtures.columns_meta(spark, "ecommerce_db"),
            fixtures.indexes_meta(spark, "ecommerce_db"),
            fixtures.foreign_keys_meta(spark, "ecommerce_db"),
        ).collect()
    }
    expected_extra = {
        ("Orders", "order_date", 4),
        ("orders_teste", "order_date", 4),
        # composite-FK quirk: app.py:35 keeps constrained_columns[0]
        # only, so the FK's tail column stays uncovered (the fixture
        # pins the same behavior in quirks_db); warehouse_bins' own
        # id-columns are its PK, so Rule 2 skips them
        ("shipments", "bin_id", 2),
    }
    assert live - fixture == expected_extra
    assert fixture - live == set()


def test_cli_main_runs_against_live_postgres(spark, pg_host, capsys, monkeypatch):
    """The reference's primary UX — `python app.py` against a live
    database (reference app.py:122-137, README.md:43-50) — end to
    end: DB_URL routes to the live reader, the report prints the
    5-line blocks."""
    from rdbms_metadata_manager_spark.__main__ import main

    monkeypatch.setenv("DB_URL", f"psql:///ecommerce_db?host={pg_host}")
    monkeypatch.setenv("EXPORT_TO_CSV", "NO")
    assert main() == 0
    out = capsys.readouterr().out
    assert "Issue Type: Query performance - missing index" in out
    assert "Critical column 'email' allows NULL values." in out
    # pg's DATETIME-less type system adds the two order_date Rule-4
    # rows and the composite-FK table adds one Rule-2 row on top of
    # the fixture's 18-issue golden set: 18 + 3
    assert out.count("Issue Type:") == 21


def test_pg_catalog_datasource_matches_driver_side_read(spark, pg_host, live_catalog):
    """The DataSource scan path (executors run the hash-bucketed
    catalog query) must produce exactly the rows the driver-side
    psql read does, for every face — including the grouped FK
    contract — and must actually split the scan across partitions."""
    from rdbms_metadata_manager_spark.sources import read_pg_catalog

    cols, idx, fks = live_catalog
    ds_cols = read_pg_catalog(spark, "columns", "ecommerce_db", pg_host)
    ds_idx = read_pg_catalog(spark, "indexes", "ecommerce_db", pg_host)
    ds_fks = read_pg_catalog(spark, "foreign_keys", "ecommerce_db", pg_host)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(ds_cols) == rows(cols)
    assert rows(ds_idx) == rows(idx)
    assert rows(ds_fks) == rows(fks)
    assert ds_cols.rdd.getNumPartitions() == 4
    # buckets partition the catalog: each table's rows land in one
    # bucket and the buckets are collectively exhaustive (row counts
    # already proven equal above)
    per_part = ds_cols.select("table_name").rdd.mapPartitions(
        lambda it: [set(r.table_name for r in it)]
    ).collect()
    seen = [t for s in per_part for t in s]
    assert len(seen) == len(set(seen))


def test_pg_catalog_datasource_filter_pushdown(spark, pg_host, live_catalog):
    """Spark 4.1 PyDS pushFilters: an EqualTo/In on table_name must
    (a) return exactly the Spark-side-filtered rows — correctness of
    the WHERE rendering, including quote escaping — and (b) actually
    reach the reader (asserted through the reader API directly, since
    the scan re-checks pushed filters Spark-side by design)."""
    from pyspark.sql.datasource import EqualTo, In, IsNull

    from rdbms_metadata_manager_spark.sources import read_pg_catalog
    from rdbms_metadata_manager_spark.sources.pg_catalog import _PgCatalogReader

    cols, _, _ = live_catalog
    base = read_pg_catalog(spark, "columns", "ecommerce_db", pg_host)

    got_eq = base.filter(F.col("table_name") == "Products")
    want_eq = sorted(tuple(r) for r in cols.collect() if r["table_name"] == "Products")
    assert sorted(tuple(r) for r in got_eq.collect()) == want_eq and want_eq

    got_in = base.filter(F.col("table_name").isin("Products", "Users"))
    want_in = sorted(
        tuple(r) for r in cols.collect() if r["table_name"] in ("Products", "Users")
    )
    assert sorted(tuple(r) for r in got_in.collect()) == want_in

    # reader-level contract: supported filters render to conjuncts,
    # unsupported ones pass through untouched; everything is returned
    r = _PgCatalogReader("columns", "ecommerce_db", pg_host, 2)
    fs = [
        EqualTo(("table_name",), "it's"),          # escaping
        In(("table_name",), ("Products", "Users")),
        EqualTo(("no_such_col",), "x"),            # not in schema
        IsNull(("table_name",)),                   # unsupported class
    ]
    back = list(r.pushFilters(fs))
    assert back == fs
    assert r.pushed == [
        "q.\"table_name\" = 'it''s'",
        "q.\"table_name\" IN ('Products', 'Users')",
    ]
    # pushed conjuncts shrink the per-bucket query result
    from rdbms_metadata_manager_spark.sources.pg_catalog import _bucket_rows

    full = sum(len(_bucket_rows("columns", "ecommerce_db", pg_host, 2, p)) for p in (0, 1))
    pruned = sum(
        len(_bucket_rows("columns", "ecommerce_db", pg_host, 2, p,
                         ["q.\"table_name\" = 'Products'"]))
        for p in (0, 1)
    )
    assert 0 < pruned < full
