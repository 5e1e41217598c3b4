"""Text-file and binaryFile source faces: adversarial payload
fixtures (embedded tabs, non-ASCII multi-byte content) that the
shipped word-soup testdata cannot exercise."""

from __future__ import annotations

import duckdb

from conftest import assert_matches_oracle


def _write_docs(d, rows):
    con = duckdb.connect()
    values = ", ".join(
        f"({i}, '{t}', 'en', 'web', {len(t)})" for i, t in rows
    )
    con.execute(
        f"""
        COPY (SELECT * FROM (VALUES {values})
              AS t(doc_id, text, lang, source, n_chars))
        TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


def test_text_roundtrip_preserves_embedded_tabs_and_unicode(spark, tmp_path):
    """The split-limit-3 parse must keep tabs INSIDE the payload
    intact, and multi-byte UTF-8 must survive the line hop with
    length() agreeing cross-engine (both count characters, not
    bytes)."""
    d = tmp_path / "txt"
    d.mkdir()
    _write_docs(
        d,
        [
            (1, "plain words only"),
            (2, "has\ta tab\tinside"),
            (3, "naïve café über δοκιμή 試験"),
        ],
    )
    from rdbms_metadata_manager_spark.queries.formats import (
        _TEXT_SOURCE_SQL,
        formats_text_source_roundtrip,
    )

    df = formats_text_source_roundtrip(spark, str(d))
    assert_matches_oracle(df, _TEXT_SOURCE_SQL, str(d))
    row = df.collect()[0]
    assert row.n_docs == 3
    # characters, not bytes: the unicode doc counts its codepoints
    assert row.total_chars == len("plain words only") + len(
        "has\ta tab\tinside"
    ) + len("naïve café über δοκιμή 試験")
    assert row.id_checksum == 6


def test_binaryfile_md5_parity_on_multibyte_content(spark, tmp_path):
    """md5 runs over UTF-8 BYTES on the Spark side (binary content)
    and over the VARCHAR on the DuckDB side — these must agree for
    multi-byte text, and length() (bytes) vs length(text)
    (characters) is exactly the divergence the fixture would catch
    if the Spark side emitted byte length unchecked."""
    d = tmp_path / "bin"
    d.mkdir()
    _write_docs(d, [(1, "ascii only"), (2, "δοκιμή 試験 ü")])
    from rdbms_metadata_manager_spark.queries.formats import (
        _BINARYFILE_SQL,
        binaryfile_source_stats,
    )

    df = binaryfile_source_stats(spark, str(d))
    assert_matches_oracle(df, _BINARYFILE_SQL, str(d))
    rows = {r.doc_id: r for r in df.collect()}
    import hashlib

    assert rows[1].content_md5 == hashlib.md5(b"ascii only").hexdigest()
    assert (
        rows[2].content_md5
        == hashlib.md5("δοκιμή 試験 ü".encode()).hexdigest()
    )
    assert rows[2].n_bytes == len("δοκιμή 試験 ü".encode())
    assert rows[2].n_bytes > len("δοκιμή 試験 ü")
