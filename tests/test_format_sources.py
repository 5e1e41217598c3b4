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


def test_text_roundtrip_survives_newlines_cr_and_percent(spark, tmp_path):
    """ADVICE r6 #1: newline/CR inside text (and a tab inside source)
    must NOT break line framing — the percent-escape hop makes the
    serialization lossless for arbitrary payloads, including literal
    '%0A' sequences that a naive decoder would corrupt."""
    import pandas as pd

    d = tmp_path / "hostile"
    d.mkdir()
    rows = [
        (1, "line one\nline two\nline three", "multi\tline"),
        (2, "carriage\rreturn and\r\ncrlf", "web"),
        (3, "literal percent 100% and fake escape %0A %25 %09", "web"),
        (4, "tab\tand\nnewline\rmixed", "odd\nsource"),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[2] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    con = duckdb.connect()
    con.register("pdf", pdf)
    con.execute(
        f"COPY (SELECT * FROM pdf) TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()
    from rdbms_metadata_manager_spark.queries.formats import (
        _TEXT_SOURCE_SQL,
        formats_text_source_roundtrip,
    )

    df = formats_text_source_roundtrip(spark, str(d))
    assert_matches_oracle(df, _TEXT_SOURCE_SQL, str(d))
    got = {r.source: r for r in df.collect()}
    # every hostile source key survives verbatim, with exact
    # char-counts of the ORIGINAL payloads (framing was lossless)
    assert set(got) == {"multi\tline", "web", "odd\nsource"}
    assert got["multi\tline"].total_chars == len(rows[0][1])
    assert got["web"].n_docs == 2
    assert got["web"].total_chars == len(rows[1][1]) + len(rows[2][1])
    assert got["web"].id_checksum == 5
    assert got["odd\nsource"].total_chars == len(rows[3][1])


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
