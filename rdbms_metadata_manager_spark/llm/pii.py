"""PII detection + redaction — a mandatory scrub pass for any
training-data pipeline (emails/phones must not reach the model).

[beyond-reference] surface. The synthetic corpus carries no real
PII (ROADMAP round-1 note), so the operator would be vacuous run
raw over ``documents.text``; instead the query DETERMINISTICALLY
constructs PII-bearing contact notes from customer fields (name →
email, custkey → phone) and then runs the real detect/redact
kernel over them — the regex machinery, counts, and replacement
semantics are fully exercised and exactly oracled.

Cross-engine regex contract: patterns restricted to character
classes + bounded/unbounded greedy repetition, which behave
identically in Java regex (Spark, codegen'd) and RE2 (DuckDB);
DuckDB needs the 'g' flag to match Spark's replace-all default.

Scale: pure per-row projection — no shuffle except the display
sort; at 100 TB this runs at scan speed inside whole-stage codegen
(regexp_replace/regexp_extract_all are JVM intrinsics, no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.base import load_spread

EMAIL_RX = "[a-z0-9.]+@[a-z0-9.]+"
PHONE_RX = "\\d{3}-\\d{4}"


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer contact note → PII hit counts + redacted text."""
    customer = load_spread(spark, sf_dir, "customer", "c_custkey")
    note = F.concat(
        F.lit("please contact "),
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" about "),
        F.col("c_mktsegment"),
    )
    with_note = customer.select("c_custkey", note.alias("note"))
    return with_note.select(
        "c_custkey",
        F.size(F.regexp_extract_all("note", F.lit(EMAIL_RX), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("note", F.lit(PHONE_RX), 0)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("note", EMAIL_RX, "[EMAIL]"), PHONE_RX, "[PHONE]"
        ).alias("redacted"),
    ).orderBy("c_custkey")


_PII_SQL = f"""
WITH n AS (
  SELECT c_custkey,
         'please contact ' || lower(replace(c_name, '#', '.'))
           || '@example.com or call 555-' || lpad((c_custkey % 10000)::VARCHAR, 4, '0')
           || ' about ' || c_mktsegment AS note
  FROM customer
)
SELECT c_custkey,
       len(regexp_extract_all(note, '{EMAIL_RX}')) AS n_emails,
       len(regexp_extract_all(note, '{PHONE_RX}')) AS n_phones,
       regexp_replace(regexp_replace(note, '{EMAIL_RX}', '[EMAIL]', 'g'),
                      '{PHONE_RX}', '[PHONE]', 'g') AS redacted
FROM n
ORDER BY c_custkey
"""


QUERIES = {"pii_redaction": pii_redaction}
ORACLES = {"pii_redaction": _PII_SQL}
