"""Oracle output-type hygiene.

The driver's correctness gate fetches the DuckDB oracle result through
Arrow, where a HUGEINT (DuckDB's type for ``sum`` over INTEGER) or a
DECIMAL becomes a decimal128/float value — which canonicalizes
differently from the Spark side's BIGINT and flips the value hash even
when every value is numerically identical.  (This exact failure kept
``bpe_doc_token_counts`` driver-red for two rounds while it passed every
local ``fetchall``-based check: Python's fetchall collapses HUGEINT to
int, hiding the mismatch.)

Rule enforced here: no oracle may emit a HUGEINT/UHUGEINT/DECIMAL
column.  Integer aggregates must be cast (``::BIGINT``), fractional
results must be DOUBLE.  Binding ``con.sql(...).types`` type-checks the
query without executing it, so this sweeps all oracles in seconds.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_no_hugeint_or_decimal_oracle_outputs(oracle_con):
    import __spark_entry__ as entrymod

    offenders = []
    for name, sql in entrymod.oracle_sql().items():
        rel = oracle_con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ)
            if t in BANNED or t.startswith("DECIMAL"):
                offenders.append((name, col, t))
    assert not offenders, (
        "oracles with Arrow-hostile output types (cast to ::BIGINT / "
        f"::DOUBLE): {offenders}")
