"""Oracle-portability lint: DESCRIBE every oracle_sql() entry in DuckDB and
assert no output column is HUGEINT/UHUGEINT (int128).

Round-3 postmortem: the driver's result canonicalizer renders DuckDB HUGEINT
differently from tools/check_oracle.py's str(int), so any uncast integer
sum()/windowed-sum aggregate in an oracle hash-mismatches even when the Spark
values are identical (`sessionize`, `cms_tokens` in CORRECTNESS_r03).  The
authoring rule is: CAST every integer aggregate to BIGINT.  This test makes
the class unreproducible.
"""

import os
import sys

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()

BANNED = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _oracles():
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()


def test_no_hugeint_output_columns(oracle_con):
    oracles = _oracles()
    assert oracles, "oracle_sql() returned no entries"
    offenders = {}
    for name, sql in oracles.items():
        try:
            desc = oracle_con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:  # noqa: BLE001 - report which oracle broke
            offenders[name] = f"DESCRIBE failed: {str(e)[:200]}"
            continue
        bad = [
            f"{col}:{typ}"
            for col, typ, *_ in desc
            if typ.upper() in BANNED
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles with int128 output columns (CAST the integer aggregate to "
        f"BIGINT): {offenders}"
    )
