"""Every queries()/oracle_sql() pair cross-checked against DuckDB the
same way the driver does: row count + schema + order-insensitive
values, DTYPE-STRICT. Runs at sf0.001 for speed; the driver re-runs at
sf0.01.

Dtype strictness is the recurrence guard for the only correctness
failure mode this project has had: DuckDB HUGEINT (int128 → pandas
object/float) vs Spark BIGINT hash-mismatching in the driver while a
coercing local gate stayed green (round-2 docs_repetition /
corpus_clean). `_normalize` therefore mirrors
scripts/driver_gate_check.py::norm — object/datetime → str only, NO
numeric coercion — and the comparison runs check_dtype=True.
`test_hugeint_probe_fails` pins that an int128-producing oracle would
fail here, not just in the driver.
"""

import duckdb
import pandas as pd
import pytest

from cola_spark.queries import PAIRS
from cola_spark.sources.tables import DRIVER_TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-faithful normalization: sort columns/rows, stringify only
    object/datetime columns. Numeric dtypes pass through untouched so a
    HUGEINT/BIGINT or int32/int64 mismatch is visible to the strict
    compare below (same contract as driver_gate_check.norm)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object or str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def _assert_match(got: pd.DataFrame, want: pd.DataFrame, name: str) -> None:
    got, want = _normalize(got), _normalize(want)
    assert list(got.columns) == list(want.columns), (
        f"{name} schema: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows: {len(got)} vs {len(want)}"
    assert [str(t) for t in got.dtypes] == [str(t) for t in want.dtypes], (
        f"{name} dtypes: {list(map(str, got.dtypes))} vs "
        f"{list(map(str, want.dtypes))}"
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


@pytest.mark.parametrize("name", sorted(PAIRS))
def test_pair_matches_duckdb(name, spark, duck):
    fn, sql = PAIRS[name]
    got = fn(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(got) >= 0  # rows-only contract
        return
    want = duck.execute(sql).df()
    _assert_match(got, want, name)


def test_hugeint_probe_fails(spark, duck):
    """A deliberate HUGEINT-vs-BIGINT pair MUST fail the strict compare.

    DuckDB SUM(BIGINT) returns HUGEINT (pandas float64/object); Spark
    sum(long) returns BIGINT (int64). Equal values, different dtypes —
    the exact round-2 driver failure. If this probe ever passes, the
    gate has gone lax again."""
    want = duck.execute(
        "SELECT sum(CAST(o_orderkey AS BIGINT)) AS s FROM orders"
    ).df()
    got = spark.read.parquet(f"{SF_DIR}/orders.parquet").selectExpr(
        "sum(o_orderkey) AS s"
    ).toPandas()
    assert str(want["s"].dtype) != "int64", (
        "probe premise broken: DuckDB SUM no longer widens to HUGEINT"
    )
    with pytest.raises(AssertionError):
        _assert_match(got, want, "hugeint_probe")
