"""Reproduce the driver's correctness gate locally: entry() smoke +
every queries()/oracle_sql() pair compared against DuckDB (row count,
schema, order-insensitive values) at a chosen scale factor.

    python scripts/driver_gate_check.py [/root/testdata/sf0.01] [q1,q2,...]

An optional comma-separated second argument restricts the run to the
named queries (fast single-pair verification while iterating).

Uses a plain SparkSession (not cola_spark.session.get_spark) on purpose
— proves the contract self-ships the package for foreign sessions.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None


def norm(pdf):
    """DTYPE-STRICT: the driver's value hash is dtype-sensitive (a
    DuckDB HUGEINT vs Spark BIGINT mismatch fails it even when values
    are equal — the round-2 docs_repetition/corpus_clean failure mode),
    so this gate must never coerce numerics. Only the object/datetime
    → str normalization survives (the driver compares those as values,
    not dtypes)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object or str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]").appName("driver_gate_check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n = e.entry(spark).count()
    print(f"entry: {n} rows")
    assert n > 0

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    from cola_spark.queries import LOCAL_ORACLES

    q, o = e.queries(), e.oracle_sql()
    if ONLY is not None:
        missing = ONLY - set(q)
        assert not missing, f"unknown query names: {sorted(missing)}"
        q = {k: v for k, v in q.items() if k in ONLY}
    fails = []
    for name in sorted(q):
        got = q[name](spark, SF)
        if name not in o and name not in LOCAL_ORACLES:
            print(f"{name}: rows-only ({got.count()} rows) — UNEXPLAINED")
            fails.append(name)
            continue
        if name not in o:
            # in-repo exact oracle: sequential pure-Python recomputation
            a = norm(got.toPandas())
            b = norm(LOCAL_ORACLES[name](spark, SF))
            ok = list(a.columns) == list(b.columns) and len(a) == len(b)
            if ok and [str(t) for t in a.dtypes] != [str(t) for t in b.dtypes]:
                print(f"  dtype mismatch: spark={list(map(str, a.dtypes))}"
                      f" oracle={list(map(str, b.dtypes))}")
                ok = False
            if ok:
                try:
                    pd.testing.assert_frame_equal(a, b, check_dtype=True)
                except AssertionError:
                    ok = False
            print(f"{name}: LOCAL-{'MATCH' if ok else 'MISMATCH'} ({len(a)} rows)")
            if not ok:
                fails.append(name)
            continue
        a, b = norm(got.toPandas()), norm(con.execute(o[name]).df())
        ok = list(a.columns) == list(b.columns) and len(a) == len(b)
        if ok and [str(t) for t in a.dtypes] != [str(t) for t in b.dtypes]:
            print(f"  dtype mismatch: spark={list(map(str, a.dtypes))}"
                  f" oracle={list(map(str, b.dtypes))}")
            ok = False
        if ok:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=True)
            except AssertionError:
                ok = False
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(a)} rows)")
        if not ok:
            fails.append(name)
    print("FAILURES:", fails or "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
