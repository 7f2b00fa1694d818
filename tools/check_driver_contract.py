"""Local replica of the driver's correctness gate: run each queries()[name]
on Spark and oracle_sql()[name] on DuckDB, compare row count, schema width,
and order-insensitive values.

Usage: python tools/check_driver_contract.py [sf_dir] [--only name1,name2]
"""

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    rounded = df.round(6) if len(df) else df
    # sort by NON-float columns first: a cross-engine 1-ulp difference
    # at a rounding boundary must not reorder rows (the float columns
    # are compared under atol afterwards, but row ALIGNMENT has to come
    # from the stable id-ish columns)
    import numpy as np

    cols = list(rounded.columns)
    key = [c for c in cols if not np.issubdtype(rounded[c].dtype, np.floating)]
    key += [c for c in cols if c not in key]
    return rounded.sort_values(by=key).reset_index(drop=True)


def main(sf_dir: str, only: set[str] | None = None):
    import __spark_entry__ as e
    from frankensearch_spark.session import get_spark

    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    for name, fn in qs.items():
        try:
            got = canon(fn(spark, sf_dir).toPandas())
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in osql:
            print(f"rows-only  {name}: {len(got)} rows")
            continue
        try:
            exp = canon(con.execute(osql[name]).df())
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"duckdb error: {ex}"))
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        if len(got) != len(exp):
            failures.append((name, f"row count {len(got)} != {len(exp)}"))
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}")
            continue
        if list(got.columns) != list(exp.columns):
            failures.append((name, f"schema {list(got.columns)} != {list(exp.columns)}"))
            print(f"FAIL  {name}: schema {list(got.columns)} != {list(exp.columns)}")
            continue
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=False, rtol=0, atol=1.5e-6
            )
            print(f"OK    {name}: {len(got)} rows")
        except AssertionError as ex:
            failures.append((name, "value mismatch"))
            print(f"FAIL  {name}: value mismatch\n{str(ex)[:800]}")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        if i + 1 >= len(argv):
            print("usage: check_driver_contract.py [sf_dir] --only n1,n2")
            sys.exit(2)
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    sys.exit(main(argv[0] if argv else "/root/testdata/sf0.01", only))
