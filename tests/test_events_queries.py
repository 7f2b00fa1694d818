"""Event-stream analytics driver queries vs the DuckDB oracle.

These are the telemetry/training-pipeline shapes (tumbling window, gap
sessionization, semi-structured props extraction) over the driver's
``events`` table.  Beyond the driver's own sf0.01 gate, this pins the
property the driver CANNOT check: the results are invariant to the Spark
session timezone (``ts`` reads as TIMESTAMP_NTZ, and every time key is
derived through ``unix_timestamp``, the one tz-invariant epoch primitive
over NTZ — date_trunc/to_utc_timestamp both coerce through the session
zone first; probed on Spark 4.1).
"""

import duckdb
import pandas as pd
import pytest

from frankensearch_spark.driver_queries import ORACLE_SQL, QUERIES

SF = "/root/testdata/sf0.001"

EVENT_QUERIES = ["events_windowed", "events_sessionize", "events_props_extract"]


def _oracle(name: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return con.execute(ORACLE_SQL[name]).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_events_query_matches_oracle(spark, name):
    got = _canon(QUERIES[name](spark, SF).toPandas())
    exp = _canon(_oracle(name))
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_events_query_timezone_invariant(spark, name):
    """Same bits under a DST-shifting session timezone: the driver's
    hash compare must not depend on where the gate process runs."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = _canon(QUERIES[name](spark, SF).toPandas())
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    base = _canon(QUERIES[name](spark, SF).toPandas())
    pd.testing.assert_frame_equal(shifted, base, check_dtype=False)


def test_sessionize_gap_semantics(spark):
    """Hand-built micro-case: 3 events 10 min apart = one session; a
    31-minute gap starts a new one; ties on the same second break by
    event_id identically on both engines (pinned by the oracle test
    above at corpus scale; here the law itself is asserted)."""
    import pyspark.sql.functions as F

    from frankensearch_spark.driver_queries import SESSION_GAP_S

    rows = [
        # user 1: t=0, +600s, +1200s (one session), +1200+1801 (new)
        (0, "2024-01-01 00:00:00", 1),
        (1, "2024-01-01 00:10:00", 1),
        (2, "2024-01-01 00:20:00", 1),
        (3, "2024-01-01 00:50:01", 1),
        # user 2: single event
        (4, "2024-01-01 05:00:00", 2),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    df = df.withColumn("event_type", F.lit("x")).withColumn(
        "value", F.lit(1.0)
    ).withColumn("props", F.lit('{"k": 1}'))

    import os
    import tempfile

    path = os.path.join(tempfile.mkdtemp(), "events.parquet")
    df.write.parquet(path)
    # the query reads f"{sf_dir}/events.parquet"
    out = (
        QUERIES["events_sessionize"](spark, os.path.dirname(path))
        .toPandas()
        .set_index("user_id")
    )
    assert int(out.loc[1, "n_sessions"]) == 2
    assert int(out.loc[1, "max_session_events"]) == 3
    assert int(out.loc[1, "max_session_secs"]) == 1200
    assert int(out.loc[2, "n_sessions"]) == 1
    assert int(out.loc[2, "max_session_secs"]) == 0
    assert SESSION_GAP_S == 1800
