"""LIVE PostgreSQL publish — the end-to-end proof that was env-blocked
since r10 (VERDICT r12 standing item #7.2).

The reference's pipeline terminates in a real Postgres/PostGIS load
(/root/reference/README.md:70,76 — osm2pgsql COPYs the assembled
layers in). The sandbox has the PostgreSQL 15 server binaries but no
JDBC jar / psycopg2 / network, so these tests initdb a throwaway
cluster on a UNIX socket and drive the r10 typed-publish surface
(postgres_ddl / prepare_for_postgres) through the pure-Python wire
client (sources/pg_wire.py) — DDL applied on a REAL server, bulk COPY
from Spark partitions, typed readback. PostGIS the extension is not
installed, so geometry columns publish as BYTEA WKB (the geometry(…)
override is exercised DDL-side in test_sources.py already).

Skips (not fails) when the server binaries are absent or the cluster
cannot start, so the suite stays green on leaner sandboxes.
"""

from __future__ import annotations

import datetime
import os
import shutil
import subprocess
import tempfile

import pytest
from pyspark.sql import functions as F

from osm_airflow_spark.sources.pg_wire import (
    PGConnection,
    PGError,
    copy_text_row,
    read_postgres,
    write_postgres_copy,
)


def _run_as_pg(args: list[str]) -> subprocess.CompletedProcess:
    """initdb/postgres refuse to run as root; re-exec via the postgres
    system user when needed (the Debian package creates it)."""
    if os.geteuid() == 0:
        args = ["runuser", "-u", "postgres", "--"] + args
    return subprocess.run(args, capture_output=True, text=True, cwd="/tmp")


@pytest.fixture(scope="module")
def pg():
    if shutil.which("initdb") is None or shutil.which("pg_ctl") is None:
        pytest.skip("PostgreSQL server binaries not installed")
    base = tempfile.mkdtemp(prefix="pglive_")
    try:
        if os.geteuid() == 0:
            shutil.chown(base, "postgres", "postgres")
        r = _run_as_pg(
            ["initdb", "-D", f"{base}/data", "-U", "postgres",
             "--auth=trust", "--no-sync", "-E", "UTF8"]
        )
        if r.returncode != 0:
            pytest.skip(f"initdb failed: {r.stderr[-200:]}")
        r = _run_as_pg(
            ["pg_ctl", "-D", f"{base}/data", "-w",
             "-o", f"-c listen_addresses='' -c unix_socket_directories={base} "
                   "-c fsync=off -c synchronous_commit=off",
             "-l", f"{base}/server.log", "start"]
        )
        if r.returncode != 0:
            pytest.skip(f"pg_ctl start failed: {r.stderr[-200:]}")
        yield {"host": base, "user": "postgres", "database": "postgres"}
        _run_as_pg(["pg_ctl", "-D", f"{base}/data", "-m", "immediate", "stop"])
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_wire_client_query_copy_and_error_recovery(pg):
    """Protocol basics against the live server: simple query, COPY
    text escaping (tabs/newlines/backslashes, NULL, bytea, Infinity),
    and the drain-to-ready fix — after a server error the SAME
    connection must answer the next query (the first implementation
    read the stale ReadyForQuery and returned [])."""
    with PGConnection(options={"extra_float_digits": "3"}, **pg) as conn:
        assert conn.query("SELECT 1 + 1 AS two")[1] == [("2",)]
        conn.execute(
            "CREATE TABLE wire_t (id BIGINT, name TEXT, val DOUBLE PRECISION,"
            " ok BOOLEAN, ts TIMESTAMP WITH TIME ZONE, payload BYTEA)"
        )
        rows = [
            (1, "plain", 1.5, True,
             datetime.datetime(2024, 1, 2, 3, 4, 5, 123456), b"\x00\xff"),
            (2, "tab\tnew\nline\\back\rcr", -0.1234567890123456789, False,
             None, None),
            (3, None, float("inf"), None,
             datetime.datetime(1995, 6, 1), b""),
        ]
        n = conn.copy_in(
            "COPY wire_t FROM STDIN", (copy_text_row(r) for r in rows)
        )
        assert n == 3
        cols, got = conn.query(
            "SELECT id, name, val, ok, ts, payload FROM wire_t ORDER BY id"
        )
        assert cols == ["id", "name", "val", "ok", "ts", "payload"]
        assert got[0] == (
            "1", "plain", "1.5", "t", "2024-01-02 03:04:05.123456+00", "\\x00ff",
        )
        # control characters round-trip byte-exact through COPY escaping
        assert got[1][1] == "tab\tnew\nline\\back\rcr"
        # shortest-repr float text reconstructs the identical double
        assert float(got[1][2]) == -0.1234567890123456789
        assert got[2] == ("3", None, "Infinity", None,
                          "1995-06-01 00:00:00+00", "\\x")
        # error recovery on the same connection
        with pytest.raises(PGError) as ei:
            conn.query("SELECT nope")
        assert ei.value.fields["C"] == "42703"  # undefined_column
        assert conn.query("SELECT 41 + 1")[1] == [("42",)]
        # COPY-phase error (unknown table) also leaves the session usable
        with pytest.raises(PGError):
            conn.copy_in("COPY missing_t FROM STDIN", iter(()))
        assert conn.query("SELECT count(*) FROM wire_t")[1] == [("3",)]


def test_publish_flagship_snapshot_end_to_end(spark, sf_dir, pg):
    """The reference's publish contract on a real server: DDL from
    Spark's own PostgresDialect (postgres_ddl) applies cleanly, the
    flagship query result COPYs in via one stream per partition, and
    the typed readback matches the DataFrame exactly."""
    from osm_airflow_spark.registry import all_queries
    from osm_airflow_spark.sources.jdbc import postgres_ddl

    df = all_queries()["flagship_revenue_by_region"](spark, sf_dir)
    ddl = postgres_ddl(df, "flagship", primary_key=df.columns[0])
    with PGConnection(**pg) as conn:
        conn.execute("DROP TABLE IF EXISTS flagship")
        conn.execute(ddl)
    write_postgres_copy(df, "flagship", host=pg["host"])

    key = df.columns[0]
    with PGConnection(options={"extra_float_digits": "3"}, **pg) as conn:
        _, got = conn.query(f'SELECT * FROM flagship ORDER BY "{key}"')
    want = sorted(df.collect(), key=lambda r: r[0])
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            if isinstance(wv, float):
                assert float(gv) == wv
            elif isinstance(wv, int):
                assert int(gv) == wv
            else:
                assert gv == str(wv)

    # primary key actually enforced: re-publishing the same snapshot
    # must be refused by the server, not silently doubled (the
    # executor-side PGError surfaces wrapped in the Spark job failure)
    with pytest.raises(Exception, match="23505"):  # unique_violation
        write_postgres_copy(df.limit(1), "flagship", host=pg["host"])


def test_publish_typed_osm_layer_jsonb_and_wkb(spark, pg):
    """The osm2pgsql-shaped publish: tag MAPS land as queryable JSONB
    (prepare_for_postgres serialization + server-side cast) and WKB
    geometry BYTES land as BYTEA the server can take apart — the
    typed-publish recipe the r10 DDL layer promised, executed live."""
    from osm_airflow_spark.sources.jdbc import postgres_ddl, prepare_for_postgres

    layer = spark.createDataFrame(
        [
            (1, {"highway": "primary", "name": "Main St"}, b"\x01\x02\x00\x10"),
            (2, {"highway": "residential"}, b""),
            (3, None, None),
        ],
        "way_id long, tags map<string,string>, geom binary",
    )
    prepared = prepare_for_postgres(layer, geometry_cols=("geom",))
    ddl = postgres_ddl(prepared, "highways", overrides={"tags": "JSONB"})
    assert '"tags" JSONB' in ddl and '"geom" BYTEA' in ddl
    with PGConnection(**pg) as conn:
        conn.execute("DROP TABLE IF EXISTS highways")
        conn.execute(ddl)
    write_postgres_copy(prepared, "highways", host=pg["host"])
    with PGConnection(**pg) as conn:
        _, got = conn.query(
            "SELECT way_id, tags->>'highway', tags->>'name',"
            " octet_length(geom), encode(geom, 'hex')"
            " FROM highways ORDER BY way_id"
        )
    assert got == [
        ("1", "primary", "Main St", "4", "01020010"),
        ("2", "residential", None, "0", ""),
        ("3", None, None, None, None),
    ]


def test_parallel_partition_copy_scales_out(spark, pg):
    """write_postgres_copy's scale topology: 8 partitions publish
    through 8 independent COPY connections; totals must be exact
    (no lost/duplicated partition) and empty partitions must not
    open connections (the publish closure returns before connecting)."""
    df = (
        spark.range(0, 10_000, 1, 8)
        .select(F.col("id"), (F.col("id") % 97).alias("bucket"))
    )
    with PGConnection(**pg) as conn:
        conn.execute("DROP TABLE IF EXISTS par_t")
        conn.execute("CREATE TABLE par_t (id BIGINT, bucket BIGINT)")
    write_postgres_copy(df, "par_t", host=pg["host"])
    # a second frame with planted empty partitions
    some = df.where(F.col("id") < 3).repartition(6)
    write_postgres_copy(some, "par_t", host=pg["host"])
    with PGConnection(**pg) as conn:
        _, got = conn.query(
            "SELECT count(*), sum(id), count(DISTINCT bucket) FROM par_t"
        )
    assert got == [(str(10_000 + 3), str(sum(range(10_000)) + 0 + 1 + 2), "97")]


def test_read_postgres_roundtrip_dataframe(spark, pg):
    """Driver-side readback into a DataFrame (the verification path):
    text columns, NULL preserved."""
    with PGConnection(**pg) as conn:
        conn.execute("DROP TABLE IF EXISTS rb_t")
        conn.execute("CREATE TABLE rb_t (k INT, v TEXT)")
        conn.copy_in(
            "COPY rb_t FROM STDIN",
            (copy_text_row(r) for r in [(1, "a"), (2, None)]),
        )
    back = read_postgres(spark, "SELECT k, v FROM rb_t ORDER BY k", host=pg["host"])
    assert [tuple(r) for r in back.collect()] == [("1", "a"), ("2", None)]
