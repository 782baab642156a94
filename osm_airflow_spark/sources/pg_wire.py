"""Pure-Python PostgreSQL frontend (wire protocol v3) — the live
publish leg the reference's pipeline ends in.

The reference loads its snapshot into "the real PostGIS database"
(/root/reference/README.md:70,76) through osm2pgsql's libpq link.
This engine has had the Postgres-typed publish surface since r10
(sources/jdbc.py: postgres_ddl / prepare_for_postgres, driven through
Spark's own PostgresDialect) but no way to CONNECT: the sandbox has
no JDBC driver jar, no psycopg2, no network. It does have the
PostgreSQL 15 server binaries — and the frontend/backend protocol is
public and small (PostgreSQL docs, "Frontend/Backend Protocol"), so
this module implements the subset a publish pipeline needs, exactly
as sources/pbf_wire.py implements the OSM PBF wire format:

* startup + trust authentication over a UNIX socket (or TCP),
* the simple query protocol (Query → RowDescription/DataRow/
  CommandComplete/ReadyForQuery, text format),
* COPY FROM STDIN (CopyInResponse → CopyData → CopyDone) — the bulk
  path; osm2pgsql itself publishes via COPY, and it is ~10× INSERT.

Scale notes: ``write_postgres_copy`` opens ONE connection PER
PARTITION inside ``foreachPartition`` — the same topology as Spark's
JDBC sink, so a 1000-executor publish fans into 1000 parallel COPY
streams (Postgres-side parallelism is then the server's problem:
partition the target table or route through a load balancer). The
driver never materializes the rows.

No SSL, SCRAM, or extended-query protocol: the engine's publish
contract is a trusted in-perimeter loader (the reference's container
talks trust-auth localhost too, osm_etl.py's docker -e settings).
"""

from __future__ import annotations

import socket
import struct
from dataclasses import dataclass, field


class PGError(RuntimeError):
    """Server ErrorResponse, with the wire fields attached."""

    def __init__(self, fields: dict[str, str]):
        self.fields = fields
        super().__init__(
            f"{fields.get('S', 'ERROR')} {fields.get('C', '')}: "
            f"{fields.get('M', 'unknown error')}"
        )


@dataclass
class PGConnection:
    """One frontend connection. ``host`` starting with '/' is a UNIX
    socket directory (the cluster's unix_socket_directories);
    otherwise TCP. Trust auth only — no password exchange."""

    host: str
    port: int = 5432
    user: str = "postgres"
    database: str = "postgres"
    options: dict[str, str] = field(default_factory=dict)
    _sock: socket.socket | None = None
    _buf: bytes = b""

    # -- low-level framing ---------------------------------------------------

    def _send(self, data: bytes) -> None:
        assert self._sock is not None
        self._sock.sendall(data)

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("server closed the connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_message(self) -> tuple[bytes, bytes]:
        mtype = self._recv_exact(1)
        (length,) = struct.unpack("!i", self._recv_exact(4))
        payload = self._recv_exact(length - 4)
        if mtype == b"E":
            raise PGError(_parse_error_fields(payload))
        return mtype, payload

    def _drain_to_ready(self) -> None:
        """After a server error mid-statement the backend still sends
        ReadyForQuery; consume up to it so the NEXT query doesn't read
        a stale 'Z' and return empty (measured: the first error left
        the following SELECT answering []). On startup-phase errors
        the server closes instead — tolerate that."""
        while True:
            try:
                mtype, _ = self._read_message()
            except PGError:
                continue  # a second ErrorResponse: keep draining to Z
            except (ConnectionError, OSError):
                return
            if mtype == b"Z":
                return

    # -- session -------------------------------------------------------------

    def connect(self) -> "PGConnection":
        if self.host.startswith("/"):
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.connect(f"{self.host}/.s.PGSQL.{self.port}")
        else:
            self._sock = socket.create_connection((self.host, self.port))
        params = {
            "user": self.user,
            "database": self.database,
            "client_encoding": "UTF8",
            "TimeZone": "UTC",
            **self.options,
        }
        body = b"".join(
            k.encode() + b"\0" + v.encode() + b"\0" for k, v in params.items()
        ) + b"\0"
        self._send(struct.pack("!ii", len(body) + 8, 196608) + body)
        while True:
            mtype, payload = self._read_message()
            if mtype == b"R":
                (code,) = struct.unpack("!i", payload[:4])
                if code != 0:
                    raise PGError(
                        {"S": "FATAL", "M": f"auth method {code} unsupported "
                         "(this client is trust-only)"}
                    )
            elif mtype == b"Z":  # ReadyForQuery
                return self
            # 'S' ParameterStatus / 'K' BackendKeyData / 'N' Notice: skip

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._send(b"X" + struct.pack("!i", 4))  # Terminate
            except OSError:
                pass
            self._sock.close()
            self._sock = None

    def __enter__(self) -> "PGConnection":
        return self.connect()

    def __exit__(self, *exc) -> None:
        self.close()

    # -- simple query protocol -----------------------------------------------

    def query(self, sql: str) -> tuple[list[str], list[tuple[str | None, ...]]]:
        """Run one simple query; returns (column names, rows of TEXT
        values, None for SQL NULL). Multiple statements per call are
        allowed by the protocol; the LAST result set wins."""
        q = sql.encode() + b"\0"
        self._send(b"Q" + struct.pack("!i", len(q) + 4) + q)
        cols: list[str] = []
        rows: list[tuple[str | None, ...]] = []
        try:
            while True:
                mtype, payload = self._read_message()
                if mtype == b"T":
                    cols, rows = _parse_row_description(payload), []
                elif mtype == b"D":
                    rows.append(_parse_data_row(payload))
                elif mtype == b"Z":
                    return cols, rows
                # 'C' CommandComplete / 'N' / 'S' / 'I' EmptyQuery: continue
        except PGError:
            self._drain_to_ready()
            raise

    def execute(self, sql: str) -> None:
        self.query(sql)

    # -- COPY FROM STDIN -----------------------------------------------------

    def copy_in(self, copy_sql: str, lines) -> int:
        """Bulk-load via ``COPY ... FROM STDIN`` (text format).
        ``lines`` yields pre-escaped text lines WITHOUT trailing
        newline (use ``copy_text_row``). Returns the server-reported
        row count."""
        q = copy_sql.encode() + b"\0"
        self._send(b"Q" + struct.pack("!i", len(q) + 4) + q)
        while True:
            try:
                mtype, _ = self._read_message()
            except PGError:
                self._drain_to_ready()
                raise
            if mtype == b"G":
                break
            if mtype in (b"N", b"S"):  # async Notice/ParameterStatus
                continue
            # anything else (e.g. 'C'+'Z' for a statement that is not
            # a COPY): drain to ready so the session stays usable
            if mtype != b"Z":
                self._drain_to_ready()
            raise PGError(
                {"S": "ERROR", "M": f"expected CopyInResponse, got {mtype!r}"}
            )
        buf = bytearray()
        for line in lines:
            buf += line.encode() + b"\n"
            if len(buf) >= 1 << 16:
                self._send(b"d" + struct.pack("!i", len(buf) + 4) + bytes(buf))
                buf.clear()
        if buf:
            self._send(b"d" + struct.pack("!i", len(buf) + 4) + bytes(buf))
        self._send(b"c" + struct.pack("!i", 4))  # CopyDone
        n = 0
        try:
            while True:
                mtype, payload = self._read_message()
                if mtype == b"C":  # e.g. b"COPY 123\0"
                    tag = payload.rstrip(b"\0").decode()
                    if tag.startswith("COPY "):
                        n = int(tag.split()[-1])
                elif mtype == b"Z":
                    return n
        except PGError:
            self._drain_to_ready()
            raise


def _parse_error_fields(payload: bytes) -> dict[str, str]:
    fields: dict[str, str] = {}
    for part in payload.split(b"\0"):
        if part:
            fields[part[:1].decode()] = part[1:].decode("utf-8", "replace")
    return fields


def _parse_row_description(payload: bytes) -> list[str]:
    (n,) = struct.unpack("!h", payload[:2])
    cols, off = [], 2
    for _ in range(n):
        end = payload.index(b"\0", off)
        cols.append(payload[off:end].decode())
        off = end + 1 + 18  # tableOID(4) attnum(2) typOID(4) typlen(2) typmod(4) fmt(2)
    return cols


def _parse_data_row(payload: bytes) -> tuple[str | None, ...]:
    (n,) = struct.unpack("!h", payload[:2])
    vals, off = [], 2
    for _ in range(n):
        (ln,) = struct.unpack("!i", payload[off : off + 4])
        off += 4
        if ln == -1:
            vals.append(None)
        else:
            vals.append(payload[off : off + ln].decode())
            off += ln
    return tuple(vals)


# ---------------------------------------------------------------------------
# COPY text-format encoding (PostgreSQL docs, "COPY ... text format")
# ---------------------------------------------------------------------------

_COPY_ESCAPES = {
    "\\": "\\\\", "\t": "\\t", "\n": "\\n", "\r": "\\r",
    "\b": "\\b", "\f": "\\f", "\v": "\\v",
}


def copy_text_value(v) -> str:
    """One value → COPY text field. None → \\N; bytes → hex bytea
    (``\\\\x...``); floats via repr (shortest round-trip digits —
    Postgres' strtod reconstructs the exact double); bools → t/f;
    datetimes via isoformat (session TimeZone is pinned UTC)."""
    import datetime
    import decimal

    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (bytes, bytearray)):
        return "\\\\x" + bytes(v).hex()
    if isinstance(v, float):
        s = repr(v)
        return {"inf": "Infinity", "-inf": "-Infinity", "nan": "NaN"}.get(s, s)
    if isinstance(v, (int, decimal.Decimal)):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, str):
        return "".join(_COPY_ESCAPES.get(c, c) for c in v)
    raise TypeError(
        f"unsupported COPY value type {type(v).__name__}: serialize it "
        "first (prepare_for_postgres handles maps/structs)"
    )


def copy_text_row(values) -> str:
    return "\t".join(copy_text_value(v) for v in values)


# ---------------------------------------------------------------------------
# The Spark-side publish: one COPY stream per partition.
# ---------------------------------------------------------------------------

def write_postgres_copy(
    df,
    table: str,
    host: str,
    port: int = 5432,
    user: str = "postgres",
    database: str = "postgres",
) -> None:
    """Publish a DataFrame into an existing Postgres table via COPY,
    one connection per partition (the Spark JDBC-sink topology — the
    publish parallelism scales with the executor count, and the
    driver never sees the rows). Column order follows the DataFrame;
    run ``postgres_ddl``'s output first and ``prepare_for_postgres``
    on the frame (maps/structs → JSONB text) before calling."""
    cols = ", ".join(f'"{c}"' for c in df.columns)
    copy_sql = f'COPY {table} ({cols}) FROM STDIN'

    def publish(rows) -> None:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return  # empty partition: don't open a connection
        import itertools

        conn = PGConnection(host=host, port=port, user=user, database=database)
        with conn:
            conn.copy_in(
                copy_sql,
                (copy_text_row(tuple(r)) for r in itertools.chain([first], it)),
            )

    df.foreachPartition(publish)


def read_postgres(
    spark,
    sql: str,
    host: str,
    port: int = 5432,
    user: str = "postgres",
    database: str = "postgres",
):
    """Driver-side readback of a (small) query result as a DataFrame
    of TEXT columns — the verification path for publish round-trips.
    For large parallel reads use the range-partitioned read_jdbc once
    a driver jar exists; this readback is a control-plane check, not
    a data-plane scan."""
    conn = PGConnection(host=host, port=port, user=user, database=database)
    with conn:
        cols, rows = conn.query(sql)
    return spark.createDataFrame(
        [tuple(r) for r in rows] or [], ", ".join(f"`{c}` string" for c in cols)
    )
