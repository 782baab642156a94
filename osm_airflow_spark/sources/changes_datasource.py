"""OSM change feed as a Spark streaming data source (Python Data
Source API): ``spark.readStream.format("osm_changes").load()``.

Real OSM publishes minutely replication diffs as a monotonically
numbered sequence of files; the reference sidesteps them with weekly
full rebuilds (osm_etl.py:45-46). This source models the replication
contract directly: a watch directory accumulates numbered change
files (parquet), the stream offset IS the count of files consumed
(sorted by name — replication sequence numbers sort
lexicographically when zero-padded), and each micro-batch reads
exactly the files between two offsets, one ``InputPartition`` per
file, decoded executor-side with pyarrow. Offsets serialize to JSON,
so checkpoint recovery replays an interrupted batch exactly — the
same at-least-once-source / exactly-once-sink contract as Spark's
built-in file source, but with the sequence-number semantics of OSM
replication rather than modification-time listing.

Downstream composes with the merge layer unchanged:
``foreachBatch(apply_diff)`` (plans/merge.py) turns the feed into an
incrementally maintained snapshot — the upgrade path away from the
reference's weekly rebuild.

Default row contract = node change rows (the dominant element kind
in real diffs); pass ``schema_ddl`` to stream any other change
shape — the source only requires a ``change_op`` column to exist
for the merge layer.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

DEFAULT_SCHEMA_DDL = (
    # change_ts is NTZ: replication stamps are naive UTC, and the
    # Arrow hop from the Python reader refuses tz-naive values into
    # an LTZ column
    "node_id long, lat double, lon double, tags map<string,string>, "
    "change_op string, change_ts timestamp_ntz"
)


def _split_ddl_fields(ddl: str) -> list[str]:
    """Split a DDL string into top-level field declarations without a
    SparkSession (``StructType.fromDDL`` needs one, and the reader is
    re-instantiated on workers where none exists). Commas inside
    ``map<...>``/``struct<...>``/``decimal(...)`` don't split."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in ddl:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p for p in (p.strip() for p in parts) if p]


class ChangeFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class OsmChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("osm_changes: .option('path', <watch dir>) is required")
        self.dir = path
        self.suffix = options.get("suffix", ".parquet")
        # field names of the declared schema, in declared order — rows
        # must be assembled by NAME, not file column position (a change
        # file with reordered columns would otherwise silently misassign
        # fields, e.g. lat/lon swapped — ADVICE r4)
        ddl = options.get("schema_ddl", DEFAULT_SCHEMA_DDL)
        self.field_names = [
            part.strip().split(None, 1)[0] for part in _split_ddl_fields(ddl)
        ]

    def _files(self) -> list[str]:
        try:
            names = sorted(
                n for n in os.listdir(self.dir) if n.endswith(self.suffix)
            )
        except FileNotFoundError:
            names = []
        return names

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(self._files())}

    def partitions(self, start: dict, end: dict):
        names = self._files()
        return [
            ChangeFilePartition(os.path.join(self.dir, n))
            for n in names[start["index"] : end["index"]]
        ]

    def read(self, partition: ChangeFilePartition):
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        missing = [n for n in self.field_names if n not in table.column_names]
        if missing:
            raise ValueError(
                f"osm_changes: {partition.path} lacks declared columns {missing} "
                f"(has {table.column_names})"
            )
        # select by declared-schema field name so file column order is
        # irrelevant (and extra columns are ignored)
        table = table.select(self.field_names)
        for batch in table.to_batches():
            yield from zip(*(col.to_pylist() for col in batch.columns))

    def commit(self, end: dict) -> None:
        pass  # files are immutable; nothing to release

    def stop(self) -> None:
        pass


class OsmChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "osm_changes"

    def schema(self) -> str:
        # a DDL STRING, not StructType.fromDDL: the source instance is
        # re-created on workers where no SparkSession exists to parse
        # DDL (SESSION_OR_CONTEXT_NOT_EXISTS otherwise)
        return self.options.get("schema_ddl", DEFAULT_SCHEMA_DDL)

    def streamReader(self, schema) -> OsmChangesStreamReader:
        return OsmChangesStreamReader(self.options)


def register_changes_source(spark) -> None:
    """Idempotent registration; afterwards
    ``spark.readStream.format("osm_changes").option("path", d).load()``
    streams the numbered change files in ``d``."""
    spark.dataSource.register(OsmChangesDataSource)


def offset_json(offset: dict) -> str:
    """Offsets are plain dicts; JSON round-trip is what the
    checkpoint log stores (kept here so tests pin the contract)."""
    return json.dumps(offset)
