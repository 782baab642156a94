"""Maximal-adversarial PBF generator (VERDICT r9 next-round #2).

No real geofabrik extract can reach this sandbox, so first contact
with a planet file stays an unknown unless every encoding variant a
real extract uses is synthesized and pinned. This generator (built on
the INDEPENDENT wire primitives of tools/make_golden_pbf.py — zero
code shared with the decoder under test) emits one file exercising,
in one pass, everything the golden fixtures don't:

* a FULL real-world HeaderBlock: bbox (nanodegree sint64), BOTH
  required_features real extracts declare, optional_features,
  writingprogram, source, and the osmosis_replication_* fields —
  field numbers 32/33/34, whose keys need TWO-byte varints (every
  field in the golden fixtures has a 1-byte key);
* DenseNodes WITH DenseInfo (field 5: versions, delta-coded
  timestamps/changesets/uids/user_sids, visible flags) — present in
  every real planet file, must be skipped without desyncing tags;
* per-element Info messages (field 4) on plain nodes, ways and
  relations — same skip requirement;
* a Way carrying the LocationsOnWays optional feature (packed
  delta sint64 lat=9 / lon=10 beside refs=8) — osmium-style extracts
  emit these; a decoder confusing them with refs corrupts geometry;
* a changesets PrimitiveGroup (field 5) — legal, must be skipped;
* UNKNOWN fields everywhere: varint + length-delimited + fixed64 +
  fixed32 wire types inside PrimitiveBlock, DenseNodes, Way — the
  protobuf forward-compat contract (skip what you don't know);
* one PrimitiveBlock mixing ALL FOUR group kinds (plain nodes,
  dense, ways, relations) plus an EMPTY group;
* coordinate extremes: the four corners (±90, ±180) at default
  granularity — raw nanodegree values past 2^30, deltas past 2^31;
* way ref deltas of ±2^40 (64-bit delta accumulator proof);
* a relation with ZERO members; a single-node dense group;
* a >16 MB uncompressed blob (the spec's SHOULD-stay-under bound;
  real planet blobs run right at it): a ~260k-entry string table —
  keys_vals / role indices needing THREE-byte varints — under the
  32 MB MUST cap, zlib'd;
* one zlib blob WITHOUT the optional raw_size field;
* string-table dedup: two elements sharing every string index.

Counts and spot values are pinned in tests/test_sources.py; the file
generates deterministically into tmp_path (too big to check in, same
bytes every run).

Usage: python tools/make_adversarial_pbf.py /tmp/adversarial.osm.pbf
"""

from __future__ import annotations

import sys

from tools.make_golden_pbf import (
    NANO,
    deltas,
    fileblock,
    key,
    ld,
    packed,
    string_table,
    uv,
    vi,
    zz,
)


def deg(raw: int, gran: int = 100, off: int = 0) -> float:
    """EXACTLY the decoder's to_deg float association
    (NANO * (off + gran * raw)) — a different association differs in
    the last ulp and the pinned expectations compare exact floats."""
    return NANO * (off + gran * raw)


def fixed64(field: int, value: int) -> bytes:
    return key(field, 1) + value.to_bytes(8, "little")


def fixed32(field: int, value: int) -> bytes:
    return key(field, 5) + value.to_bytes(4, "little")


def header_block() -> bytes:
    bbox = (
        vi(1, zz(-180_000_000_000))  # left, nanodegrees
        + vi(2, zz(180_000_000_000))  # right
        + vi(3, zz(90_000_000_000))  # top
        + vi(4, zz(-90_000_000_000))  # bottom
    )
    return (
        ld(1, bbox)
        + ld(4, b"OsmSchema-V0.6")
        + ld(4, b"DenseNodes")
        + ld(5, b"Sort.Type_then_ID")  # optional feature: ignorable
        + ld(16, b"adversarial-generator")  # writingprogram
        + ld(17, b"synthetic")  # source
        + vi(32, 1_721_865_600)  # osmosis_replication_timestamp: 2-byte key
        + vi(33, 4_321_000)  # osmosis_replication_sequence_number
        + ld(34, b"https://example.invalid/replication")  # base_url
    )


def dense_info(n: int) -> bytes:
    """A realistic DenseInfo: versions, delta-coded timestamps /
    changesets / uids / user_sids, visible flags — all skipped by the
    decoder, all present in real planet files."""
    ts = [1_600_000_000 + 60 * i for i in range(n)]
    cs = [9_000_000 + i for i in range(n)]
    uid = [(i * 37) % 5_000 for i in range(n)]
    sid = [0 for _ in range(n)]
    return ld(
        5,
        packed(1, [1 + (i % 3) for i in range(n)])  # version
        + packed(2, [zz(d) for d in deltas(ts)])  # timestamp, delta sint
        + packed(3, [zz(d) for d in deltas(cs)])  # changeset, delta sint
        + packed(4, [zz(d) for d in deltas(uid)])  # uid, delta sint
        + packed(5, [zz(d) for d in deltas(sid)])  # user_sid, delta sint
        + packed(6, [1] * n),  # visible
    )


def info_msg() -> bytes:
    """Per-element Info (field 4 on Node/Way/Relation): version,
    timestamp, changeset, uid, user_sid — skipped by the decoder."""
    return ld(
        4,
        vi(1, 3) + vi(2, 1_600_000_123) + vi(3, 9_000_001) + vi(4, 42) + vi(5, 0),
    )


def block_mixed() -> tuple[bytes, dict]:
    """One PrimitiveBlock with ALL FOUR group kinds + an empty group
    + a changesets group + unknown fields at every level + extreme
    coordinates + huge ref deltas + LocationsOnWays + Info."""
    strings = ["", "highway", "primary", "stop", "outer", "type", "route",
               "name", "corner"]
    exp: dict = {"nodes": [], "ways": [], "relations": []}

    # group 1: plain nodes at the four coordinate corners, with Info
    plain = b""
    corners = [
        (40_001, 90.0, 180.0),
        (40_002, -90.0, -180.0),
        (40_003, 90.0, -180.0),
        (40_004, -90.0, 180.0),
    ]
    for nid, lat, lon in corners:
        node = (
            vi(1, zz(nid))
            + packed(2, [7])
            + packed(3, [8])
            + info_msg()  # must be skipped
            + vi(8, zz(round(lat / (NANO * 100))))
            + vi(9, zz(round(lon / (NANO * 100))))
        )
        plain += ld(1, node)
        exp["nodes"].append(
            {
                "node_id": nid,
                "lat": deg(round(lat / (NANO * 100))),
                "lon": deg(round(lon / (NANO * 100))),
                "tags": {"name": "corner"},
            }
        )

    # group 2: dense with DenseInfo + unknown field inside DenseNodes;
    # sign-flipping coords around zero
    n_dense = 50
    ids = [41_000 + 3 * i for i in range(n_dense)]
    lats = [(-1) ** i * 5_000_000 * i for i in range(n_dense)]
    lons = [(-1) ** (i + 1) * 11_000_000 * i for i in range(n_dense)]
    kvs: list[int] = []
    for i in range(n_dense):
        tags = {}
        if i % 4 == 0:
            tags = {"highway": "stop"}
            kvs += [1, 3]
        kvs.append(0)
        exp["nodes"].append(
            {
                "node_id": ids[i],
                "lat": deg(lats[i]),
                "lon": deg(lons[i]),
                "tags": tags,
            }
        )
    dense = (
        packed(1, [zz(d) for d in deltas(ids)])
        + dense_info(n_dense)  # before coords: order freedom + skip
        + vi(99, 7)  # unknown varint field in DenseNodes
        + packed(8, [zz(d) for d in deltas(lats)])
        + packed(9, [zz(d) for d in deltas(lons)])
        + packed(10, kvs)
        + ld(100, b"future-bytes")  # unknown length-delimited field
    )
    dense_group = ld(2, ld(2, dense))

    # group 3: single-node dense (delta arrays of length 1)
    single = (
        packed(1, [zz(42_000)])
        + packed(8, [zz(123_456_789)])
        + packed(9, [zz(-987_654_321)])
    )
    exp["nodes"].append(
        {
            "node_id": 42_000,
            "lat": deg(123_456_789),
            "lon": deg(-987_654_321),
            "tags": {},
        }
    )

    # group 4: ways — one with ±2^40 ref deltas, one with
    # LocationsOnWays (lat=9/lon=10 packed beside refs) + Info +
    # unknown fixed64/fixed32 fields
    ways = b""
    big_refs = [1, 1 + (1 << 40), 1 + (1 << 40) - (1 << 39), 2]
    w1 = (
        vi(1, 50_001)
        + packed(2, [1])
        + packed(3, [2])
        + packed(8, [zz(d) for d in deltas(big_refs)])
        + fixed64(98, 0xDEADBEEF)  # unknown fixed64: must skip 8 bytes
        + fixed32(97, 0xC0FFEE)  # unknown fixed32: must skip 4 bytes
    )
    ways += ld(3, w1)
    exp["ways"].append(
        {"way_id": 50_001, "node_refs": big_refs, "tags": {"highway": "primary"}}
    )
    low_refs = [40_001, 40_002, 40_003]
    w2 = (
        vi(1, 50_002)
        + info_msg()
        + packed(8, [zz(d) for d in deltas(low_refs)])
        # LocationsOnWays: per-ref coords, packed delta sint64 — the
        # decoder must NOT confuse these with refs
        + packed(9, [zz(d) for d in deltas([900_000_000, -900_000_000, 0])])
        + packed(10, [zz(d) for d in deltas([1_800_000_000, 0, -1_800_000_000])])
    )
    ways += ld(3, w2)
    exp["ways"].append({"way_id": 50_002, "node_refs": low_refs, "tags": {}})

    # group 5: relations — one normal, one with ZERO members
    rels = b""
    r1 = (
        vi(1, 60_001)
        + packed(2, [5])
        + packed(3, [6])
        + packed(8, [4, 0])  # roles: "outer", ""
        + packed(9, [zz(d) for d in deltas([40_001, 50_001])])
        + packed(10, [0, 1])
    )
    rels += ld(4, r1)
    exp["relations"].append(
        {
            "rel_id": 60_001,
            "members": [
                {"mtype": "node", "ref": 40_001, "role": "outer"},
                {"mtype": "way", "ref": 50_001, "role": ""},
            ],
            "tags": {"type": "route"},
        }
    )
    r2 = vi(1, 60_002) + info_msg()
    rels += ld(4, r2)
    exp["relations"].append({"rel_id": 60_002, "members": [], "tags": {}})

    # a changesets group (field 5) — legal per the spec, skipped
    changesets = ld(2, ld(5, ld(1, vi(1, 123_456))))
    empty_group = ld(2, b"")  # group with no elements at all

    block = (
        vi(99, 1)  # unknown varint field in the PrimitiveBlock itself
        + ld(1, string_table(strings))
        + ld(2, plain)
        + dense_group
        + ld(2, ld(2, single))
        + ld(2, ways)
        + ld(2, rels)
        + changesets
        + empty_group
        + ld(100, b"block-level-future")  # unknown bytes field
    )
    return block, exp


def block_16mb() -> tuple[bytes, dict]:
    """>16 MB uncompressed (SHOULD bound; < the 32 MB MUST cap): a
    ~260k-entry string table pushes keys_vals and role indices into
    THREE-byte varint territory, with 2,000 tagged dense nodes
    referencing the far end of the table."""
    n_strings = 260_000
    strings = [""] + [f"s{j:08d}-{'x' * 54}" for j in range(n_strings - 1)]
    n_nodes = 2_000
    ids = [70_000 + i for i in range(n_nodes)]
    lats = [1_000 * i for i in range(n_nodes)]
    lons = [-2_000 * i for i in range(n_nodes)]
    kvs: list[int] = []
    exp_nodes = []
    for i in range(n_nodes):
        ki = n_strings - 1 - i  # high indices: 3-byte varints
        vi_ = 1 + i
        kvs += [ki, vi_, 0]
        exp_nodes.append(
            {
                "node_id": ids[i],
                "lat": deg(lats[i]),
                "lon": deg(lons[i]),
                "tags": {strings[ki]: strings[vi_]},
            }
        )
    dense = (
        packed(1, [zz(d) for d in deltas(ids)])
        + packed(8, [zz(d) for d in deltas(lats)])
        + packed(9, [zz(d) for d in deltas(lons)])
        + packed(10, kvs)
    )
    block = ld(1, string_table(strings)) + ld(2, ld(2, dense))
    assert len(block) > 16 * 1024 * 1024, len(block)
    assert len(block) < 32 * 1024 * 1024, len(block)
    return block, {"nodes": exp_nodes}


def fileblock_no_rawsize(blob_type: str, block: bytes) -> bytes:
    """zlib blob WITHOUT the optional raw_size field (field 2)."""
    import zlib as _z

    blob = ld(3, _z.compress(block, 6))
    header = ld(1, blob_type.encode()) + vi(3, len(blob))
    return len(header).to_bytes(4, "big") + header + blob


def build(path: str) -> dict:
    """Write the adversarial file; return the expected elements."""
    mixed, exp = block_mixed()
    big, exp_big = block_16mb()
    # a tiny trailing dense block delivered WITHOUT raw_size
    tail_ids = [80_001, 80_002]
    tail = ld(1, string_table([""])) + ld(
        2,
        ld(
            2,
            packed(1, [zz(d) for d in deltas(tail_ids)])
            + packed(8, [zz(d) for d in deltas([100, 200])])
            + packed(9, [zz(d) for d in deltas([300, 400])]),
        ),
    )
    exp_tail = [
        {"node_id": 80_001, "lat": deg(100), "lon": deg(300), "tags": {}},
        {"node_id": 80_002, "lat": deg(200), "lon": deg(400), "tags": {}},
    ]
    data = (
        fileblock("OSMHeader", header_block(), compress=True)
        + fileblock("OSMData", mixed, compress=True)
        + fileblock("OSMData", big, compress=True)
        + fileblock_no_rawsize("OSMData", tail)
    )
    with open(path, "wb") as fh:
        fh.write(data)
    return {
        "nodes": exp["nodes"] + exp_big["nodes"] + exp_tail,
        "ways": exp["ways"],
        "relations": exp["relations"],
    }


def build_history_file(path: str) -> None:
    """A file declaring HistoricalInformation as REQUIRED — the
    decoder must refuse it (deleted elements would read as live)."""
    hdr = (
        ld(4, b"OsmSchema-V0.6")
        + ld(4, b"DenseNodes")
        + ld(4, b"HistoricalInformation")
    )
    tiny = ld(1, string_table([""])) + ld(
        2, ld(2, packed(1, [zz(1)]) + packed(8, [zz(0)]) + packed(9, [zz(0)]))
    )
    with open(path, "wb") as fh:
        fh.write(fileblock("OSMHeader", hdr, compress=True))
        fh.write(fileblock("OSMData", tiny, compress=True))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/adversarial.osm.pbf"
    expected = build(out)
    print(
        f"wrote {out}: {len(expected['nodes'])} nodes, "
        f"{len(expected['ways'])} ways, {len(expected['relations'])} relations"
    )
