"""Generate the INDEPENDENT golden PBF fixture (VERDICT r5 item 7).

Every prior PBF test decodes bytes produced by the repo's own encoder
(osm_airflow_spark/sources/pbf_wire.py), so a symmetric bug — zigzag
shifted the same wrong way in encode and decode, a swapped field
number used consistently on both sides — would round-trip green. This
script is a from-scratch second implementation of the OSM PBF wire
format, written directly against the published specs
(protobuf encoding docs; OSM wiki PBF format page) and sharing ZERO
code with pbf_wire.py. It deliberately makes different encoding
choices wherever the spec allows freedom:

* zigzag as arithmetic (2n / -2n-1, the spec's own table) instead of
  bit shifts;
* a different varint loop shape;
* protobuf fields emitted in non-ascending order (legal);
* one blob raw (Blob.raw, field 1), the rest zlib;
* block B uses granularity=50 + nonzero lat/lon offsets +
  date_granularity (a field the decoder must skip);
* plain Node messages alongside DenseNodes;
* a decoy string-table entry no element references;
* non-ASCII UTF-8 in a tag value.

tests/test_sources.py anchors both implementations to the protobuf
docs' published known-answer vectors (varint 150 = `96 01`, zigzag
(-2)=3 ...), so "both sides wrong the same way" has nowhere to hide.

Deterministic: same bytes every run (a test regenerates and compares
against the checked-in fixture).

Usage: python tools/make_golden_pbf.py   # writes tests/fixtures/golden_1000.*
"""

from __future__ import annotations

import json
import os
import zlib

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures")

# --- independent protobuf wire primitives (from the spec, not pbf_wire) ---


def uv(n: int) -> bytes:
    """Unsigned varint, per the worked example in the protobuf docs
    (150 → 0x96 0x01)."""
    if n < 0:
        n &= (1 << 64) - 1
    out = []
    while n > 0x7F:
        out.append((n & 0x7F) | 0x80)
        n //= 128
    out.append(n)
    return bytes(out)


def zz(n: int) -> int:
    """ZigZag per the spec's table: 0→0, -1→1, 1→2, -2→3, ..."""
    return 2 * n if n >= 0 else -2 * n - 1


def key(field: int, wire: int) -> bytes:
    return uv(field * 8 + wire)


def vi(field: int, value: int) -> bytes:  # varint field
    return key(field, 0) + uv(value)


def ld(field: int, payload: bytes) -> bytes:  # length-delimited field
    return key(field, 2) + uv(len(payload)) + payload


def packed(field: int, values: list[int]) -> bytes:
    return ld(field, b"".join(uv(v) for v in values))


def deltas(vals: list[int]) -> list[int]:
    prev, out = 0, []
    for v in vals:
        out.append(v - prev)
        prev = v
    return out


def string_table(strings: list[str]) -> bytes:
    return b"".join(ld(1, s.encode("utf-8")) for s in strings)


def fileblock(blob_type: str, block: bytes, compress: bool) -> bytes:
    if compress:
        # raw_size AFTER zlib_data — field order is free in protobuf
        blob = ld(3, zlib.compress(block, 6)) + vi(2, len(block))
    else:
        blob = ld(1, block) + vi(2, len(block))
    header = ld(1, blob_type.encode()) + vi(3, len(blob))
    return len(header).to_bytes(4, "big") + header + blob


# --- golden content (pure index arithmetic — no randomness) ---------------

NANO = 1e-9


def block_a() -> tuple[bytes, list[dict]]:
    """600 dense nodes, default granularity/offsets, zlib."""
    strings = ["", "amenity", "cafe", "bench", "UNUSED-decoy", "café✓"]
    ids, lats, lons, kvs, expected = [], [], [], [], []
    for i in range(600):
        nid = i + 1
        lat_raw = 500_000_000 - 1_000 * i + (7_000 if i % 5 == 0 else 0)
        lon_raw = -300_000_000 + 999 * i
        ids.append(nid)
        lats.append(lat_raw)
        lons.append(lon_raw)
        if i == 0:
            tags = {"amenity": "café✓"}
            kvs += [1, 5]
        elif i % 3 == 0:
            val = "cafe" if i % 2 == 0 else "bench"
            tags = {"amenity": val}
            kvs += [1, 2 if val == "cafe" else 3]
        else:
            tags = {}
        kvs.append(0)
        expected.append(
            {
                "node_id": nid,
                "lat": NANO * (0 + 100 * lat_raw),
                "lon": NANO * (0 + 100 * lon_raw),
                "tags": tags,
            }
        )
    dense = (
        packed(1, [zz(d) for d in deltas(ids)])
        + packed(10, kvs)  # keys_vals ahead of coords: order freedom
        + packed(8, [zz(d) for d in deltas(lats)])
        + packed(9, [zz(d) for d in deltas(lons)])
    )
    block = ld(1, string_table(strings)) + ld(2, ld(2, dense))
    return block, expected


def block_b() -> tuple[bytes, list[dict]]:
    """298 dense + 2 plain nodes; granularity=50, nonzero offsets,
    date_granularity present (decoder must skip it); RAW blob."""
    strings = ["", "name", "n-a"]
    gran, lat_off, lon_off = 50, 1_000_000, -500_000
    ids, lats, lons, expected = [], [], [], []
    for i in range(298):
        nid = 10_001 + i
        lat_raw = 100_000 + 40 * i
        lon_raw = -200_000 + 35 * i
        ids.append(nid)
        lats.append(lat_raw)
        lons.append(lon_raw)
        expected.append(
            {
                "node_id": nid,
                "lat": NANO * (lat_off + gran * lat_raw),
                "lon": NANO * (lon_off + gran * lon_raw),
                "tags": {},
            }
        )
    dense = (
        packed(1, [zz(d) for d in deltas(ids)])
        + packed(8, [zz(d) for d in deltas(lats)])
        + packed(9, [zz(d) for d in deltas(lons)])
        # no keys_vals field at all — every node untagged
    )
    plain_group = b""
    for j, (nid, lat_raw, lon_raw, tags, kv) in enumerate(
        [
            (10_299, 120_000, -150_000, {"name": "n-a"}, ([1], [2])),
            (10_300, -90_000, 160_000, {}, ([], [])),
        ]
    ):
        node = (
            vi(8, zz(lat_raw))  # coords before id: order freedom again
            + vi(9, zz(lon_raw))
            + vi(1, zz(nid))
        )
        if kv[0]:
            node += packed(2, kv[0]) + packed(3, kv[1])
        plain_group += ld(1, node)
        expected.append(
            {
                "node_id": nid,
                "lat": NANO * (lat_off + gran * lat_raw),
                "lon": NANO * (lon_off + gran * lon_raw),
                "tags": tags,
            }
        )
    block = (
        vi(17, gran)
        + vi(18, 2_000)  # date_granularity: present, must be ignored
        + vi(19, lat_off)
        + vi(20, lon_off)  # int64 (NOT zigzag): negative → 10-byte varint
        + ld(1, string_table(strings))
        + ld(2, ld(2, dense))
        + ld(2, plain_group)
    )
    return block, expected


def block_c() -> tuple[bytes, list[dict], list[dict]]:
    """80 ways (negative ref deltas) + 20 relations (all member
    types), zlib."""
    strings = ["", "highway", "residential", "admin_centre", "outer",
               "subarea", "type", "boundary"]
    ways_msg, exp_ways = b"", []
    for j in range(80):
        wid = 20_001 + j
        refs = [j + 1, j + 5, j + 3, j + 2]  # +4, -2, -1: signed deltas
        tags = {"highway": "residential"} if j % 2 == 0 else {}
        msg = packed(8, [zz(d) for d in deltas(refs)]) + vi(1, wid)
        if tags:
            msg += packed(2, [1]) + packed(3, [2])
        ways_msg += ld(3, msg)
        exp_ways.append({"way_id": wid, "node_refs": refs, "tags": tags})
    rels_msg, exp_rels = b"", []
    for k in range(20):
        rid = 30_001 + k
        members = [
            ("node", k + 1, "admin_centre"),
            ("way", 20_001 + k, "outer"),
            ("relation", 30_001 + ((k + 1) % 20), "subarea"),
        ]
        memids = [m[1] for m in members]
        roles = [3, 4, 5]
        types = [0, 1, 2]
        msg = (
            vi(1, rid)
            + packed(2, [6])
            + packed(3, [7])
            + packed(10, types)
            + packed(9, [zz(d) for d in deltas(memids)])
            + packed(8, roles)
        )
        rels_msg += ld(4, msg)
        exp_rels.append(
            {
                "rel_id": rid,
                "members": [
                    {"mtype": t, "ref": r, "role": role}
                    for (t, r, role) in members
                ],
                "tags": {"type": "boundary"},
            }
        )
    block = ld(1, string_table(strings)) + ld(2, ways_msg) + ld(2, rels_msg)
    return block, exp_ways, exp_rels


def block_d() -> tuple[bytes, list[dict]]:
    """10,000 dense nodes in ONE group (r7 verdict item 5: the >8k
    dense block golden_1000 tops out short of) — string-table and
    delta-coding edge cases that only appear at size:

    * 300-entry string table → keys_vals indices up to 299 need
      2-byte varints (every index in golden_1000 fits in one byte);
    * node ids emitted in a PERMUTED order (i XOR 0x155, a bijection
      on [0, 16384)) so id deltas alternate sign throughout — the
      spec allows unsorted DenseNodes ids and a decoder that assumes
      ascending ids would only break here;
    * coordinates sweep both hemispheres with granularity=25 and
      nonzero offsets, so raw values cross zero (sign-flipping zigzag
      deltas at size);
    * every 7th node tagged, cycling through the high string indices.
    """
    strings = [""] + [f"k{j:03d}" for j in range(150)] + [
        f"v{j:03d}" for j in range(149)
    ]
    assert len(strings) == 300
    gran, lat_off, lon_off = 25, -750_000, 2_250_000
    ids, lats, lons, kvs, expected = [], [], [], [], []
    for i in range(10_000):
        nid = 50_000 + (i ^ 0x155)
        lat_raw = ((i * 1_234_567) % 7_000_000_000) - 3_500_000_000
        lon_raw = ((i * 2_876_543) % 14_000_000_000) - 7_000_000_000
        ids.append(nid)
        lats.append(lat_raw)
        lons.append(lon_raw)
        if i % 7 == 0:
            ki = 1 + (i // 7) % 150          # 1..150
            vi_ = 151 + (i // 7) % 149       # 151..299
            tags = {strings[ki]: strings[vi_]}
            kvs += [ki, vi_]
        else:
            tags = {}
        kvs.append(0)
        expected.append(
            {
                "node_id": nid,
                "lat": NANO * (lat_off + gran * lat_raw),
                "lon": NANO * (lon_off + gran * lon_raw),
                "tags": tags,
            }
        )
    dense = (
        packed(8, [zz(d) for d in deltas(lats)])  # coords first: order freedom
        + packed(9, [zz(d) for d in deltas(lons)])
        + packed(1, [zz(d) for d in deltas(ids)])
        + packed(10, kvs)
    )
    block = (
        ld(1, string_table(strings))
        + vi(17, gran)
        + vi(19, lat_off)  # int64, negative → 10-byte varint
        + vi(20, lon_off)
        + ld(2, ld(2, dense))
    )
    return block, expected


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    header_block = ld(4, b"OsmSchema-V0.6") + ld(4, b"DenseNodes")
    a, exp_a = block_a()
    b, exp_b = block_b()
    c, exp_w, exp_r = block_c()
    data = (
        fileblock("OSMHeader", header_block, compress=True)
        + fileblock("OSMData", a, compress=True)
        + fileblock("OSMData", b, compress=False)  # the raw blob
        + fileblock("OSMData", c, compress=True)
    )
    expected = {"nodes": exp_a + exp_b, "ways": exp_w, "relations": exp_r}
    n = len(expected["nodes"]) + len(expected["ways"]) + len(expected["relations"])
    assert n == 1000, n
    with open(os.path.join(OUT_DIR, "golden_1000.osm.pbf"), "wb") as fh:
        fh.write(data)
    with open(os.path.join(OUT_DIR, "golden_1000.expected.json"), "w") as fh:
        json.dump(expected, fh, ensure_ascii=False, separators=(",", ":"))
    print(f"wrote golden_1000.osm.pbf ({len(data)} bytes) + expected.json "
          f"({n} elements)")

    d, exp_d = block_d()
    dense_data = (
        fileblock("OSMHeader", header_block, compress=True)
        + fileblock("OSMData", d, compress=True)
    )
    assert len(exp_d) == 10_000
    with open(os.path.join(OUT_DIR, "golden_dense_10k.osm.pbf"), "wb") as fh:
        fh.write(dense_data)
    with open(os.path.join(OUT_DIR, "golden_dense_10k.expected.json"), "w") as fh:
        json.dump({"nodes": exp_d}, fh, ensure_ascii=False,
                  separators=(",", ":"))
    print(f"wrote golden_dense_10k.osm.pbf ({len(dense_data)} bytes) "
          f"+ expected.json (10000 nodes)")


if __name__ == "__main__":
    main()
