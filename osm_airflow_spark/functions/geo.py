"""Geo functions H10–H11 (SURVEY.md §2.H).

The reference's output is geodata "amenable to efficient querying"
in PostGIS (/root/reference/README.md:70,82). Spark has no geometry
type; the engine's v1 spatial surface is the prunable core:
haversine distance and bounding-box containment over plain
``lon``/``lat`` doubles — pure column expressions (no UDF), so both
stay inside whole-stage codegen and the bbox predicate pushes down
to Parquet min/max stats.

Scale notes: at 100 TB the spatial layout is a geohash-prefix
partition column — a bbox query prunes to the geohash cells it
overlaps, then applies these exact predicates. WKB geometry rides
along as an opaque BinaryType column (same pattern as multimodal
payloads, llm/multimodal.py).

The fixtures carry no lon/lat, so queries derive deterministic
synthetic coordinates from integer keys (exact double arithmetic —
reproducible in the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import query

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km as a pure column expression."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def in_bbox(lon: Column, lat: Column, west: float, south: float, east: float, north: float) -> Column:
    """Point-in-bounding-box predicate — sargable, prunable."""
    return lon.between(west, east) & lat.between(south, north)


# Synthetic coordinates from integer keys: exact double arithmetic,
# identical in any engine.
_LAT = "(CAST(c_custkey % 180 AS DOUBLE) - 90.0) * 0.9"
_LON = "(CAST((c_custkey * 7) % 360 AS DOUBLE) - 180.0) * 0.9"


@query(
    "fn_geo_distance",
    oracle=f"""
    SELECT c_custkey,
           {_LAT} AS lat,
           {_LON} AS lon,
           round(2 * 6371.0 * asin(sqrt(
               sin(radians(51.5 - ({_LAT})) / 2) * sin(radians(51.5 - ({_LAT})) / 2)
               + cos(radians({_LAT})) * cos(radians(51.5))
                 * sin(radians(-0.1 - ({_LON})) / 2) * sin(radians(-0.1 - ({_LON})) / 2)
           )), 6) AS dist_london_km
    FROM customer
    """,
)
def fn_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H10 — haversine distance to a fixed point (London), no UDF."""
    c = load_table(spark, sf_dir, "customer")
    lat = ((F.col("c_custkey") % 180).cast("double") - 90.0) * 0.9
    lon = (((F.col("c_custkey") * 7) % 360).cast("double") - 180.0) * 0.9
    return c.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
        # JVM libm and DuckDB libm differ in the last ulp of the
        # transcendentals; 6 decimals = sub-millimeter, beyond any
        # engine's trig divergence.
        F.round(haversine_km(lat, lon, F.lit(51.5), F.lit(-0.1)), 6).alias("dist_london_km"),
    )


@query(
    "fn_geo_bbox",
    oracle=f"""
    SELECT c_custkey, {_LAT} AS lat, {_LON} AS lon
    FROM customer
    WHERE ({_LON}) BETWEEN -10.0 AND 30.0
      AND ({_LAT}) BETWEEN 35.0 AND 70.0
    """,
)
def fn_geo_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H11 — point-in-bbox filter (the prunable spatial predicate;
    with a geohash partition column this becomes partition pruning)."""
    c = load_table(spark, sf_dir, "customer")
    lat = ((F.col("c_custkey") % 180).cast("double") - 90.0) * 0.9
    lon = (((F.col("c_custkey") * 7) % 360).cast("double") - 180.0) * 0.9
    return c.select("c_custkey", lat.alias("lat"), lon.alias("lon")).where(
        in_bbox(F.col("lon"), F.col("lat"), -10.0, 35.0, 30.0, 70.0)
    )


def point_in_polygon(px: Column, py: Column, poly_lons: Column, poly_lats: Column) -> Column:
    """Ray-casting point-in-polygon as one column expression (no UDF).

    Counts crossings of a horizontal ray from (px, py) against each
    polygon edge (vertex i → i+1, closed implicitly); odd crossings =
    inside. Vertices arrive as parallel lon/lat arrays — the same
    shape plans/osm.assemble_way_lines emits — so the predicate runs
    inside codegen over assembled geometries. This is the exact-test
    half of PostGIS ST_Contains for points; the prunable half is the
    bbox/geohash filter that runs first (SCALE.md layout contract).
    """
    n = F.size(poly_lons)
    idx = F.sequence(F.lit(0), n - 1)

    def crossing(i: Column) -> Column:
        j = F.when(i == 0, n - 1).otherwise(i - 1)
        xi, yi = F.element_at(poly_lons, i + 1), F.element_at(poly_lats, i + 1)
        xj, yj = F.element_at(poly_lons, j + 1), F.element_at(poly_lats, j + 1)
        crosses = (yi > py) != (yj > py)
        x_at_ray = (xj - xi) * (py - yi) / (yj - yi) + xi
        return (crosses & (px < x_at_ray)).cast("int")

    crossings = F.aggregate(
        F.transform(idx, crossing), F.lit(0), lambda acc, v: acc + v
    )
    return crossings % 2 == 1


def bearing_deg(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Initial great-circle bearing from point 1 to point 2, degrees
    in [0, 360) — the navigation/direction-of-travel companion to
    haversine_km, as one column expression."""
    dlon = F.radians(lon2 - lon1)
    y = F.sin(dlon) * F.cos(F.radians(lat2))
    x = F.cos(F.radians(lat1)) * F.sin(F.radians(lat2)) - F.sin(
        F.radians(lat1)
    ) * F.cos(F.radians(lat2)) * F.cos(dlon)
    return (F.degrees(F.atan2(y, x)) + 360.0) % 360.0


@query(
    "fn_geo_bearing",
    oracle=f"""
    SELECT c_custkey,
           round((degrees(atan2(
               sin(radians(-0.1 - ({_LON}))) * cos(radians(51.5)),
               cos(radians({_LAT})) * sin(radians(51.5))
                 - sin(radians({_LAT})) * cos(radians(51.5))
                   * cos(radians(-0.1 - ({_LON})))
           )) + 360.0) % 360.0, 6) AS bearing_london_deg,
           CAST(floor(((round((degrees(atan2(
               sin(radians(-0.1 - ({_LON}))) * cos(radians(51.5)),
               cos(radians({_LAT})) * sin(radians(51.5))
                 - sin(radians({_LAT})) * cos(radians(51.5))
                   * cos(radians(-0.1 - ({_LON})))
           )) + 360.0) % 360.0, 6) + 22.5) % 360.0) / 45.0) AS INT)
             AS compass_sector
    FROM customer
    """,
)
def fn_geo_bearing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext H17 — initial bearing toward a fixed point (London) plus
    its 8-sector compass bucket (0=N, 1=NE, ..., 7=NW). The bearing
    rounds to 6 dp before the sector binning so a last-ulp libm
    divergence can neither shift the reported degree nor flip a
    sector at a 22.5-degree boundary; the only exact-360 candidate is
    a due-north atan2(0, +x) = 0, identical in both engines. Pure
    column expressions — pipelines inside whole-stage codegen like
    the rest of the H family."""
    c = load_table(spark, sf_dir, "customer")
    lat = ((F.col("c_custkey") % 180).cast("double") - 90.0) * 0.9
    lon = (((F.col("c_custkey") * 7) % 360).cast("double") - 180.0) * 0.9
    bearing = F.round(bearing_deg(lat, lon, F.lit(51.5), F.lit(-0.1)), 6)
    sector = F.floor(((bearing + 22.5) % 360.0) / 45.0).cast("int")
    return c.select(
        "c_custkey",
        bearing.alias("bearing_london_deg"),
        sector.alias("compass_sector"),
    )


_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"
# 30-bit interleave: geohash bit 0 (MSB) is lon bit 14, bit 1 is lat
# bit 14, ... — lon holds the 15 even positions, lat the 15 odd.
_GH_LON_TERMS = [(14 - i, 29 - 2 * i) for i in range(15)]
_GH_LAT_TERMS = [(14 - i, 28 - 2 * i) for i in range(15)]


@query(
    "fn_geohash",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_LAT} AS lat, {_LON} AS lon FROM customer
    ),
    q AS (
      SELECT c_custkey, lat, lon,
             LEAST(CAST(FLOOR((lon + 180.0) / 360.0 * 32768.0) AS BIGINT),
                   32767) AS lon_q,
             LEAST(CAST(FLOOR((lat + 90.0) / 180.0 * 32768.0) AS BIGINT),
                   32767) AS lat_q
      FROM pts
    ),
    inter AS (
      SELECT c_custkey, lat, lon, lon_q, lat_q,
             {' + '.join(f'((lon_q // {1 << b}) % 2) * {1 << p}'
                         for b, p in _GH_LON_TERMS)}
             + {' + '.join(f'((lat_q // {1 << b}) % 2) * {1 << p}'
                           for b, p in _GH_LAT_TERMS)} AS bits
      FROM q
    )
    SELECT c_custkey, lat, lon,
           {' || '.join(f"substr('{_GH32}',"
                        f" CAST((bits // {1 << (25 - 5 * k)}) % 32"
                        f" AS INT) + 1, 1)" for k in range(6))} AS geohash6,
           CAST(lon_q AS BIGINT) * 360.0 / 32768.0 - 180.0 AS cell_west,
           CAST(lat_q AS BIGINT) * 180.0 / 32768.0 - 90.0 AS cell_south
    FROM inter
    """,
)
def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — full base32 GEOHASH encode at precision 6 (the
    public form of plans/osm.py's bit-prefix ``geohash_cell``): 15+15
    quantized lon/lat bits interleaved MSB-first (lon leads — the
    Niemeyer layout for even-length hashes) and read out 5 bits per
    character — the spatial partition/join key the scale notes above
    promise, emitted with the cell's SW corner so consumers can
    verify containment.

    Determinism: quantization is FLOOR of one shared IEEE tree
    (exact, no rounding boundary; the top edge clamps to the last
    cell), and everything after — the 30-term bit interleave
    (integer div/mod by power-of-two literals) and the 6-character
    table lookup — is exact integer arithmetic, identical in both
    engines. No UDF: the encode is ~40 integer column ops, fully
    inside whole-stage codegen.

    Scale: per-row map work, zero shuffles; as a partition column it
    gives prefix-range pruning (a bbox covers a contiguous set of
    cells per 5-bit level — the io.read_bbox pattern)."""
    c = load_table(spark, sf_dir, "customer")
    lat = ((F.col("c_custkey") % 180).cast("double") - 90.0) * 0.9
    lon = (((F.col("c_custkey") * 7) % 360).cast("double") - 180.0) * 0.9
    pts = c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    q = pts.select(
        "*",
        F.least(
            F.floor((F.col("lon") + 180.0) / 360.0 * 32768.0).cast("long"),
            F.lit(32767).cast("long"),
        ).alias("lon_q"),
        F.least(
            F.floor((F.col("lat") + 90.0) / 180.0 * 32768.0).cast("long"),
            F.lit(32767).cast("long"),
        ).alias("lat_q"),
    )
    bits = None
    for col in ("lon_q", "lat_q"):
        terms = _GH_LON_TERMS if col == "lon_q" else _GH_LAT_TERMS
        for b, p in terms:
            t = (F.shiftright(F.col(col), b).bitwiseAND(F.lit(1))) * (1 << p)
            bits = t if bits is None else bits + t
    inter = q.select("*", bits.alias("bits"))
    alphabet = F.array(*[F.lit(ch) for ch in _GH32])
    chars = [
        F.element_at(
            alphabet,
            (
                F.shiftright(F.col("bits"), 25 - 5 * k).bitwiseAND(F.lit(31))
            ).cast("int")
            + 1,
        )
        for k in range(6)
    ]
    return inter.select(
        "c_custkey", "lat", "lon",
        F.concat(*chars).alias("geohash6"),
        (F.col("lon_q") * 360.0 / 32768.0 - 180.0).alias("cell_west"),
        (F.col("lat_q") * 180.0 / 32768.0 - 90.0).alias("cell_south"),
    )
