"""Spatial operators: grid-indexed distance joins over lat/lon columns.

The reference has no geo surface, but any analytics engine serving a
100 TB event/entity corpus grows one (GeoSpark/Sedona, PostGIS): the
canonical scale pattern is implemented here Spark-first —

- **Grid bucketing**: every point maps to a fixed-size lat/lon cell
  (``cell_size_deg``). A distance join then becomes an EQUI-join on the
  cell key after exploding one side to the neighbor cells its radius
  can reach — Catalyst shuffles on the cell key (or broadcasts the
  small side), and the O(n·m) cross product never materializes. This
  is exactly Sedona's grid/KDB partition join re-expressed with
  explode + join.
- **Neighbor bound**: a radius R km reaches ``ceil(R / (111.32 ·
  cell))`` cells in latitude; longitude degrees shrink by cos(lat), so
  the longitude reach is computed at the worst (highest) |lat| the data
  can hold — a conservative, provably-covering offset set. The bound is
  computed in :func:`neighbor_offsets`, not hand-picked.
- **Haversine** is evaluated as one Catalyst expression tree (pure
  ``sin/cos/asin`` math, no UDF) — the identical tree is emitted for
  the DuckDB oracle so both engines agree to the ulp. The asin argument
  is clamped with ``least(1.0, ·)``: mathematically ≤ 1, but the float
  sum can land at 1 + ε and asin would return NaN.

Skew note (100 TB): urban-density cells are the classic hot key. The
join here keys on (cell_lat, cell_lon); a skewed deployment salts the
dense cells exactly as operators/joins.py's salted variants do, or
lets AQE's skew-join split them — the cell key is just an ordinary
join key to Catalyst.

Testdata has no geo columns, so the queries SYNTHESIZE deterministic
coordinates from stable integer keys (pure integer arithmetic — both
engines compute the identical values); the operators themselves take
any lat/lon columns.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
KM_PER_DEG_LAT = 111.32


# ---------------------------------------------------------- synth coords


def synth_lat_col(key: Column) -> Column:
    """Deterministic pseudo-latitude in [−60, 60) from an int key."""
    return ((key * F.lit(7919)) % F.lit(12000)) / F.lit(100.0) - F.lit(60.0)


def synth_lon_col(key: Column) -> Column:
    """Deterministic pseudo-longitude in [−180, 180) from an int key."""
    return ((key * F.lit(104729)) % F.lit(36000)) / F.lit(100.0) - F.lit(
        180.0
    )


def synth_lat_sql(expr: str) -> str:
    return f"((({expr}) * 7919) % 12000) / 100.0 - 60.0"


def synth_lon_sql(expr: str) -> str:
    return f"((({expr}) * 104729) % 36000) / 100.0 - 180.0"


# -------------------------------------------------------------- haversine


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km, one codegen-able expression tree."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / F.lit(2.0)
    dlon = F.radians(lon2 - lon1) / F.lit(2.0)
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(
        dlon
    ) * F.sin(dlon)
    return (
        F.lit(2.0)
        * F.lit(EARTH_RADIUS_KM)
        * F.asin(F.sqrt(F.least(F.lit(1.0), a)))
    )


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Oracle twin of :func:`haversine_km` — same tree, DuckDB syntax."""
    a = (
        f"(sin(radians(({lat2}) - ({lat1})) / 2.0)"
        f" * sin(radians(({lat2}) - ({lat1})) / 2.0)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians(({lon2}) - ({lon1})) / 2.0)"
        f" * sin(radians(({lon2}) - ({lon1})) / 2.0))"
    )
    return f"(2.0 * {EARTH_RADIUS_KM!r} * asin(sqrt(least(1.0, {a}))))"


# -------------------------------------------------------------- grid join


def cell_cols(lat: Column, lon: Column, cell_size_deg: float):
    """(cell_lat, cell_lon) int grid keys for a point."""
    return (
        F.floor(lat / F.lit(cell_size_deg)).cast("int"),
        F.floor(lon / F.lit(cell_size_deg)).cast("int"),
    )


def neighbor_offsets(
    radius_km: float, cell_size_deg: float, max_abs_lat_deg: float
) -> list[tuple[int, int]]:
    """Every (dlat, dlon) cell offset a ``radius_km`` disc can reach.

    Longitude reach is evaluated at the polemost latitude the DATA can
    attain plus the probe's own reach (the disc's top edge), so the
    cos() shrink is taken at its worst point — conservative cover."""
    reach_lat = math.ceil(radius_km / (KM_PER_DEG_LAT * cell_size_deg))
    worst_lat = min(89.0, abs(max_abs_lat_deg) + radius_km / KM_PER_DEG_LAT)
    km_per_deg_lon = KM_PER_DEG_LAT * math.cos(math.radians(worst_lat))
    # cap at half the lon cells: beyond that the wrap (grid_distance_join
    # joins on pmod'ed cell ids) would co-bucket a pair through two
    # routes and duplicate it; half-globe reach already covers everything
    reach_lon = min(
        math.ceil(radius_km / (km_per_deg_lon * cell_size_deg)),
        (int(360.0 / cell_size_deg) - 1) // 2,
    )
    return [
        (dlat, dlon)
        for dlat in range(-reach_lat, reach_lat + 1)
        for dlon in range(-reach_lon, reach_lon + 1)
    ]


def grid_distance_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    cell_size_deg: float = 5.0,
    max_abs_lat_deg: float = 60.0,
    broadcast_right: bool = True,
) -> DataFrame:
    """All (left, right) pairs within ``radius_km``, via the grid.

    ``left`` / ``right`` need ``lat`` / ``lon`` columns (right's are
    read as ``r_lat`` / ``r_lon`` in the output). The RIGHT side is
    exploded to its neighbor cells (choose the smaller side) and, by
    default, broadcast — a dim-sized probe set against a corpus-sized
    left is the common shape. With both sides large, set
    ``broadcast_right=False``: the equi-join shuffles both sides by
    cell key and AQE handles dense-cell skew.

    Returns left.* + right.* + ``dist_km`` (unquantized).

    Longitude cells WRAP at the ±180° antimeridian (cell index taken
    modulo 360/cell_size on both sides) — a pair straddling the date
    line is as close as any other; the haversine itself is wrap-safe
    through sin²(Δλ/2)'s periodicity, but an unwrapped cell index
    would never co-bucket the pair (caught by the brute-force property
    test, tests/test_gov.py)."""
    n_lon_cells = 360.0 / cell_size_deg
    if n_lon_cells != int(n_lon_cells):
        raise ValueError("cell_size_deg must divide 360")
    n_lon_cells = int(n_lon_cells)

    lc_lat, lc_lon = cell_cols(F.col("lat"), F.col("lon"), cell_size_deg)
    l = left.withColumn("cell_lat", lc_lat).withColumn(
        "cell_lon", F.pmod(lc_lon, F.lit(n_lon_cells))
    )

    offsets = neighbor_offsets(radius_km, cell_size_deg, max_abs_lat_deg)
    off_expr = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(dlat).alias("dlat"), F.lit(dlon).alias("dlon")
                )
                for dlat, dlon in offsets
            ]
        )
    )
    rc_lat, rc_lon = cell_cols(
        F.col("r_lat"), F.col("r_lon"), cell_size_deg
    )
    r = (
        right.withColumnRenamed("lat", "r_lat")
        .withColumnRenamed("lon", "r_lon")
        .withColumn("off", off_expr)
        .withColumn("cell_lat", rc_lat + F.col("off.dlat"))
        .withColumn(
            "cell_lon",
            F.pmod(rc_lon + F.col("off.dlon"), F.lit(n_lon_cells)),
        )
        .drop("off")
    )
    if broadcast_right:
        r = F.broadcast(r)
    dist = haversine_km(
        F.col("lat"), F.col("lon"), F.col("r_lat"), F.col("r_lon")
    )
    return (
        l.join(r, ["cell_lat", "cell_lon"])
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") < F.lit(radius_km))
        .drop("cell_lat", "cell_lon")
    )
