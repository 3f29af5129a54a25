"""Geospatial primitives: haversine distance and grid-cell binning for
bounded-radius spatial joins.

The reference's Google Maps actor (SURVEY §2.1 S5) carries lat/lon per
place; at corpus scale the natural queries over that surface are
"nearest X within R km" joins. Spark has no spatial index, but none is
needed for bounded-radius semantics: bin both sides into a C-degree
grid with C·111.19 km ≥ R on the latitude axis, explode the build side
into the neighbor cells that cover R on the longitude axis at the
band's worst-case cos(lat), and equi-join on the cell key — the
standard grid-bin spatial join (the same shape PostGIS ST_DWithin uses
with its index, re-expressed as a Catalyst equi-join so AQE can
broadcast the exploded build side).

All math is built-in column expressions (radians/sin/cos/asin/sqrt) —
JVM-side, whole-stage codegen, and replayable by a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: mean Earth radius, km (IUGG); keep in sync with the oracle literal
EARTH_RADIUS_KM = 6371.0

#: km per degree of latitude (and of longitude at the equator)
KM_PER_DEG = 111.19


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (degree) coordinate
    pairs — the haversine formula, numerically stable for the small
    angles a bounded-radius join filters to."""
    dphi = F.radians(lat2 - lat1) / 2
    dlam = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlam)
        * F.sin(dlam)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_cell(
    lat: Column, lon: Column, lat0: float, lon0: float, cell_deg: float
) -> tuple[Column, Column]:
    """(cx, cy) integer grid cell of a point in a C-degree grid anchored
    at (lat0, lon0). Pure map-side arithmetic."""
    cx = F.floor((lon - F.lit(lon0)) / F.lit(cell_deg)).cast("bigint")
    cy = F.floor((lat - F.lit(lat0)) / F.lit(cell_deg)).cast("bigint")
    return cx, cy


def neighbor_cells(
    cx: Column, cy: Column, dx_range: int, dy_range: int
) -> Column:
    """Array of (cx+dx, cy+dy) structs covering the neighborhood a
    bounded-radius probe must search. Explode this on the SMALL side of
    the join (each build row becomes (2dx+1)(2dy+1) rows keyed by every
    cell it can serve), keeping the big probe side map-only."""
    return F.array(
        *[
            F.struct(
                (cx + F.lit(dx)).alias("cx"), (cy + F.lit(dy)).alias("cy")
            )
            for dx in range(-dx_range, dx_range + 1)
            for dy in range(-dy_range, dy_range + 1)
        ]
    )


def radius_cover(
    radius_km: float, cell_deg: float, max_abs_lat_deg: float
) -> tuple[int, int]:
    """(dx_range, dy_range) such that the neighbor grid provably covers
    every point within radius_km, for ANY parameterization (not just the
    catalog's 250 km / 2.5° config).

    Latitude degrees are constant-width. Longitude needs the exact span:
    at latitude phi the great-circle radius R reaches dlam =
    2*asin(sin(R/2Re)/cos(phi)) of longitude (inverse haversine with
    dphi=0) — strictly larger than the planar R/(111.19*cos(phi))
    approximation, which under-covered near its boundary. Both ranges
    use floor+1 instead of ceil so an exact-integer cell span still
    keeps a strictly positive slack cell, and the radius is padded by
    1e-3 km to absorb the join's round-to-4-dp of dist_km before the
    <= radius filter."""
    import math

    r = radius_km + 1e-3  # swallow the 4-dp dist rounding at the boundary
    dy = math.floor(r / (KM_PER_DEG * cell_deg)) + 1
    s = math.sin(r / (2.0 * EARTH_RADIUS_KM)) / math.cos(
        math.radians(max_abs_lat_deg)
    )
    dlon_deg = 180.0 if s >= 1.0 else math.degrees(2.0 * math.asin(s))
    dx = min(math.floor(dlon_deg / cell_deg) + 1, math.ceil(180.0 / cell_deg))
    return dx, dy


def within_radius_join(
    probe: DataFrame,
    build: DataFrame,
    radius_km: float,
    cell_deg: float,
    lat0: float,
    lon0: float,
    max_abs_lat_deg: float,
    probe_cols: tuple[str, str] = ("lat", "lon"),
    build_cols: tuple[str, str] = ("b_lat", "b_lon"),
) -> DataFrame:
    """All (probe, build) pairs within ``radius_km``, via the grid-bin
    equi-join: build side exploded into its covering neighbor cells
    (broadcast when small), probe side keyed by its own cell only. The
    haversine filter after the cell join makes the semantics EXACT —
    binning only bounds the candidate set, it never decides membership.
    Returns probe.* ++ build.* ++ dist_km (rounded to 4)."""
    plat, plon = (F.col(c) for c in probe_cols)
    blat, blon = (F.col(c) for c in build_cols)
    dxr, dyr = radius_cover(radius_km, cell_deg, max_abs_lat_deg)
    bcx, bcy = grid_cell(blat, blon, lat0, lon0, cell_deg)
    b = build.withColumn(
        "cell", F.explode(neighbor_cells(bcx, bcy, dxr, dyr))
    ).select("*", "cell.cx", "cell.cy").drop("cell")
    pcx, pcy = grid_cell(plat, plon, lat0, lon0, cell_deg)
    # spread: the probe side carries the post-join haversine over every
    # cell candidate — the expensive stage — and a small-file probe scan
    # arrives as 1-2 splits, serializing it on one core (measured 3.7 s
    # -> ~1 s at sf0.1). No-op at real scale (see partitioning.spread).
    from backend_etl_spark.operators.partitioning import spread

    p = spread(probe).withColumn("cx", pcx).withColumn("cy", pcy)
    cand = p.join(F.broadcast(b), ["cx", "cy"]).drop("cx", "cy")
    dist = F.round(haversine_km(plat, plon, blat, blon), 4)
    return cand.withColumn("dist_km", dist).where(
        F.col("dist_km") <= radius_km
    )
