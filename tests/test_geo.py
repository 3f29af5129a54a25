"""Unit tests for the grid-bin spatial join beyond the oracle-parity
gate: haversine ground truth, the radius-cover guarantee, and the
exactness property (binning may only bound candidates, never change
membership)."""

import math

from pyspark.sql import functions as F

from backend_etl_spark.catalog.registry import REGISTRY
from backend_etl_spark.operators import geo


def _dist(spark, a, b):
    df = spark.createDataFrame([a + b], ["lat1", "lon1", "lat2", "lon2"])
    return df.select(
        geo.haversine_km(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        ).alias("d")
    ).collect()[0]["d"]


class TestHaversine:
    def test_known_distances(self, spark):
        # one degree of latitude anywhere ~ 111.19 km
        assert abs(_dist(spark, (50.0, 7.0), (51.0, 7.0)) - 111.19) < 0.1
        # Paris (48.8566, 2.3522) - London (51.5074, -0.1278) ~ 343.5 km
        d = _dist(spark, (48.8566, 2.3522), (51.5074, -0.1278))
        assert abs(d - 343.5) < 1.5, d
        # degenerate: zero distance
        assert _dist(spark, (45.0, 10.0), (45.0, 10.0)) == 0.0

    def test_symmetry(self, spark):
        a, b = (42.5, -3.25), (58.1, 24.0)
        assert abs(_dist(spark, a, b) - _dist(spark, b, a)) < 1e-9


class TestRadiusCover:
    def test_cover_bounds(self):
        # the entry's configuration: 250 km in 2.5-degree cells, band to 60N
        dx, dy = geo.radius_cover(250.0, 2.5, 60.0)
        assert (dx, dy) == (2, 1)
        # tighter cells need wider neighborhoods
        dx2, dy2 = geo.radius_cover(250.0, 1.0, 60.0)
        assert dx2 >= dx and dy2 >= dy

    def test_no_pair_within_radius_escapes_the_neighborhood(self):
        # adversarial analytic check on the guarantee the join relies on:
        # any pair within R km has |dlat| <= R/111.19 and
        # |dlon| <= R/(111.19*cos(60)) in the band, so cell deltas are
        # bounded by the computed ranges
        r, c, maxlat = 250.0, 2.5, 60.0
        dx, dy = geo.radius_cover(r, c, maxlat)
        max_dlat = r / geo.KM_PER_DEG
        max_dlon = r / (geo.KM_PER_DEG * math.cos(math.radians(maxlat)))
        assert max_dlat <= dy * c
        assert max_dlon <= dx * c


class TestBinnedJoinExactness:
    def test_matches_brute_force_on_adversarial_points(self, spark):
        # points seeded on cell boundaries and corners — where an
        # off-by-one in the neighborhood would drop pairs
        lat0, lon0, cell, r = 40.0, -10.0, 2.5, 250.0
        pts = []
        k = 0
        for i in range(8):
            for j in range(8):
                lat = lat0 + i * cell  # exact cell corners
                lon = lon0 + j * cell
                pts.append((k, lat, lon))
                pts.append((k + 1, lat + 1e-6, lon - 1e-6))
                k += 2
        probe = spark.createDataFrame(pts, ["pid", "lat", "lon"])
        build = spark.createDataFrame(
            [(i, lat, lon) for i, lat, lon in pts], ["bid", "b_lat", "b_lon"]
        )
        binned = geo.within_radius_join(
            probe, build, r, cell, lat0, lon0, max_abs_lat_deg=60.0
        ).select("pid", "bid", "dist_km")
        brute = (
            probe.crossJoin(build)
            .withColumn(
                "dist_km",
                F.round(
                    geo.haversine_km(
                        F.col("lat"), F.col("lon"), F.col("b_lat"), F.col("b_lon")
                    ),
                    4,
                ),
            )
            .where(F.col("dist_km") <= r)
            .select("pid", "bid", "dist_km")
        )
        assert binned.subtract(brute).count() == 0
        assert brute.subtract(binned).count() == 0

    def test_catalog_entry_argmin_is_true_minimum(self, spark, sf_dir):
        rows = REGISTRY["geo_nearest_supplier_binned"].fn(spark, sf_dir).collect()
        assert len(rows) > 0
        by_cust = {r["c_custkey"]: r for r in rows}
        assert len(by_cust) == len(rows), "one row per customer"
        for r in rows:
            assert 0 <= r["dist_km"] <= 250.0
            assert r["n_within"] >= 1
