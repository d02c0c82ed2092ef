"""Geo: haversine distance, lat/lon grid binning, CoordinateLinker.

Semantics of mismo/lib/geo/_latlon.py:16-301 — all pure column math
(Catalyst constant-folds the degree/radian constants).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark.linker.key import KeyLinker
from mismo_spark.types.linkage import Linkage

_R_EARTH_KM = 6371.0
_KM_PER_LAT = math.pi * _R_EARTH_KM / 180.0


def distance_km(
    *, lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (mismo/lib/geo/_latlon.py:16-57)."""
    scale = math.pi / 180.0
    rlat1, rlon1, rlat2, rlon2 = (
        lat1 * scale,
        lon1 * scale,
        lat2 * scale,
        lon2 * scale,
    )

    def hav(theta: Column) -> Column:
        return F.pow(F.sin(theta / 2), 2)

    a = hav(rlat2 - rlat1) + F.cos(rlat1) * F.cos(rlat2) * hav(rlon2 - rlon1)
    return (2 * _R_EARTH_KM) * F.asin(F.sqrt(a))


def bin_lat_lon(
    lat: Column, lon: Column, grid_size_km: float
) -> tuple[Column, Column]:
    """Bin coordinates to an integer grid of ~grid_size_km
    (mismo/lib/geo/_latlon.py:265-301).  Two points within grid_size_km
    of each other are in the same or adjacent cells."""
    km_per_lon = F.cos(lat * (math.pi / 180.0)) * _KM_PER_LAT
    lat_bin = F.floor(lat / (grid_size_km / _KM_PER_LAT)).cast("long")
    lon_bin = F.floor(lon / (grid_size_km / km_per_lon)).cast("long")
    both_null = lat.isNull() & lon.isNull()
    return (
        F.when(both_null, F.lit(None).cast("long")).otherwise(lat_bin),
        F.when(both_null, F.lit(None).cast("long")).otherwise(lon_bin),
    )


class CoordinateLinker:
    """Block records whose coordinates land in the same grid cell; the
    grid is 3× the target distance so near-boundary pairs still share a
    cell in most cases (mismo/lib/geo/_latlon.py:116-262)."""

    def __init__(
        self,
        *,
        distance_km: float,
        lat_column: str = "lat",
        lon_column: str = "lon",
        task: str | None = None,
        max_pairs: int | None = None,
    ) -> None:
        grid = 3.0 * distance_km

        def key(df: DataFrame) -> list[Column]:
            return list(bin_lat_lon(df[lat_column], df[lon_column], grid))

        self._key_linker = KeyLinker([key], task=task, max_pairs=max_pairs)

    def __call__(self, left: DataFrame, right: DataFrame | None = None) -> Linkage:
        return self._key_linker(left, right)

    def key_counts(self, df: DataFrame) -> DataFrame:
        return self._key_linker.key_counts(df)

    def pair_counts(self, left: DataFrame, right: DataFrame | None = None) -> DataFrame:
        return self._key_linker.pair_counts(left, right)
