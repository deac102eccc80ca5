"""Spherical (lat/lon) spatial operators — haversine range, kNN, and
distance join.

The reference engine's predicates are Euclidean
(ref: src/main/scala/org/apache/spark/sql/simba/spatial/Point.scala —
minDist is L2); real-world location columns are WGS-84 degrees, where
L2 over (lat, lon) distorts with latitude and breaks at the antimeridian.
This module is the spherical counterpart of `operators/filters.py` /
`operators/distance_join.py`: the same plan shapes (sargable
prefilter → exact refine; grid-cell equi-join → exact refine), with
great-circle arithmetic.

Scale design mirrors the Euclidean family:
- `geo_circle_range`: a SARGABLE bounding-box prefilter (lat between,
  lon between — pushed to Parquet row groups) guards the exact
  haversine refine; the box handles antimeridian wrap (two lon ranges)
  and polar caps (lon filter dropped) instead of silently missing
  rows.
- `geo_knn`: exact global top-k by haversine — TakeOrderedAndProject,
  k rows to the driver.
- `geo_distance_join`: latitude-banded grid blocking. Bands are
  `radius`-tall; within band b the lon cell width is derived FROM THE
  BAND INDEX (at the band's max |lat|, clamped at 89.9°), so both
  sides compute identical equi-join keys without agreeing on a global
  width that near-polar data would blow up. The left side replicates
  to its 3×3 cell neighborhood (wrap via modulo); the right side
  keys each row once, so every candidate pair is emitted exactly once
  — one equi-join + exact haversine refine, no cartesian anywhere.

All arithmetic is plain Column math (radians/sin/cos/asin/sqrt) —
codegen'd, engine-portable, mirrored term-for-term by the SQL
oracles.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088
#: km per degree of latitude (and of longitude at the equator)
_KM_PER_DEG = EARTH_RADIUS_KM * math.pi / 180.0
#: cos() guard: bands touching the pole get one single cell
_MAX_BAND_LAT = 89.9


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km between two (lat, lon) degree
    pairs — 2R·asin(min(1, √(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))).
    Pure Column arithmetic; the min() clamps float drift past the
    asin domain on antipodal pairs."""
    la1, lo1 = F.radians(lat1), F.radians(lon1)
    la2, lo2 = F.radians(lat2), F.radians(lon2)
    sdla = F.sin((la2 - la1) / 2)
    sdlo = F.sin((lo2 - lo1) / 2)
    h = sdla * sdla + F.cos(la1) * F.cos(la2) * sdlo * sdlo
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(
        F.least(F.lit(1.0), F.sqrt(h)))


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB mirror of :func:`haversine_km`, term-for-term."""
    return (
        f"2.0 * {EARTH_RADIUS_KM!r} * asin(least(1.0::DOUBLE, sqrt("
        f"sin((radians({lat2}) - radians({lat1})) / 2)"
        f" * sin((radians({lat2}) - radians({lat1})) / 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin((radians({lon2}) - radians({lon1})) / 2)"
        f" * sin((radians({lon2}) - radians({lon1})) / 2))))"
    )


def geo_circle_range(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    center: Tuple[float, float],
    radius_km: float,
) -> DataFrame:
    """All rows within ``radius_km`` of ``center`` (closed bound, like
    ``in_circle_range``). Sargable bbox prefilter + exact refine;
    antimeridian wrap becomes two lon ranges, a polar-cap box drops
    the lon filter (every longitude qualifies near the pole)."""
    clat, clon = float(center[0]), float(center[1])
    r = float(radius_km)
    if r < 0:
        raise ValueError("radius_km must be >= 0")
    dlat = r / _KM_PER_DEG
    lat = F.col(lat_col).cast("double")
    lon = F.col(lon_col).cast("double")
    pre = lat.between(clat - dlat, clat + dlat)
    if abs(clat) + dlat < _MAX_BAND_LAT:
        dlon = r / (_KM_PER_DEG *
                    math.cos(math.radians(min(abs(clat) + dlat,
                                              _MAX_BAND_LAT))))
        lo, hi = clon - dlon, clon + dlon
        if dlon < 180.0:
            if lo < -180.0:
                pre = pre & ((lon >= lo + 360.0) | (lon <= hi))
            elif hi > 180.0:
                pre = pre & ((lon >= lo) | (lon <= hi - 360.0))
            else:
                pre = pre & lon.between(lo, hi)
    dist = haversine_km(lat, lon, F.lit(clat), F.lit(clon))
    return df.filter(pre & (dist <= r))


def geo_knn(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    center: Tuple[float, float],
    k: int,
    tiebreak: Optional[str] = None,
    out_col: str = "dist_km",
) -> DataFrame:
    """Exact k nearest rows to ``center`` by great-circle distance —
    TakeOrderedAndProject (k rows cross the wire), deterministic with
    a ``tiebreak`` column."""
    clat, clon = float(center[0]), float(center[1])
    d = haversine_km(F.col(lat_col).cast("double"),
                     F.col(lon_col).cast("double"),
                     F.lit(clat), F.lit(clon))
    order = [F.col(out_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    return df.withColumn(out_col, d).orderBy(*order).limit(int(k))


def _band_width_deg(band, radius_km: float):
    """Lon cell width (degrees) for a lat band, derived from the BAND
    INDEX so both join sides compute identical keys: evaluated at the
    band's max |lat|, clamped at _MAX_BAND_LAT (polar bands collapse
    to one 360° cell)."""
    dlat = radius_km / _KM_PER_DEG
    band_max_abs = F.greatest(
        F.abs(band.cast("double") * dlat),
        F.abs((band.cast("double") + 1) * dlat),
    )
    capped = F.least(band_max_abs, F.lit(_MAX_BAND_LAT))
    w = F.lit(radius_km) / (F.lit(_KM_PER_DEG) * F.cos(F.radians(capped)))
    return F.when(band_max_abs >= _MAX_BAND_LAT, F.lit(360.0)) \
        .otherwise(F.least(w, F.lit(360.0)))


def geo_distance_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_l: str = "lat",
    lon_l: str = "lon",
    lat_r: str = "lat",
    lon_r: str = "lon",
    left_prefix: str = "",
    right_prefix: str = "",
    out_col: str = "dist_km",
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` great-circle km
    (closed bound). Latitude-banded grid equi-join + exact refine —
    the spherical `DJSpark` analog
    (ref: src/main/scala/org/apache/spark/sql/simba/execution/join/DJSpark.scala:44-100,
    same partition-join-refine shape, spherical metric).

    The left row replicates to its 3×3 (band, lon-cell) neighborhood
    (9 skinny rows; lon cells wrap via modulo so the antimeridian
    needs no special casing); the right row is keyed ONCE, so each
    qualifying pair appears exactly once. Lon cell width varies per
    band (computed from the band index at the band's max |lat|) —
    thin cells at the equator, one full-circle cell at the poles —
    so the key space stays balanced without a data-dependent global
    constant. One shuffle on (band, cell), AQE handles residual skew.
    """
    from .distance_join import _prefix_columns

    r = float(radius_km)
    if r < 0:
        raise ValueError("radius_km must be >= 0")
    left = _prefix_columns(left, left_prefix)
    right = _prefix_columns(right, right_prefix)
    lat_l, lon_l = left_prefix + lat_l, left_prefix + lon_l
    lat_r, lon_r = right_prefix + lat_r, right_prefix + lon_r
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"geo_distance_join: overlapping output columns {sorted(overlap)}"
            " — disambiguate with left_prefix/right_prefix")
    dlat = r / _KM_PER_DEG

    def keyed(df, lat_c, lon_c, replicate: bool):
        lat = F.col(lat_c).cast("double")
        lon = F.col(lon_c).cast("double")
        band = F.floor(lat / F.lit(dlat)).cast("long")
        if not replicate:
            w = _band_width_deg(band, r)
            ncell = F.greatest(F.ceil(F.lit(360.0) / w),
                               F.lit(1)).cast("long")
            cell = F.floor((lon + F.lit(180.0)) / w).cast("long")
            return df.withColumn("__gb", band) \
                     .withColumn("__gc", cell % ncell)
        # replicate: the 3x3 (band, cell) neighborhood as ONE
        # array_distinct'd explode — a 1-cell polar band collapses its
        # three lon-neighbors to one struct without touching row
        # multiplicity (a row-level dropDuplicates would eat
        # legitimately duplicated input rows)
        structs = []
        for db in (-1, 0, 1):
            b = band + db
            w = _band_width_deg(b, r)
            ncell = F.greatest(F.ceil(F.lit(360.0) / w),
                               F.lit(1)).cast("long")
            cell = F.floor((lon + F.lit(180.0)) / w).cast("long")
            for dc in (-1, 0, 1):
                c = ((cell + dc) % ncell + ncell) % ncell
                structs.append(F.struct(b.alias("b"), c.alias("c")))
        out = df.withColumn(
            "__gp", F.explode(F.array_distinct(F.array(*structs))))
        return out.withColumn("__gb", F.col("__gp")["b"]) \
                  .withColumn("__gc", F.col("__gp")["c"]) \
                  .drop("__gp")

    lk = keyed(left, lat_l, lon_l, replicate=True)
    rk = keyed(right, lat_r, lon_r, replicate=False)
    joined = lk.join(rk, on=["__gb", "__gc"])
    dist = haversine_km(
        F.col(lat_l).cast("double"), F.col(lon_l).cast("double"),
        F.col(lat_r).cast("double"), F.col(lon_r).cast("double"))
    return (
        joined.withColumn(out_col, dist)
        .filter(F.col(out_col) <= r)
        .drop("__gb", "__gc")
    )
