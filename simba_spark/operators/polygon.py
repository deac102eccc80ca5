"""Polygon containment as pure Column arithmetic.

The reference supports Polygon shapes via JTS (ref: Polygon.scala:32,
build.sbt:30) in range predicates (`InRange` evaluates
MBR-intersects-shape, ref: InRange.scala:35-42). Our engine goes one
step further for the common case of a *literal* query polygon: the
even-odd (crossing number) point-in-polygon test unrolls into a fixed
sum of per-edge Column expressions — fully codegen'd, no UDF, no
shapely — and the same arithmetic is expressible in ANSI SQL for the
oracle harness.

Boundary semantics: interior OR on-edge (closed), matching the
boundary-inclusive contract of :meth:`simba_spark.geometry.Polygon.contains`.

For polygon *columns* (arbitrary per-row polygons) use the geometry
module through a pandas UDF — the slow path, kept out of hot loops.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def in_polygon(
    xcol, ycol, vertices: Sequence[Tuple[float, float]], eps: float = 1e-12
) -> Column:
    """Closed point-in-polygon for a literal 2-D polygon.

    Crossing-number parity for the interior + exact on-edge test per
    edge (distance-free formulation: collinearity cross-product within
    eps AND within the edge's closed bounding box).
    """
    x = F.col(xcol) if isinstance(xcol, str) else xcol
    y = F.col(ycol) if isinstance(ycol, str) else ycol
    vs = [(float(a), float(b)) for a, b in vertices]
    if vs[0] == vs[-1]:
        vs = vs[:-1]
    assert len(vs) >= 3, "polygon needs >= 3 vertices"

    crossings = F.lit(0)
    on_edge = F.lit(False)
    n = len(vs)
    for i in range(n):
        x1, y1 = vs[i]
        x2, y2 = vs[(i + 1) % n]
        # ray-casting: edge straddles the horizontal line through y and
        # the intersection lies strictly right of x
        straddles = (F.lit(y1) > y) != (F.lit(y2) > y)
        xin = F.lit(x2 - x1) * (y - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1) if y2 != y1 else F.lit(float("inf"))
        crossings = crossings + F.when(straddles & (x < xin), 1).otherwise(0)
        # on-edge: cross product ~ 0 and inside closed bbox of the edge
        cross = (F.lit(x2 - x1)) * (y - F.lit(y1)) - (F.lit(y2 - y1)) * (x - F.lit(x1))
        bbox = (
            (x >= F.lit(min(x1, x2))) & (x <= F.lit(max(x1, x2)))
            & (y >= F.lit(min(y1, y2))) & (y <= F.lit(max(y1, y2)))
        )
        on_edge = on_edge | ((F.abs(cross) <= F.lit(eps)) & bbox)
    return (crossings % 2 == 1) | on_edge


def in_polygon_sql(
    xexpr: str, yexpr: str, vertices: Sequence[Tuple[float, float]], eps: float = 1e-12
) -> str:
    """The identical predicate as an ANSI SQL string (DuckDB oracle)."""
    vs = [(float(a), float(b)) for a, b in vertices]
    if vs[0] == vs[-1]:
        vs = vs[:-1]
    n = len(vs)
    cross_terms = []
    edge_terms = []
    for i in range(n):
        x1, y1 = vs[i]
        x2, y2 = vs[(i + 1) % n]
        if y2 != y1:
            xin = f"(({x2} - {x1}) * ({yexpr} - {y1}) / ({y2} - {y1}) + {x1})"
            cond = (
                f"CASE WHEN (({y1} > {yexpr}) != ({y2} > {yexpr})) "
                f"AND ({xexpr} < {xin}) THEN 1 ELSE 0 END"
            )
        else:
            cond = "0"
        cross_terms.append(cond)
        cross = f"(({x2} - {x1}) * ({yexpr} - {y1}) - ({y2} - {y1}) * ({xexpr} - {x1}))"
        edge_terms.append(
            f"(abs({cross}) <= {eps} AND {xexpr} >= {min(x1, x2)} AND {xexpr} <= {max(x1, x2)}"
            f" AND {yexpr} >= {min(y1, y2)} AND {yexpr} <= {max(y1, y2)})"
        )
    return (
        "((" + " + ".join(cross_terms) + ") % 2 = 1 OR "
        + " OR ".join(edge_terms) + ")"
    )


def in_polygon_col(xcol, ycol, poly_col, eps: float = 1e-12) -> Column:
    """Closed point-in-polygon where the polygon is a COLUMN
    (`array<struct<x:double,y:double>>`) — arbitrary per-row polygons.

    Same even-odd + on-edge contract as :func:`in_polygon`, but built
    from higher-order array functions (zip_with over the vertex ring +
    aggregate) so the expression is constant-size in the vertex count
    and runs JVM-side — the reference needed a JTS object per row
    (ref: Polygon.scala:32); we never leave codegen.
    """
    x = F.col(xcol) if isinstance(xcol, str) else xcol
    y = F.col(ycol) if isinstance(ycol, str) else ycol
    p = F.col(poly_col) if isinstance(poly_col, str) else poly_col
    # edge list = ring zip: (v_i, v_{i+1 mod n})
    rot = F.concat(F.slice(p, 2, F.size(p) - 1), F.slice(p, 1, 1))
    edges = F.zip_with(p, rot, lambda a, b: F.struct(a.alias("p"), b.alias("q")))

    def edge_crossing(acc, e):
        x1, y1 = e["p"]["x"], e["p"]["y"]
        x2, y2 = e["q"]["x"], e["q"]["y"]
        straddles = (y1 > y) != (y2 > y)
        # guarded by `straddles` (horizontal edges can't straddle), so a
        # 0/0 NaN here never selects the branch
        xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
        return acc + F.when(straddles & (x < xin), 1).otherwise(0)

    def edge_touch(acc, e):
        x1, y1 = e["p"]["x"], e["p"]["y"]
        x2, y2 = e["q"]["x"], e["q"]["y"]
        cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        bbox = (
            (x >= F.least(x1, x2)) & (x <= F.greatest(x1, x2))
            & (y >= F.least(y1, y2)) & (y <= F.greatest(y1, y2))
        )
        return acc | ((F.abs(cross) <= F.lit(eps)) & bbox)

    crossings = F.aggregate(edges, F.lit(0), edge_crossing)
    on_edge = F.aggregate(edges, F.lit(False), edge_touch)
    return (crossings % 2 == 1) | on_edge


def polygon_range(
    df: DataFrame, cols: Sequence[str], vertices, registry=None
) -> DataFrame:
    """All rows whose 2-D point lies in the closed literal polygon.
    The polygon's MBR is applied first as a sargable pre-filter
    (pushes to Parquet row groups; the full test runs on survivors)."""
    assert len(cols) == 2, "polygon_range is 2-D"
    xs = [v[0] for v in vertices]
    ys = [v[1] for v in vertices]
    from ..functions import in_range

    pre = in_range(cols, (min(xs), min(ys)), (max(xs), max(ys)))
    if registry is not None:
        df = registry.prune_for_range(
            df, cols, [min(xs), min(ys)], [max(xs), max(ys)]
        )
    return df.filter(pre).filter(in_polygon(cols[0], cols[1], vertices))
