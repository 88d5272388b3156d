"""Point-in-polygon (planar geo containment) in PURE integer
arithmetic — the capability behind ClickHouse's ``pointInPolygon``
(public docs: SELECT pointInPolygon((x, y), [(a1, b1), ...])), which
the dialect deliberately refuses to rewrite from a string (tuple-
literal surgery is unsafe — sources/ch_dialect.py) and routes here.

Algorithm: the even-odd ray-casting rule (Shimrat, CACM 1962; the
"crossing number" formulation in Franklin's public PNPOLY notes). A
point is inside iff a horizontal ray to +inf crosses the polygon
boundary an odd number of times. Each edge (x1,y1)->(x2,y2)
contributes a crossing when the point's y straddles the edge's span
under the HALF-OPEN rule (min end included, max end excluded — the
standard trick that counts a shared vertex exactly once) and the
point lies strictly left of the edge at that height. The "left of"
test is the cross-product comparison

    (px - x1) * (y2 - y1)  <  (x2 - x1) * (py - y1)     (y2 > y1)

with the inequality flipped for downward edges — NO division, so with
integer vertices and integer points every comparison is exact and the
result is deterministic bit-for-bit in any engine. Horizontal edges
self-exclude (y1 <= py < y2 is unsatisfiable when y1 = y2).

Scale shape: the polygon set is tiny and LITERAL, so each polygon's
crossing count renders as a fixed sum of per-edge CASE terms — pure
row-local codegen, no join, no explode. A 100 TB point table streams
through WholeStageCodegen and the only shuffle is the final
single-row aggregate (partial sums map-side). The per-edge terms are
rendered from ONE Python loop into the SAME ANSI text for Spark and
the DuckDB oracle (the f16_geohash determinism pattern), so the
expression trees are identical by construction. Boundary points
follow the half-open rule identically in both engines — the
convention IS the contract, as in ClickHouse whose pointInPolygon
documents boundary behavior as implementation-defined.

The fixture ships no geo columns, so point coordinates derive from
event_id by an exact integer congruence (affine LCG step mod a
2001-wide grid) — same expression both engines, no floats anywhere.

Reference anchor: geo predicates ride the reference's query
passthrough (reference __init__.py:26-43); this implements the
containment primitive natively so a ``pointInPolygon`` workload has a
first-class, oracle-checked home.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# Integer point derivation: px, py in [-1000, 1000] via multiplicative
# congruences (Lehmer/Park-Miller multipliers — public constants).
PX_SQL = "(event_id * 48271) % 2001 - 1000"
PY_SQL = "(event_id * 69621) % 2001 - 1000"

# Literal polygons (integer vertices, counter-clockwise): a convex
# axis-aligned square, a CONCAVE L (exercises even-odd parity > 1
# crossing), and a rotated diamond (exercises the cross-product branch
# on non-axis-aligned edges).
POLYGONS: dict[str, list[tuple[int, int]]] = {
    "diamond": [(0, -800), (800, 0), (0, 800), (-800, 0)],
    "lshape": [(-900, -900), (0, -900), (0, 0), (600, 0), (600, 600), (-900, 600)],
    "square": [(-500, -500), (500, -500), (500, 500), (-500, 500)],
}


def _edge_term(
    x1: int, y1: int, x2: int, y2: int, px: str = "px", py: str = "py"
) -> str:
    """One edge's crossing contribution as a shared ANSI CASE term.
    ``px``/``py`` are the point-coordinate EXPRESSIONS (column names
    here; arbitrary parenthesized expressions when the dialect renders
    a user's ``pointInPolygon`` call)."""
    lit = lambda v: f"({v})" if v < 0 else str(v)  # noqa: E731
    x1s, y1s, x2s, y2s = lit(x1), lit(y1), lit(x2), lit(y2)
    cross = f"({px} - {x1s}) * ({y2s} - {y1s})"
    rhs = f"({x2s} - {x1s}) * ({py} - {y1s})"
    up = f"({y1s} <= {py} AND {py} < {y2s} AND {cross} < {rhs})"
    down = f"({y2s} <= {py} AND {py} < {y1s} AND {cross} > {rhs})"
    return f"CASE WHEN {up} OR {down} THEN 1 ELSE 0 END"


def crossings_sql_verts(
    verts: list[tuple[int, int]], px: str = "px", py: str = "py"
) -> str:
    """Total boundary crossings of the +x ray from (px, py) for an
    arbitrary integer-vertex polygon — a fixed sum of per-edge CASE
    terms, identical text for Spark and DuckDB. The dialect's
    ``pointInPolygon`` rewrite calls this with the user's literal
    vertices."""
    terms = [
        _edge_term(*verts[i], *verts[(i + 1) % len(verts)], px=px, py=py)
        for i in range(len(verts))
    ]
    return "(" + " + ".join(terms) + ")"


def crossings_sql(poly: str) -> str:
    """Crossing count for one of the module's named fixture polygons."""
    return crossings_sql_verts(POLYGONS[poly])


def inside_sql(poly: str) -> str:
    """Even-odd containment flag (1 inside, 0 outside)."""
    return f"({crossings_sql(poly)}) % 2"


def _flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        F.expr(PX_SQL).alias("px"),
        F.expr(PY_SQL).alias("py"),
    )
    return pts.select(
        "event_id",
        "px",
        "py",
        *[F.expr(inside_sql(p)).alias(f"in_{p}") for p in POLYGONS],
    )


_ORACLE_AGG = " UNION ALL ".join(
    f"""
    SELECT '{p}' AS poly,
           CAST(SUM(in_{p}) AS BIGINT) AS inside_pts,
           CAST(SUM(event_id * in_{p}) AS BIGINT) AS id_checksum
    FROM flags
    """
    for p in POLYGONS
)


@register(
    "f19_point_in_polygon",
    oracle=f"""
    WITH pts AS (
      SELECT event_id,
             {PX_SQL} AS px,
             {PY_SQL} AS py
      FROM events
    ),
    flags AS (
      SELECT event_id,
             {inside_sql('diamond')} AS in_diamond,
             {inside_sql('lshape')} AS in_lshape,
             {inside_sql('square')} AS in_square
      FROM pts
    )
    SELECT * FROM ({_ORACLE_AGG}) ORDER BY poly
    """,
    tags=("F3", "EXT", "geo", "pointInPolygon"),
)
def f19_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify every derived event point against three literal
    polygons (convex, concave, rotated) with exact integer
    ray-casting; per polygon, how many points fall inside plus an
    id-sum checksum that pins WHICH points, not just how many. The
    plan is join-free: per-polygon crossing sums are row-local codegen
    and the only exchange is the final single-row partial aggregate."""
    flags = _flags(spark, sf_dir)
    agg = flags.agg(
        *[F.sum(f"in_{p}").alias(f"n_{p}") for p in POLYGONS],
        *[
            F.sum(F.col("event_id") * F.col(f"in_{p}")).alias(f"c_{p}")
            for p in POLYGONS
        ],
    )
    stack_args = ", ".join(f"'{p}', n_{p}, c_{p}" for p in POLYGONS)
    return agg.select(
        F.expr(
            f"stack({len(POLYGONS)}, {stack_args}) "
            "AS (poly, inside_pts, id_checksum)"
        )
    ).orderBy("poly")
