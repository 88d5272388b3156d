"""Point-in-polygon (f19): algorithmic parity with an independent
Python ray-caster over every derived point, plus the join-free plan
lock."""

from __future__ import annotations

from mkpipe_extractor_clickhouse_spark.operators.geo import (
    POLYGONS,
    _flags,
)

from .test_plans import plan_of


def _inside_py(px: int, py: int, verts: list[tuple[int, int]]) -> int:
    """Independent even-odd ray-caster (same half-open rule, written
    against the algorithm statement, not the SQL renderer)."""
    n = 0
    for i in range(len(verts)):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % len(verts)]
        if y1 <= py < y2 and (px - x1) * (y2 - y1) < (x2 - x1) * (py - y1):
            n += 1
        elif y2 <= py < y1 and (px - x1) * (y2 - y1) > (x2 - x1) * (py - y1):
            n += 1
    return n % 2


def test_flags_match_python_raycaster(spark, sf_dir):
    rows = _flags(spark, sf_dir).collect()
    assert rows, "fixture produced no points"
    for r in rows:
        for p, verts in POLYGONS.items():
            assert r[f"in_{p}"] == _inside_py(r.px, r.py, verts), (
                f"event {r.event_id} ({r.px},{r.py}) poly {p}"
            )


def test_known_points_concave():
    """Hand-checked containment on the concave L: the notch region
    (x>0, y>0 outside the arm) must be OUTSIDE despite being inside
    the L's bounding box."""
    L = POLYGONS["lshape"]
    assert _inside_py(-500, -500, L) == 1  # main body
    assert _inside_py(300, 300, L) == 1  # inside the arm
    assert _inside_py(700, 300, L) == 0  # notch: bbox yes, polygon no
    assert _inside_py(950, 0, L) == 0  # fully outside
    D = POLYGONS["diamond"]
    assert _inside_py(0, 0, D) == 1
    assert _inside_py(500, 500, D) == 0  # corner of bbox, outside diamond


def test_f19_plan_is_join_free(spark, sf_dir):
    """Containment is row-local codegen: no join anywhere, and the
    only exchange is the single-row final aggregate. (A Generate IS
    expected — the 1-row stack() un-pivot above the aggregate.)"""
    plan = plan_of("f19_point_in_polygon", spark, sf_dir)
    for op in ("Join", "CartesianProduct"):
        assert op not in plan, f"unexpected {op} in f19 plan"
    assert plan.count("Exchange (") == 1, "expected exactly the final single-partition exchange"
