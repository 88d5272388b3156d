"""Property test for the dialect translator: any composition of
documented-subset constructs must translate into Spark SQL that parses,
analyzes, and EXECUTES. This catches rewrite-order and paren-splitting
bugs (nested calls, commas inside string literals, swaps feeding swaps)
that example tests cannot enumerate."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mkpipe_extractor_clickhouse_spark.catalog import register_views
from mkpipe_extractor_clickhouse_spark.sources.ch_dialect import translate

# -- expression grammar over the events table --------------------------------

num_leaf = st.sampled_from(["value", "event_id", "7", "2.5", "user_id"])
ts_leaf = st.just("ts")
str_leaf = st.sampled_from(["event_type", "'click'", "'a_b'"])


def num_expr(depth: int) -> st.SearchStrategy[str]:
    if depth == 0:
        return num_leaf
    sub = num_expr(depth - 1)
    b = bool_expr(depth - 1)
    arr = arr_expr(depth - 1)
    return st.one_of(
        num_leaf,
        sub.map(lambda x: f"toInt32({x})"),
        arr.map(lambda a: f"arraySum({a})"),
        arr.map(lambda a: f"arrayUniq({a})"),
        arr.map(lambda a: f"arrayCount(x -> x > 1, {a})"),
        arr.map(lambda a: f"arrayReduce('max', {a})"),
        arr.map(lambda a: f"arrayFold((acc, x) -> acc + x, {a}, 0)"),
        sub.map(lambda x: f"bitAnd(toInt64({x}), 12)"),
        sub.map(lambda x: f"bitShiftLeft(toInt64({x}), 2)"),
        sub.map(lambda x: f"intDivOrZero({x}, 3)"),
        sub.map(lambda x: f"moduloOrZero(toInt64({x}), 5)"),
        str_expr(depth - 1).map(lambda s: f"positionCaseInsensitive({s}, 'C')"),
        str_expr(depth - 1).map(lambda s: f"countMatches({s}, '[a-z]')"),
        sub.map(lambda x: f"toFloat64({x})"),
        sub.map(lambda x: f"bitCount(toInt64({x}))"),
        ts_leaf.map(lambda t: f"toYYYYMMDD({t})"),
        sub.map(lambda x: f"intDiv({x}, 7)"),
        sub.map(
            lambda x: (
                f"tupleElement(IPv4CIDRToRange("
                f"toIPv4(IPv4NumToString(toInt64({x}))), 8), 1)"
            )
        ),
        ts_leaf.map(lambda t: f"toYear({t})"),
        ts_leaf.map(lambda t: f"toDayOfWeek({t})"),
        ts_leaf.map(lambda t: f"toYYYYMM({t})"),
        st.tuples(b, sub, sub).map(
            lambda p: f"if({p[0]}, {p[1]}, {p[2]})"
        ),
        st.tuples(b, sub, b, sub, sub).map(
            lambda p: f"multiIf({p[0]}, {p[1]}, {p[2]}, {p[3]}, {p[4]})"
        ),
        str_expr(depth - 1).map(lambda s: f"position({s}, 'c')"),
    )


def str_expr(depth: int) -> st.SearchStrategy[str]:
    if depth == 0:
        return str_leaf
    sub = num_expr(depth - 1)
    return st.one_of(
        str_leaf,
        sub.map(lambda x: f"toString({x})"),
        str_leaf.map(lambda s: f"ucase({s})"),
        str_leaf.map(
            lambda s: f"arrayStringConcat(splitByChar('_', {s}), '-')"
        ),
        str_leaf.map(lambda s: f"replaceAll({s}, 'c', 'k')"),
        str_leaf.map(lambda s: f"replaceRegexpAll({s}, '[aeiou]', '_')"),
        str_leaf.map(lambda s: f"replaceOne({s}, 'c', 'k')"),
        str_leaf.map(lambda s: f"trimBoth({s})"),
        str_leaf.map(lambda s: f"cutQueryString({s})"),
        st.just("ts").map(lambda t: f"dateName('month', {t})"),
        str_leaf.map(lambda s: f"extract({s}, '[a-z]+')"),
        str_leaf.map(lambda s: f"hex(MD5({s}))"),
        st.just("ts").map(lambda t: f"formatDateTime({t}, '%Y-%m-%d')"),
        st.just("ts").map(lambda t: f"formatDateTime({t}, '%F %T')"),
        sub.map(lambda x: f"IPv4NumToString(toInt64({x}))"),
        str_leaf.map(lambda s: f"base64Decode(base64Encode({s}))"),
    )


def bool_expr(depth: int) -> st.SearchStrategy[str]:
    sub = num_expr(max(depth - 1, 0))
    s = str_expr(max(depth - 1, 0))
    return st.one_of(
        st.tuples(sub, sub).map(lambda p: f"({p[0]} > {p[1]})"),
        s.map(lambda x: f"startsWith({x}, 'c')"),
        s.map(lambda x: f"match({x}, '^c.*')"),
        s.map(lambda x: f"like({x}, 'c%')"),
        s.map(lambda x: f"notILike({x}, 'C%')"),
        s.map(lambda x: f"hasToken({x}, 'click')"),
        s.map(lambda x: f"multiSearchAny({x}, ['cl', 'zz'])"),
        s.map(lambda x: f"JSONHas(props, 'k')"),
        sub.map(
            lambda x: (
                f"isIPAddressInRange(IPv4NumToString(toInt64({x})),"
                f" '10.0.0.0/8')"
            )
        ),
        arr_expr(max(depth - 1, 0)).map(lambda a: f"hasAll({a}, range(2))"),
        arr_expr(max(depth - 1, 0)).map(
            lambda a: f"hasAny({a}, sequence(2, 3))"
        ),
    )


def ts_expr(depth: int) -> st.SearchStrategy[str]:
    if depth == 0:
        return ts_leaf
    sub = ts_expr(depth - 1)
    return st.one_of(
        ts_leaf,
        sub.map(lambda t: f"addDays({t}, 3)"),
        sub.map(lambda t: f"subtractHours({t}, 2)"),
        sub.map(lambda t: f"toStartOfDay({t})"),
        sub.map(lambda t: f"toMonday({t})"),
        sub.map(lambda t: f"toStartOfFifteenMinutes({t})"),
        sub.map(lambda t: f"timeSlot({t})"),
        sub.map(lambda t: f"toStartOfWeek({t})"),
        sub.map(lambda t: f"fromUnixTimestamp(toUnixTimestamp({t}))"),
    )


def arr_expr(depth: int) -> st.SearchStrategy[str]:
    base = st.sampled_from(["range(5)", "sequence(1, 4)", "range(2, 6)"])
    if depth == 0:
        return base
    sub = arr_expr(depth - 1)
    return st.one_of(
        base,
        sub.map(lambda a: f"arraySlice({a}, 2)"),
        sub.map(lambda a: f"arraySlice({a}, 1, 2)"),
        sub.map(lambda a: f"arrayPushBack({a}, 9)"),
        sub.map(lambda a: f"arrayPopFront({a})"),
        sub.map(lambda a: f"arrayMap(x -> x + 1, {a})"),
        sub.map(lambda a: f"arrayFilter(x -> x > 2, {a})"),
        sub.map(lambda a: f"arrayDifference({a})"),
        sub.map(lambda a: f"arrayReverse({a})"),
        sub.map(lambda a: f"arrayCompact({a})"),
        st.tuples(sub, sub).map(lambda p: f"arrayConcat({p[0]}, {p[1]})"),
        st.tuples(sub, sub).map(
            lambda p: f"arrayIntersect({p[0]}, {p[1]})"
        ),
    )


scalar = st.one_of(num_expr(2), str_expr(2), ts_expr(2), bool_expr(2))

agg = st.one_of(
    num_expr(1).map(lambda x: f"sumIf({x}, value > 50)"),
    num_expr(1).map(lambda x: f"maxIf({x}, event_id < 5000)"),
    bool_expr(1).map(lambda c: f"countIf({c})"),
    num_leaf.map(lambda x: f"uniqExact({x})"),
    num_leaf.map(lambda x: f"quantileExact(0.5)({x})"),
    st.tuples(str_expr(1), ts_leaf).map(
        lambda p: f"argMax({p[0]}, {p[1]})"
    ),
)


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    register_views(spark, sf_dir)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e=scalar)
def test_scalar_compositions_execute(spark, e):
    sql = f"SELECT {e} AS x FROM events WHERE event_id < 50"
    spark.sql(translate(sql)).collect()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=agg)
def test_aggregate_compositions_execute(spark, a):
    sql = f"SELECT event_type, {a} AS x FROM events GROUP BY event_type"
    spark.sql(translate(sql)).collect()


# -- round 5: combinator + ARRAY JOIN surface --------------------------------

combinator_agg = st.one_of(
    num_expr(1).map(lambda x: f"sumState({x})"),
    num_expr(1).map(lambda x: f"sumOrNull({x})"),
    num_leaf.map(lambda x: f"sumDistinct({x})"),
    num_expr(1).map(lambda x: f"minState({x})"),
    num_expr(1).map(lambda x: f"maxOrNull({x})"),
    st.just("countState()"),
    num_leaf.map(lambda x: f"uniqState({x})"),
    bool_expr(1).map(lambda c: f"uniqExactIf(user_id, {c})"),
    st.tuples(num_expr(1), bool_expr(1)).map(
        lambda p: f"argMaxIf(event_type, {p[0]}, {p[1]})"
    ),
    st.tuples(num_expr(1), bool_expr(1)).map(
        lambda p: f"argMinIf(event_type, {p[0]}, {p[1]})"
    ),
    arr_expr(1).map(lambda a: f"sumArray({a})"),
    arr_expr(1).map(lambda a: f"avgArray({a})"),
    arr_expr(1).map(lambda a: f"countArray({a})"),
    arr_expr(1).map(lambda a: f"minArray({a})"),
    arr_expr(1).map(lambda a: f"maxArray({a})"),
    arr_expr(1).map(lambda a: f"groupArrayArray({a})"),
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=combinator_agg)
def test_combinator_compositions_execute(spark, a):
    sql = f"SELECT event_type, {a} AS x FROM events GROUP BY event_type"
    spark.sql(translate(sql)).collect()


def test_uniq_state_over_double_executes(spark):
    """hll_sketch_agg rejects DOUBLE input; the translator must hash any-type
    input first (xxhash64), matching ClickHouse uniq*'s internal hashing."""
    sql = "SELECT event_type, uniqState(value) AS x FROM events GROUP BY event_type"
    spark.sql(translate(sql)).collect()


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=combinator_agg)
def test_state_merge_roundtrip_executes(spark, a):
    """A -State column produced in a subquery must be mergeable by the
    matching -Merge (or summable for counts) after translation."""
    sql = (
        "SELECT day, sumMerge(sv) AS m FROM ("
        "SELECT toStartOfDay(ts) AS day, sumState(value) AS sv "
        "FROM events GROUP BY day) GROUP BY day"
    )
    spark.sql(translate(sql)).collect()


def test_array_join_clause_translates_and_executes(spark):
    sql = (
        "SELECT tok, count(*) AS n FROM documents "
        "ARRAY JOIN splitByChar(' ', text) AS tok "
        "WHERE lengthUTF8(tok) > 3 GROUP BY tok ORDER BY n DESC, tok LIMIT 5"
    )
    out = translate(sql)
    assert "LATERAL VIEW explode" in out
    assert spark.sql(out).count() == 5


def test_left_array_join_keeps_empty_rows(spark):
    sql = (
        "SELECT doc_id, tok FROM documents "
        "LEFT ARRAY JOIN arrayFilter(t -> lengthUTF8(t) > 100, "
        "splitByChar(' ', text)) AS tok"
    )
    out = translate(sql)
    assert "LATERAL VIEW OUTER explode" in out
    df = spark.sql(out)
    # no token is 100+ chars → every doc survives exactly once, NULL tok
    total = spark.sql("SELECT count(*) AS c FROM documents").collect()[0][0]
    rows = df.collect()
    assert len(rows) == total
    assert all(r.tok is None for r in rows)


def test_multi_array_join_raises_with_zip_hint(spark):
    from mkpipe_extractor_clickhouse_spark.sources.ch_dialect import (
        ChDialectError,
    )

    with pytest.raises(ChDialectError, match="lockstep"):
        translate(
            "SELECT a, b FROM t ARRAY JOIN xs AS a, ys AS b GROUP BY a, b"
        )


def test_avg_state_raises_with_pair_hint(spark):
    from mkpipe_extractor_clickhouse_spark.sources.ch_dialect import (
        ChDialectError,
    )

    with pytest.raises(ChDialectError, match="PAIR"):
        translate("SELECT avgState(value) FROM events")


# -- round 5b: geo/text measures + retention/saturation + WITH TOTALS --------

r5b_agg = st.one_of(
    st.tuples(st.integers(1, 20), num_leaf).map(
        lambda p: f"uniqUpTo({p[0]})({p[1]})"
    ),
    st.lists(bool_expr(1), min_size=1, max_size=3).map(
        lambda cs: "retention(" + ", ".join(cs) + ")"
    ),
)

r5b_scalar = st.one_of(
    st.tuples(num_expr(1), num_expr(1)).map(
        lambda p: (
            f"pointInPolygon((toInt64({p[0]}), toInt64({p[1]})), "
            "[(0, 0), (500, 0), (500, 500), (0, 500)])"
        )
    ),
    st.tuples(str_expr(1), str_expr(1)).map(
        lambda p: f"ngramDistance({p[0]}, {p[1]})"
    ),
    st.tuples(str_expr(1), str_expr(1)).map(
        lambda p: f"ngramSearch({p[0]}, {p[1]})"
    ),
    st.tuples(str_expr(1), str_expr(1)).map(
        lambda p: f"ngramDistanceCaseInsensitive({p[0]}, {p[1]})"
    ),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e=r5b_scalar)
def test_r5b_scalar_compositions_execute(spark, e):
    sql = f"SELECT {e} AS x FROM events WHERE event_id < 50"
    spark.sql(translate(sql)).collect()


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=r5b_agg)
def test_r5b_aggregate_compositions_execute(spark, a):
    sql = f"SELECT event_type, {a} AS x FROM events GROUP BY event_type"
    spark.sql(translate(sql)).collect()


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=agg)
def test_with_totals_compositions_execute(spark, a):
    """Any documented aggregate must survive the WITH TOTALS clause
    rewrite (GROUPING SETS replicates it into both sets)."""
    sql = (
        f"SELECT event_type, {a} AS x FROM events "
        "GROUP BY event_type WITH TOTALS"
    )
    spark.sql(translate(sql)).collect()
