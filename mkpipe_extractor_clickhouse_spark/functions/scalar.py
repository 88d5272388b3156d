"""Scalar function coverage (SURVEY §2.8 F1-F8): string / datetime /
math / conditional / array / map / JSON / cast families, exercised on
documents.text, events.ts, events.props per the fixture design.

Cross-engine semantics notes (each verified against DuckDB 1.0):
  * day-of-week: Spark ``weekday`` is 0=Monday, DuckDB ``isodow`` is
    1=Monday → ``weekday+1 == isodow``;
  * ``floor``/``ceil`` return BIGINT in Spark but DOUBLE in DuckDB →
    cast both to BIGINT;
  * double→int CAST truncates in Spark but *rounds* in DuckDB → never
    cast fractional doubles to ints directly; use explicit floor/round;
  * regexes stay in the RE2∩Java-regex common subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import register


@register(
    "f1_string_funcs",
    oracle="""
    SELECT doc_id,
           UPPER(SUBSTRING(text, 1, 10)) AS head10,
           LENGTH(text) AS text_len,
           lang || ':' || source AS lang_source,
           TRIM(LPAD(lang, 4, '_')) AS padded_lang,
           REPLACE(source, 'src', 'S') AS source_short,
           CASE WHEN text LIKE '%query%' THEN 1 ELSE 0 END AS has_query,
           REGEXP_EXTRACT(source, '([0-9]+)', 1) AS source_num
    FROM documents
    """,
    tags=("F1",),
)
def f1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/substring/length/concat/trim/lpad/replace/
    like/regexp_extract."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head10"),
        F.length("text").cast("long").alias("text_len"),
        # || / F.concat both propagate NULL (concat_ws would not)
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_source"),
        F.trim(F.lpad("lang", 4, "_")).alias("padded_lang"),
        F.replace(F.col("source"), F.lit("src"), F.lit("S")).alias("source_short"),
        F.when(F.col("text").like("%query%"), 1).otherwise(0).alias("has_query"),
        F.regexp_extract("source", "([0-9]+)", 1).alias("source_num"),
    )


@register(
    "f2_datetime_funcs",
    oracle="""
    SELECT event_id,
           DATE_TRUNC('hour', ts) AS ts_hour,
           CAST(YEAR(ts) AS BIGINT) AS y,
           CAST(MONTH(ts) AS BIGINT) AS m,
           CAST(DAY(ts) AS BIGINT) AS d,
           CAST(HOUR(ts) AS BIGINT) AS h,
           CAST(ISODOW(ts) AS BIGINT) AS iso_dow,
           CAST(ts AS DATE) AS ts_date,
           ts + INTERVAL 36 HOUR AS ts_plus_36h,
           DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since_start
    FROM events
    """,
    tags=("F2",),
)
def f2_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family: date_trunc/extract/cast-to-date/interval
    arithmetic/datediff (ClickHouse toStartOfHour etc.)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("ts_hour"),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        (F.weekday("ts") + 1).cast("long").alias("iso_dow"),
        F.col("ts").cast("date").alias("ts_date"),
        (F.col("ts") + F.expr("INTERVAL 36 HOURS")).alias("ts_plus_36h"),
        F.date_diff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("days_since_start"),
    )


@register(
    "f3_math_funcs",
    oracle="""
    SELECT event_id,
           ROUND(value, 2) AS value_r2,
           ABS(value - 50) AS dist_from_50,
           CAST(FLOOR(value) AS BIGINT) AS value_floor,
           CAST(CEIL(value) AS BIGINT) AS value_ceil,
           ROUND(SQRT(value), 6) AS value_sqrt,
           ROUND(POW(value, 2), 6) AS value_sq,
           ROUND(LN(value + 1), 6) AS value_ln,
           ROUND(EXP(value / 100), 6) AS value_exp,
           event_id % 7 AS id_mod7,
           event_id // 7 AS id_div7
    FROM events
    """,
    tags=("F3",),
)
def f3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/abs/floor/ceil/sqrt/pow/ln/exp/mod/intdiv."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(v, 2).alias("value_r2"),
        F.abs(v - 50).alias("dist_from_50"),
        F.floor(v).cast("long").alias("value_floor"),
        F.ceil(v).cast("long").alias("value_ceil"),
        F.round(F.sqrt(v), 6).alias("value_sqrt"),
        F.round(F.pow(v, 2), 6).alias("value_sq"),
        F.round(F.log(v + 1), 6).alias("value_ln"),
        F.round(F.exp(v / 100), 6).alias("value_exp"),
        (F.col("event_id") % 7).alias("id_mod7"),
        F.expr("event_id div 7").alias("id_div7"),
    )


@register(
    "f4_conditional_null",
    oracle="""
    SELECT event_id,
           CASE WHEN value < 25 THEN 'low'
                WHEN value < 75 THEN 'mid'
                ELSE 'high' END AS value_band,
           COALESCE(NULLIF(event_type, 'error'), 'recovered') AS type_or_recovered,
           IF(value > 50, 1, 0) AS above_half,
           NULLIF(user_id, 0) AS user_nonzero
    FROM events
    """,
    tags=("F4",),
)
def f4_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null family: CASE WHEN / coalesce / nullif / if."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.when(v < 25, "low").when(v < 75, "mid").otherwise("high").alias("value_band"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("recovered")).alias(
            "type_or_recovered"
        ),
        F.when(v > 50, 1).otherwise(0).alias("above_half"),
        F.nullif("user_id", F.lit(0)).alias("user_nonzero"),
    )


@register(
    "f5_array_funcs",
    oracle="""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
           CAST(LIST_CONTAINS(STRING_SPLIT(text, ' '), 'query') AS BIGINT) AS has_query,
           STRING_SPLIT(text, ' ')[1] AS first_token,
           ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(SUBSTRING(text, 1, 20), ' ')), '|') AS head_sorted
    FROM documents
    """,
    tags=("F5",),
)
def f5_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: split/size/array_contains/element_at/array_sort
    (+ array_join so the output stays scalar for hashing)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "query").cast("long").alias("has_query"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(
            F.array_sort(F.split(F.substring("text", 1, 20), " ")), "|"
        ).alias("head_sorted"),
    )


@register(
    "f6_map_funcs",
    oracle="""
    SELECT event_id,
           ARRAY_TO_STRING(JSON_KEYS(props), ',') AS prop_keys,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
    tags=("F6",),
)
def f6_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: from_json → MapType, map_keys, element_at."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_value"),
    )


@register(
    "f7_json_funcs",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("F7",),
)
def f7_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object path extraction + typed cast, then
    aggregated (integer sums — exact, no decimal cast needed)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "f8_casts",
    oracle="""
    SELECT event_id,
           CAST(event_id AS DOUBLE) AS id_double,
           CAST(event_id AS VARCHAR) AS id_str,
           CAST(FLOOR(value) AS BIGINT) AS value_int,
           CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR) AS value_dec_str,
           CAST(CAST('2024-01-15 12:30:00' AS TIMESTAMP) AS DATE) AS fixed_date,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS ts_date_str
    FROM events
    """,
    tags=("F8",),
)
def f8_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast/convert family — mirrors the typed-literal logic of
    reference __init__.py:75-83 across the full type lattice. Fractional
    doubles go through floor before int casts (Spark truncates, DuckDB
    rounds — the direct cast is a portability trap)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_id").cast("double").alias("id_double"),
        F.col("event_id").cast("string").alias("id_str"),
        F.floor("value").cast("long").alias("value_int"),
        F.col("value").cast(T.DecimalType(10, 2)).cast("string").alias("value_dec_str"),
        F.lit("2024-01-15 12:30:00").cast("timestamp_ntz").cast("date").alias("fixed_date"),
        F.col("ts").cast("date").cast("string").alias("ts_date_str"),
    )


@register(
    "f9_misc_funcs",
    oracle="""
    SELECT doc_id,
           LEVENSHTEIN(lang, 'en') AS lang_dist,
           GREATEST(n_chars, CAST(doc_id AS BIGINT)) AS max_of,
           LEAST(n_chars, CAST(doc_id AS BIGINT)) AS min_of,
           REVERSE(lang) AS lang_rev,
           REPEAT(lang, 2) AS lang_twice,
           CAST(POSITION('query' IN text) AS BIGINT) AS query_pos,
           CAST(STARTS_WITH(text, 'key') AS BIGINT) AS starts_key,
           CAST(CONTAINS(text, 'join') AS BIGINT) AS has_join
    FROM documents
    """,
    tags=("F1", "F3"),
)
def f9_misc_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misc string/comparison functions: levenshtein (fuzzy-match
    primitive for dedup pipelines), greatest/least, reverse/repeat,
    position/startswith/contains."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.levenshtein("lang", F.lit("en")).cast("long").alias("lang_dist"),
        F.greatest("n_chars", F.col("doc_id").cast("long")).alias("max_of"),
        F.least("n_chars", F.col("doc_id").cast("long")).alias("min_of"),
        F.reverse("lang").alias("lang_rev"),
        F.repeat("lang", 2).alias("lang_twice"),
        F.instr("text", "query").cast("long").alias("query_pos"),
        F.startswith("text", F.lit("key")).cast("long").alias("starts_key"),
        F.contains("text", F.lit("join")).cast("long").alias("has_join"),
    )


@register(
    "f11_bitwise_funcs",
    oracle="""
    SELECT event_type,
           CAST(BIT_AND(user_id) AS BIGINT) AS and_users,
           CAST(BIT_OR(user_id) AS BIGINT) AS or_users,
           CAST(BIT_XOR(event_id) AS BIGINT) AS xor_ids,
           CAST(SUM(BIT_COUNT(event_id)) AS BIGINT) AS total_bits,
           CAST(SUM(event_id & 255) AS BIGINT) AS masked_sum
    FROM events
    GROUP BY event_type
    """,
    tags=("F3", "A2", "EXT"),
)
def f11_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family (ClickHouse ``bitAnd``/``bitOr``/
    ``bitXor``/``bitCount`` — bitmap/bloom tricks users port from it):
    bit aggregates per group plus scalar masking/popcount, all integer
    expressions inside whole-stage codegen, exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").cast("long").alias("and_users"),
        F.bit_or("user_id").cast("long").alias("or_users"),
        F.bit_xor("event_id").cast("long").alias("xor_ids"),
        F.sum(F.bit_count("event_id")).cast("long").alias("total_bits"),
        F.sum(F.col("event_id").bitwiseAND(255)).cast("long").alias("masked_sum"),
    )


@register(
    "f12_rounding_modes",
    oracle="""
    SELECT CAST(ROUND(l_quantity / 2) AS DOUBLE) AS half_away,
           CAST(ROUND_EVEN(l_quantity / 2, 0) AS DOUBLE) AS half_even,
           CAST(CEIL(l_quantity / 2) AS DOUBLE) AS up,
           CAST(FLOOR(l_quantity / 2) AS DOUBLE) AS down,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY 1, 2, 3, 4
    """,
    tags=("F3", "F8", "EXT"),
)
def f12_rounding_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-mode parity: HALF_UP round vs banker's (HALF_EVEN,
    ClickHouse ``roundBankers`` / Spark ``bround`` / DuckDB
    ``round_even``) vs ceil/floor — the four modes whose exact-.5
    disagreements are the classic silent corruption when porting
    financial queries between engines.  The inputs are integral
    quantities halved, so every .5 tie case in the domain is exercised;
    grouping by the rounded values makes any mode mismatch a row-set
    difference, not a needle in 600k rows."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity") / 2
    return (
        li.select(
            F.round(q, 0).alias("half_away"),
            F.bround(q, 0).alias("half_even"),
            F.ceil(q).cast("double").alias("up"),
            F.floor(q).cast("double").alias("down"),
        )
        .groupBy("half_away", "half_even", "up", "down")
        .agg(F.count("*").alias("n"))
    )


@register(
    "f13_edit_distance",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_name, p_type) AS lev_name_type,
           levenshtein(p_brand, p_type) AS lev_brand_type,
           ROUND(1.0 - CAST(levenshtein(p_name, p_type) AS DOUBLE)
                 / GREATEST(length(p_name), length(p_type)), 6)
             AS name_type_similarity
    FROM part
    """,
    tags=("F1", "EXT", "fuzzy"),
)
def f13_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance string functions — the fuzzy-matching primitives
    behind entity resolution and near-dup candidate scoring
    (ClickHouse: editDistance / levenshteinDistance). Spark's builtin
    ``levenshtein`` is JVM-codegen row-local work that rides the scan
    (no shuffle at any scale); the normalized similarity divides two
    exact integers, so parity is bit-stable. ClickHouse's
    editDistanceUTF8 differs only in unit (codepoints); these fixture
    strings are ASCII where the two agree."""
    p = load_table(spark, sf_dir, "part")
    lev_nt = F.levenshtein("p_name", "p_type")
    return p.select(
        "p_partkey",
        lev_nt.alias("lev_name_type"),
        F.levenshtein("p_brand", "p_type").alias("lev_brand_type"),
        F.round(
            1.0
            - lev_nt.cast("double")
            / F.greatest(F.length("p_name"), F.length("p_type")),
            6,
        ).alias("name_type_similarity"),
    )


@register(
    "f14_url_functions",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/' || lang || '/doc/'
               || CAST(doc_id AS VARCHAR) || '?ref=crawl&page='
               || CAST(doc_id % 7 AS VARCHAR) AS url
      FROM documents
    )
    SELECT doc_id,
           split_part(split_part(url, '//', 2), '/', 1) AS host,
           split_part(split_part(split_part(url, '//', 2), '/', 1),
                      '.', 1) AS subdomain,
           '/' || split_part(split_part(url, '//', 2), '/', 2) || '/doc/'
             || CAST(doc_id AS VARCHAR) AS path,
           split_part(url, '?', 2) AS query_string,
           split_part(split_part(url, 'page=', 2), '&', 1) AS page_param
    FROM u
    """,
    tags=("F1", "EXT", "url"),
)
def f14_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL dissection — ClickHouse's domain()/path()/queryString()/
    extractURLParameter() family, a staple of crawl-data curation.
    URLs are synthesized deterministically from documents (fixtures
    carry no URL column), then parsed with Spark's builtin
    ``parse_url`` (HOST / PATH / QUERY / QUERY:key) — JVM-codegen,
    row-local, rides the scan. The oracle reconstructs identical
    answers with split_part arithmetic, so the parse semantics are
    value-checked, not just smoke-tested."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref=crawl&page="),
        (F.col("doc_id") % 7).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.split(F.parse_url("url", F.lit("HOST")), "\\.").getItem(0).alias(
            "subdomain"
        ),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query_string"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page_param"),
    )


@register(
    "f15_regex_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(source, '([a-z]+)([0-9]+)', 1) AS src_stem,
           CAST(regexp_extract(source, '([a-z]+)([0-9]+)', 2) AS BIGINT)
             AS src_num,
           regexp_replace(lang, '[aeiou]', '_', 'g') AS lang_masked,
           len(regexp_extract_all(text, 'the')) AS the_count,
           regexp_matches(text, '^key') AS starts_key
    FROM documents
    """,
    tags=("F1", "EXT", "regex"),
)
def f15_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family — extract (group capture), global
    replace, occurrence count, and boolean match: the F1 string
    surface's pattern layer (ClickHouse: extract / replaceRegexpAll /
    countMatches / match). Patterns stay in the character-class subset
    where Java regex (Spark) and RE2 (DuckDB) agree — documented
    boundary, same caveat as the dialect translator. Row-local JVM
    codegen, rides the scan."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("source", r"([a-z]+)([0-9]+)", 1).alias("src_stem"),
        F.regexp_extract("source", r"([a-z]+)([0-9]+)", 2)
        .cast("bigint")
        .alias("src_num"),
        F.regexp_replace("lang", "[aeiou]", "_").alias("lang_masked"),
        F.regexp_count("text", F.lit("the")).alias("the_count"),
        F.col("text").rlike("^key").alias("starts_key"),
    )


# ---- f16: geohash encoding -------------------------------------------------

_GEO_BITS = 20  # per axis → 40 interleaved bits → 8 base32 chars
_GEO_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_interleave_sql(lon_idx: str, lat_idx: str, shr: str) -> str:
    """The 40-term bit-interleave Σ bit·2^pos as SQL text, generated
    once and rendered for BOTH engines (``shr`` is the shift-right
    spelling: Spark ``shiftright(x, n)``, DuckDB ``(x >> n)``) so the
    two expression trees are identical by construction. Geohash bit
    order: even stream positions (MSB-first) take longitude bits, odd
    take latitude."""
    terms = []
    for i in range(_GEO_BITS):
        lon_pos = 39 - 2 * i  # stream position 2i (0-based MSB) → exponent
        lat_pos = 38 - 2 * i  # stream position 2i+1
        sh = _GEO_BITS - 1 - i
        terms.append(
            f"({shr.format(x=lon_idx, n=sh)} & 1) * {1 << lon_pos}"
        )
        terms.append(
            f"({shr.format(x=lat_idx, n=sh)} & 1) * {1 << lat_pos}"
        )
    return "(" + " + ".join(terms) + ")"


def _geohash_chars_sql(v: str, shr: str) -> str:
    """8 base32 chars from the 40-bit interleaved value ``v``."""
    parts = []
    for j in range(8):
        sh = 35 - 5 * j
        idx = f"({shr.format(x=v, n=sh)} & 31)"
        parts.append(f"substr('{_GEO_B32}', CAST({idx} AS INT) + 1, 1)")
    return "concat(" + ", ".join(parts) + ")"


_SPARK_SHR = "shiftright({x}, {n})"
_DUCK_SHR = "({x} >> {n})"

# deterministic synthetic coordinates from the numeric value column
# (the fixture has no geo columns; the derivation is the SAME IEEE
# expression in both engines so the encode is still exactly checked)
_LON = "((value) - 180.0 * FLOOR((value) / 180.0) - 90.0) * 2.0"
_LAT = "((value) * 7.0 - 180.0 * FLOOR((value) * 7.0 / 180.0)) - 90.0"
_LON_IDX = (
    f"CAST(LEAST(FLOOR((({_LON}) + 180.0) / 360.0 * {1 << _GEO_BITS}), "
    f"{(1 << _GEO_BITS) - 1}) AS BIGINT)"
)
_LAT_IDX = (
    f"CAST(LEAST(FLOOR((({_LAT}) + 90.0) / 180.0 * {1 << _GEO_BITS}), "
    f"{(1 << _GEO_BITS) - 1}) AS BIGINT)"
)


@register(
    "f16_geohash",
    oracle=f"""
    WITH g AS (
      SELECT event_id,
             {_LON_IDX} AS lon_idx,
             {_LAT_IDX} AS lat_idx
      FROM events WHERE event_id <= 2000
    ),
    v AS (
      SELECT event_id,
             {_geohash_interleave_sql('lon_idx', 'lat_idx', _DUCK_SHR)} AS iv
      FROM g
    )
    SELECT event_id,
           {_geohash_chars_sql('iv', _DUCK_SHR)} AS geohash8,
           substr({_geohash_chars_sql('iv', _DUCK_SHR)}, 1, 4) AS cell4
    FROM v ORDER BY event_id
    """,
    tags=("F3", "F1", "EXT", "geo"),
)
def f16_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding (Niemeyer's public base-32 scheme) in PURE
    integer arithmetic — quantize lat/lon to 20-bit cell indices,
    interleave to 40 bits (lon first), emit 8 base-32 chars — the
    spatial-bucketing primitive behind geo joins and heatmap rollups
    at scale (equal prefixes ⇒ nearby cells, so a geohash-prefix
    groupBy is a co-located spatial join key). The interleave is a
    GENERATED 40-term expression rendered from one Python loop for
    both engines, so the trees are identical by construction; the only
    float ops are the two quantizations, identical IEEE in both.
    Row-local codegen, no shuffle; the fixture derives synthetic
    coordinates from the value column (no geo columns shipped)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    g = ev.select(
        "event_id",
        F.expr(_LON_IDX).alias("lon_idx"),
        F.expr(_LAT_IDX).alias("lat_idx"),
    )
    v = g.select(
        "event_id",
        F.expr(
            _geohash_interleave_sql("lon_idx", "lat_idx", _SPARK_SHR)
        ).alias("iv"),
    )
    gh = F.expr(_geohash_chars_sql("iv", _SPARK_SHR))
    return v.select(
        "event_id",
        gh.alias("geohash8"),
        F.substring(gh, 1, 4).alias("cell4"),
    ).orderBy("event_id")


@register(
    "f17_null_safe_predicates",
    oracle="""
    WITH j AS (
      SELECT event_id,
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             CASE WHEN event_id % 3 = 0 THEN NULL
                  ELSE event_id % 100 END AS maybe
      FROM events WHERE event_id <= 3000
    )
    SELECT event_id, k, maybe,
           (k IS DISTINCT FROM maybe) AS differs,
           (k IS NOT DISTINCT FROM maybe) AS same_nullsafe,
           (k = maybe) AS eq_threeval,
           COALESCE(k = maybe, FALSE) AS eq_coalesced
    FROM j ORDER BY event_id
    """,
    tags=("F4", "P6", "EXT"),
)
def f17_null_safe_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe comparison semantics side by side — the three-valued-
    logic corner every dedup and CDC diff silently depends on:
    ``IS (NOT) DISTINCT FROM`` treats NULL as a comparable value
    (NULL ≡ NULL), while plain ``=`` returns NULL and silently drops
    rows from WHERE clauses. One projection pins all four behaviors
    against the oracle so an engine upgrade cannot quietly change
    them (x12/j12/m4 all build on the null-safe form). Row-local
    codegen."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 3000)
    k = F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
    maybe = F.when(F.col("event_id") % 3 != 0, F.col("event_id") % 100)
    j = ev.select(
        "event_id", k.alias("k"), maybe.alias("maybe")
    )
    return j.select(
        "event_id",
        "k",
        "maybe",
        (~F.col("k").eqNullSafe(F.col("maybe"))).alias("differs"),
        F.col("k").eqNullSafe(F.col("maybe")).alias("same_nullsafe"),
        (F.col("k") == F.col("maybe")).alias("eq_threeval"),
        F.coalesce(F.col("k") == F.col("maybe"), F.lit(False)).alias(
            "eq_coalesced"
        ),
    ).orderBy("event_id")


@register(
    "f18_ip_functions",
    oracle="""
    WITH ip0 AS (
      SELECT (user_id * 2654435761) % 4294967296 AS ip FROM events
    ),
    oct AS (
      SELECT ip,
             ip // 16777216 AS o1,
             (ip // 65536) % 256 AS o2,
             (ip // 256) % 256 AS o3,
             ip % 256 AS o4
      FROM ip0
    ),
    s AS (
      SELECT ip, o1, o2,
             CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.' ||
             CAST(o3 AS VARCHAR) || '.' || CAST(o4 AS VARCHAR) AS ip_str
      FROM oct
    ),
    c AS (
      SELECT o1 // 16 AS bucket,
             ip_str,
             CASE WHEN (CAST(split_part(ip_str, '.', 1) AS BIGINT) * 16777216
                      + CAST(split_part(ip_str, '.', 2) AS BIGINT) * 65536
                      + CAST(split_part(ip_str, '.', 3) AS BIGINT) * 256
                      + CAST(split_part(ip_str, '.', 4) AS BIGINT)) = ip
                  THEN 1 ELSE 0 END AS rt,
             CASE WHEN o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
                       OR (o1 = 192 AND o2 = 168)
                  THEN 1 ELSE 0 END AS priv,
             CASE WHEN ip // 1073741824 = 1073741824 // 1073741824
                  THEN 1 ELSE 0 END AS net64_2
      FROM s
    )
    SELECT bucket, COUNT(*) AS n,
           SUM(rt) AS n_roundtrip, SUM(priv) AS n_private,
           SUM(net64_2) AS n_in_64_slash_2,
           MIN(ip_str) AS min_ip, MAX(ip_str) AS max_ip
    FROM c GROUP BY bucket ORDER BY bucket
    """,
    tags=("F3", "F1", "EXT", "ip"),
)
def f18_ip_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse's IPv4 function family as pure integer/string
    arithmetic — IPv4NumToString (dotted rendering), IPv4StringToNum
    (the parse, proven by a per-row round-trip), the RFC-1918 private
    classification, and isIPAddressInRange('64.0.0.0/2') as the
    equal-quotient-by-block-size test the dialect translation
    (sources/ch_dialect.py) emits. IPs are synthesized from user_id by
    a Knuth multiplicative hash (the fixture ships no address column);
    everything is row-local codegen — octet splits, string build/parse,
    CIDR membership — then one small rollup keyed on the /16-bucketed
    first octet. min/max of dotted strings is plain byte order in both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    ip = ev.selectExpr("(user_id * 2654435761) % 4294967296 AS ip")
    oct_ = ip.selectExpr(
        "ip",
        "ip DIV 16777216 AS o1",
        "(ip DIV 65536) % 256 AS o2",
        "(ip DIV 256) % 256 AS o3",
        "ip % 256 AS o4",
    )
    s = oct_.selectExpr(
        "ip",
        "o1",
        "o2",
        "concat(CAST(o1 AS STRING), '.', CAST(o2 AS STRING), '.', "
        "CAST(o3 AS STRING), '.', CAST(o4 AS STRING)) AS ip_str",
    )
    c = s.selectExpr(
        "o1 DIV 16 AS bucket",
        "ip_str",
        "CASE WHEN (CAST(split_part(ip_str, '.', 1) AS BIGINT) * 16777216"
        " + CAST(split_part(ip_str, '.', 2) AS BIGINT) * 65536"
        " + CAST(split_part(ip_str, '.', 3) AS BIGINT) * 256"
        " + CAST(split_part(ip_str, '.', 4) AS BIGINT)) = ip"
        " THEN 1 ELSE 0 END AS rt",
        "CASE WHEN o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31)"
        " OR (o1 = 192 AND o2 = 168) THEN 1 ELSE 0 END AS priv",
        # isIPAddressInRange(ip_str, '64.0.0.0/2'): block = 2^30,
        # base 64.0.0.0 = 1073741824 — equal quotients ⇔ same /2 net
        "CASE WHEN ip DIV 1073741824 = 1073741824 DIV 1073741824"
        " THEN 1 ELSE 0 END AS net64_2",
    )
    return (
        c.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum("rt").alias("n_roundtrip"),
            F.sum("priv").alias("n_private"),
            F.sum("net64_2").alias("n_in_64_slash_2"),
            F.min("ip_str").alias("min_ip"),
            F.max("ip_str").alias("max_ip"),
        )
        .orderBy("bucket")
    )


# --- round 5b: dialect text/geo measures, oracle-checked end-to-end ----

# Shared DuckDB gram-profile fragment: per-key 4-gram counts of an
# expression. The Spark side computes the same multisets through the
# dialect's higher-order-fold rewrite; the oracle recomputes them
# relationally (unnest + group) — two independent formulations of the
# documented ClickHouse formula, hash-matched.
_GRAMS_OF = (
    "unnest(list_transform(range(1, greatest(length({s}) - 2, 1)), "
    "i -> substring({s}, CAST(i AS INT), 4)))"
)


def _ngram_oracle() -> str:
    hay = "c_name"
    hay_ci = "lower(c_name)"
    n1, n1_ci, n2 = "'Customer#000001000'", "lower('CUSTOMER#000001000')", "'#0000'"

    def profile(name: str, key: str, s: str) -> str:
        return (
            f"{name} AS (SELECT {key} AS k, t, COUNT(*) AS cnt FROM "
            f"(SELECT {key}, {_GRAMS_OF.format(s=s)} AS t FROM customer) "
            f"GROUP BY 1, 2)"
        )

    def needle(name: str, s: str) -> str:
        return (
            f"{name} AS (SELECT t, COUNT(*) AS cnt FROM "
            f"(SELECT {_GRAMS_OF.format(s=s)} AS t) GROUP BY t)"
        )

    def common(name: str, hg: str, ng: str) -> str:
        return (
            f"{name} AS (SELECT h.k, SUM(LEAST(h.cnt, n.cnt)) AS c "
            f"FROM {hg} h JOIN {ng} n USING (t) GROUP BY 1)"
        )

    # dist = (totH + totN - 2*common) / (totH + totN); floor(x*1e6) is
    # deterministic across engines (same IEEE double, no rounding-mode
    # divergence — never round() a half-exact product).
    return f"""
    WITH {profile('hg', 'c_custkey', hay)},
         {profile('hgci', 'c_custkey', hay_ci)},
         {needle('n1', n1)}, {needle('n1ci', n1_ci)}, {needle('n2', n2)},
         {common('c1', 'hg', 'n1')},
         {common('c1ci', 'hgci', 'n1ci')},
         {common('c2', 'hg', 'n2')},
         base AS (
           SELECT c_custkey,
                  GREATEST(LENGTH(c_name) - 3, 0) AS toth,
                  (SELECT SUM(cnt) FROM n1) AS totn1,
                  (SELECT SUM(cnt) FROM n2) AS totn2,
                  COALESCE((SELECT c FROM c1 WHERE c1.k = c_custkey), 0) AS com1,
                  COALESCE((SELECT c FROM c1ci WHERE c1ci.k = c_custkey), 0) AS com1ci,
                  COALESCE((SELECT c FROM c2 WHERE c2.k = c_custkey), 0) AS com2
           FROM customer
         ),
         m AS (
           SELECT c_custkey % 10 AS bucket,
                  CAST(FLOOR(CAST(toth + totn1 - 2 * com1 AS DOUBLE)
                       / CAST(toth + totn1 AS DOUBLE) * 1000000) AS BIGINT) AS d_ppm,
                  CAST(FLOOR(CAST(toth + totn1 - 2 * com1ci AS DOUBLE)
                       / CAST(toth + totn1 AS DOUBLE) * 1000000) AS BIGINT) AS dci_ppm,
                  CAST(FLOOR(CAST(com2 AS DOUBLE)
                       / CAST(totn2 AS DOUBLE) * 1000000) AS BIGINT) AS s_ppm
           FROM base
         )
    SELECT bucket, COUNT(*) AS n,
           SUM(d_ppm) AS dist_ppm_sum,
           SUM(dci_ppm) AS dist_ci_ppm_sum,
           SUM(s_ppm) AS search_ppm_sum
    FROM m GROUP BY bucket ORDER BY bucket
    """


@register(
    "f20_ngram_measures",
    oracle=_ngram_oracle(),
    tags=("F1", "S3", "EXT", "dialect", "ngram"),
)
def f20_ngram_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse's ``ngramDistance`` / ``ngramSearch`` (+ the
    CaseInsensitive variant) running UNCHANGED through the dialect
    translator (sources/ch_dialect.py round 5b): exact character
    4-gram multiset measures — distance = symmetric difference over
    total grams, search = needle-gram coverage. The Spark plan is pure
    codegen (higher-order folds over the gram arrays, no UDF, no
    join); the oracle recomputes the same formula RELATIONALLY in
    DuckDB (unnest → count → min-join), so the hash-match proves the
    fold against an independent formulation, not a transcription.
    Doubles quantize via floor(x*1e6) — one IEEE division of identical
    integers per row, deterministic in both engines."""
    from ..sources.extract import ParquetExtractor, TableConfig

    table = TableConfig(
        name="customer",
        custom_query=(
            "SELECT c_custkey % 10 AS bucket, count(*) AS n, "
            "sum(toInt64(floor(ngramDistance(c_name, "
            "'Customer#000001000') * 1000000))) AS dist_ppm_sum, "
            "sum(toInt64(floor(ngramDistanceCaseInsensitive(c_name, "
            "'CUSTOMER#000001000') * 1000000))) AS dist_ci_ppm_sum, "
            "sum(toInt64(floor(ngramSearch(c_name, "
            "'#0000') * 1000000))) AS search_ppm_sum "
            "FROM customer GROUP BY bucket ORDER BY bucket"
        ),
        custom_query_dialect="clickhouse",
    )
    return ParquetExtractor(sf_dir).extract(table, spark).df


# f21: the dialect's pointInPolygon rewrite (literal integer polygons
# → exact ray-cast CASE sums, operators/geo.py renders both sides).
from ..operators.geo import crossings_sql_verts  # noqa: E402

_F21_HOOK = [(-700, -100), (-100, -100), (-100, -700), (100, -700),
             (100, 100), (-700, 100)]
_F21_DIAMOND = [(0, -900), (900, 0), (0, 900), (-900, 0)]


def _f21_poly_lit(verts: list[tuple[int, int]]) -> str:
    return "[" + ", ".join(f"({x}, {y})" for x, y in verts) + "]"


@register(
    "f21_point_in_polygon_dialect",
    oracle=f"""
    WITH pts AS (
      SELECT event_id,
             (event_id * 48271) % 2001 - 1000 AS px,
             (event_id * 69621) % 2001 - 1000 AS py
      FROM events
    )
    SELECT
      SUM(CASE WHEN ({crossings_sql_verts(_F21_HOOK)}) % 2 = 1
               THEN 1 ELSE 0 END) AS in_hook,
      SUM(CASE WHEN ({crossings_sql_verts(_F21_DIAMOND)}) % 2 = 1
               THEN 1 ELSE 0 END) AS in_diamond,
      SUM(CASE WHEN ({crossings_sql_verts(_F21_HOOK)}) % 2 = 1
                AND ({crossings_sql_verts(_F21_DIAMOND)}) % 2 = 1
               THEN event_id ELSE 0 END) AS overlap_checksum
    FROM pts
    """,
    tags=("F3", "S3", "EXT", "dialect", "geo"),
)
def f21_point_in_polygon_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A user's ``pointInPolygon`` query running UNCHANGED through the
    dialect translator: literal integer-vertex polygons (one CONCAVE
    hook — exercises even-odd parity — and a rotated diamond) become
    the exact ray-cast CASE sums of operators/geo.py, evaluated
    against event-derived integer points. countIf sums the boolean the
    rewrite returns; the overlap checksum pins WHICH points satisfy
    both predicates. Join-free row-local codegen + one global
    aggregate — the same shape at 100 TB. The oracle renders the same
    per-edge terms from the same vertex lists (shared generator), so
    the match pins the DIALECT PARSE (tuple surgery, vertex
    validation, boolean wrapping), the algorithm being already pinned
    by f19."""
    from ..sources.extract import ParquetExtractor, TableConfig

    hook, diamond = _f21_poly_lit(_F21_HOOK), _f21_poly_lit(_F21_DIAMOND)
    table = TableConfig(
        name="events",
        custom_query=(
            "SELECT "
            f"countIf(pointInPolygon((px, py), {hook})) AS in_hook, "
            f"countIf(pointInPolygon((px, py), {diamond})) AS in_diamond, "
            f"sum(CASE WHEN pointInPolygon((px, py), {hook}) "
            f"AND pointInPolygon((px, py), {diamond}) "
            "THEN event_id ELSE 0 END) AS overlap_checksum "
            "FROM (SELECT event_id, "
            "(event_id * 48271) % 2001 - 1000 AS px, "
            "(event_id * 69621) % 2001 - 1000 AS py FROM events)"
        ),
        custom_query_dialect="clickhouse",
    )
    return ParquetExtractor(sf_dir).extract(table, spark).df


@register(
    "f24_variant_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.missing')
                         IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing_path,
           CAST(SUM(CASE WHEN json_type(json(props)) = 'OBJECT'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_objects
    FROM events
    GROUP BY event_type
    """,
    tags=("F7", "F8", "EXT"),
)
def f24_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of the semi-structured ``props``
    payload: ``parse_json`` builds the binary variant once per row,
    ``variant_get`` extracts a typed field, ``try_variant_get`` probes
    a missing path (NULL, never an error), and ``schema_of_variant``
    classifies the value shape — the open-schema path a lake pipeline
    uses when event payloads evolve faster than the table schema.
    The oracle restates every extraction with DuckDB's JSON functions
    over the same strings, so a hash match proves the variant decode
    is value-identical to a JSON-text decode.  Plan: all variant
    expressions are scan-side (no UDF, codegen'd), one hash aggregate
    on event_type — the payload column itself never shuffles."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    rows = ev.select(
        "event_type",
        F.variant_get(v, "$.k", "long").alias("k"),
        F.try_variant_get(v, "$.missing", "long").alias("missing"),
        F.schema_of_variant(v).alias("vschema"),
    )
    return rows.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.max("k").cast("long").alias("max_k"),
        F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0)).alias(
            "n_missing_path"
        ),
        F.sum(
            F.when(F.col("vschema").startswith("OBJECT"), 1).otherwise(0)
        ).alias("n_objects"),
    )


@register(
    "f23_collation_group",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN event_id % 3 = 0
                  THEN UPPER(SUBSTR(event_type, 1, 1))
                       || SUBSTR(event_type, 2)
                  WHEN event_id % 3 = 1 THEN UPPER(event_type)
                  ELSE event_type END AS label
      FROM events
    )
    SELECT LOWER(label) AS label_ci,
           COUNT(*) AS n,
           COUNT(DISTINCT label) AS n_spellings
    FROM mixed
    GROUP BY LOWER(label)
    """,
    tags=("F1", "A2", "EXT"),
)
def f23_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION-aware grouping: the mixed-case label column
    (Initcap/UPPER/lower spellings synthesized per row) groups under
    the ``UTF8_LCASE`` collation, so 'Click', 'CLICK' and 'click' are
    ONE group without rewriting the expression as lower() — the
    engine-level case-insensitive semantics ClickHouse exposes via
    *CaseInsensitive function variants.  The emitted key is
    canonicalized with lower() and cast back to the default collation
    (a collated group's representative value is first-seen —
    nondeterministic across partitions — so the raw key must never be
    output).  The spelling count audits how many case variants each
    group absorbed.  Plan: one hash aggregate; the collation compares
    in the grouping hash itself, no extra projection pass."""
    ev = load_table(spark, sf_dir, "events")
    label = (
        F.when(
            F.col("event_id") % 3 == 0,
            # UPPER(first char) || rest — NOT initcap: initcap also
            # lowercases the tail and title-cases every word, which
            # diverges from the oracle on mixed-case or multi-word
            # values; this form matches the oracle's synthesis exactly
            F.concat(
                F.upper(F.substring("event_type", 1, 1)),
                F.expr("substring(event_type, 2)"),
            ),
        )
        .when(F.col("event_id") % 3 == 1, F.upper("event_type"))
        .otherwise(F.col("event_type"))
        .alias("label")
    )
    return (
        ev.select(label)
        .groupBy(F.collate("label", "UTF8_LCASE").alias("k"))
        .agg(
            F.count("*").alias("n"),
            # distinct over the ORIGINAL (UTF8_BINARY) column — the
            # collated alias can't be referenced inside an aggregate
            F.count_distinct(F.col("label")).alias("n_spellings"),
        )
        .select(
            F.lower("k").cast("string").alias("label_ci"),
            "n",
            "n_spellings",
        )
    )
