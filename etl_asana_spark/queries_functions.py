"""Scalar-function and cast queries (SURVEY.md §2.8 #45–#51, §2.9 #52).

Oracle-dialect notes baked in:
- DuckDB length/levenshtein/year/... return BIGINT where Spark returns INT —
  the oracle casts to Spark's type so the schema check passes.
- DuckDB ``ceil(double)`` returns DOUBLE, Spark returns the input type —
  both sides cast explicitly.
- Transcendentals (ln) can differ in the last ulp across libm
  implementations — rounded to 8 decimals on both sides (error ~1e-16 vs
  cell 1e-8 keeps boundary risk negligible).
- JSON goes through from_json/get_json_object (DuckDB 1.0 has no Variant;
  SURVEY §2.8 #50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import register
from .registry import load_tables

# ---------------------------------------------------------------------------
# §2.8 scalar function families
# ---------------------------------------------------------------------------


@register(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           lower(p_brand) AS low_brand,
           substring(p_name, 1, 8) AS name8,
           CAST(length(p_name) AS INT) AS name_len,
           array_to_string(string_split(p_type, ' '), '|') AS type_words,
           concat_ws('|', p_brand, p_type) AS brand_type,
           regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           CAST(levenshtein(p_brand, 'Brand#10') AS INT) AS lev10,
           trim(concat(' ', p_brand, ' ')) AS trimmed
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#45 String family: case, substring, split, concat, regexp, edit distance.

    Note: Spark regexp_replace replaces ALL matches; DuckDB needs the 'g'
    flag for the same semantics.
    """
    t = load_tables(spark, sf_dir)
    return t["part"].select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").alias("name_len"),
        F.array_join(F.split("p_type", " "), "|").alias("type_words"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.levenshtein("p_brand", F.lit("Brand#10")).alias("lev10"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mon,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
               AS days_since_epoch_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_day
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#46 Date/time family: trunc, parts, diff, add, epoch, to_date —
    the reference's R2 ISO-8601 coercion surface re-expressed."""
    t = load_tables(spark, sf_dir)
    return t["orders"].select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("string").alias(
            "due_date"
        ),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
        F.to_date("o_orderdate").cast("string").alias("order_day"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           abs(l_discount - 0.05) AS disc_dev,
           sqrt(l_quantity) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           round(ln(l_quantity + 1), 8) AS qty_ln,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           CASE WHEN l_quantity - 5 = 0 THEN NULL
                ELSE l_extendedprice / (l_quantity - 5) END AS price_per_excess
    FROM lineitem
    WHERE l_linestatus = 'O'
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#47 Math family incl. null-safe division: ANSI mode makes x/0 an
    error, so the engine uses try_divide (≡ CASE WHEN oracle)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_linestatus") == "O")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 1).alias("price_r1"),
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.sqrt("l_quantity").alias("qty_sqrt"),
            (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
            F.round(F.log(F.col("l_quantity") + 1), 8).alias("qty_ln"),
            F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
            F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
            F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 5).alias(
                "price_per_excess"
            ),
        )
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           array_to_string(list_transform(embedding[1:3],
               x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                    AS VARCHAR)), '|') AS first3,
           CAST(embedding[1] AS FLOAT) AS e0,
           array_to_string(list_transform(embedding,
               x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 2.0 * 1000000 + 0.5)
                    AS BIGINT) AS VARCHAR)), '|') AS doubled,
           CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                AS DOUBLE) AS vec_sum,
           array_to_string(list_transform(list_sort(embedding[1:4], 'ASC'),
               x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                    AS VARCHAR)), '|') AS first4_sorted
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#48 Array family + higher-order functions (transform/aggregate) —
    all JVM-side; this is the no-UDF vector-math substrate for §2.12.

    Array-typed outputs are serialized to '|'-joined fixed-point strings at
    the comparison boundary (the driver's hasher cannot sort ndarray cells;
    float→string rendering differs across engines, so elements go through
    the same floor(x*1e6+0.5) fixed-point both sides). The slice/transform/
    aggregate/array_sort HOFs under test are unchanged.
    """
    t = load_tables(spark, sf_dir)
    emb = F.col("embedding")

    def fixpt(arr):
        return F.array_join(
            F.transform(
                arr,
                lambda x: F.floor(x.cast("double") * 1000000 + 0.5)
                .cast("long")
                .cast("string"),
            ),
            "|",
        )

    return t["embeddings"].select(
        "vec_id",
        F.size(emb).alias("dim"),
        fixpt(F.slice(emb, 1, 3)).alias("first3"),
        F.element_at(emb, 1).alias("e0"),
        F.array_join(
            F.transform(
                emb,
                lambda x: F.floor(x.cast("double") * 2.0 * 1000000 + 0.5)
                .cast("long")
                .cast("string"),
            ),
            "|",
        ).alias("doubled"),
        F.aggregate(
            emb, F.lit(0.0), lambda acc, x: acc + x.cast("double")
        ).alias("vec_sum"),
        fixpt(F.array_sort(F.slice(emb, 1, 4))).alias("first4_sorted"),
    )


@register(
    "q_fn_map",
    oracle="""
    SELECT p_partkey,
           map_extract(MAP {'brand': p_brand, 'type': p_type}, 'brand')[1] AS brand_val,
           array_to_string(list_sort(map_keys(MAP {'brand': p_brand, 'type': p_type})), '|') AS attr_keys,
           CAST(cardinality(MAP {'brand': p_brand, 'type': p_type}) AS INT) AS n_attrs
    FROM part
    WHERE p_size > 40
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#49 Map family — the custom-field EAV carrier type (SURVEY §1.1):
    construct, extract, keys, cardinality (values projected to scalars so
    the oracle compares arrow-stable types)."""
    t = load_tables(spark, sf_dir)
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return (
        t["part"]
        .filter(F.col("p_size") > 40)
        .select(
            "p_partkey",
            F.element_at(m, "brand").alias("brand_val"),
            F.array_join(F.array_sort(F.map_keys(m)), "|").alias("attr_keys"),
            F.size(m).alias("n_attrs"),
        )
    )


@register(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS INT) AS missing_val
    FROM events
    WHERE event_type IN ('click', 'error')
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#50 JSON extraction from events.props — semi-structured payloads kept
    as strings (the Asana nested-JSON analog); from_json for typed access."""
    t = load_tables(spark, sf_dir)
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))
    return (
        t["events"]
        .filter(F.col("event_type").isin("click", "error"))
        .select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            parsed.getField("k").alias("k_int"),
            F.get_json_object("props", "$.missing").cast("int").alias("missing_val"),
        )
    )


@register(
    "q_fn_cond",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 150000 THEN 'large'
                WHEN o_totalprice >= 50000 THEN 'medium'
                ELSE 'small' END AS size_tier,
           greatest(o_totalprice, 100000.0) AS floor_100k,
           least(o_totalprice, 100000.0) AS cap_100k,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_label
    FROM orders
    """,
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#51 Conditional family: CASE ladder, greatest/least, coalesce/nullif."""
    t = load_tables(spark, sf_dir)
    price = F.col("o_totalprice")
    return t["orders"].select(
        "o_orderkey",
        F.when(price >= 150000, "large")
        .when(price >= 50000, "medium")
        .otherwise("small")
        .alias("size_tier"),
        F.greatest(price, F.lit(100000.0)).alias("floor_100k"),
        F.least(price, F.lit(100000.0)).alias("cap_100k"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_label"
        ),
    )


# ---------------------------------------------------------------------------
# §2.9 casts (#52)
# ---------------------------------------------------------------------------


@register(
    "q_cast_types",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_money_str,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_cents,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor_int,
           TRY_CAST(o_orderpriority AS DOUBLE) AS bad_cast,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
    FROM orders
    """,
)
def q_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#52 Cast matrix under ANSI mode: string↔numeric round-trip, money
    decimal, fallible cast via try_cast (NULL, not error/silent-garbage),
    timestamp→date→string.

    Dialect hazards this query pins down (and tests document):
    - Spark CAST(double AS BIGINT) truncates; DuckDB ROUNDS — the engine's
      canonical int-ization is floor(), spelled on both sides.
    - DECIMAL and DATE surface differently through arrow (Decimal objects /
      datetime.date vs float64 / datetime64), so money decimals and dates
      are projected as strings at the engine boundary.
    """
    t = load_tables(spark, sf_dir)
    money = F.col("o_totalprice").cast("decimal(18,2)")
    return t["orders"].select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        money.cast("string").alias("price_money_str"),
        money.cast("double").alias("price_cents"),
        F.floor("o_totalprice").alias("price_floor_int"),
        F.col("o_orderpriority").try_cast("double").alias("bad_cast"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
    )


@register(
    "q_fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS lo_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 21845) AS toggled,
           CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS INT) AS popcount,
           o_orderkey << 2 AS shifted
    FROM orders
    WHERE o_orderkey % 10 = 3
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family: AND/OR/XOR masks, popcount, shifts — the ops
    behind bitmap indexes (q_agg_bitmap_distinct), feature flags, and hash
    mixing. All JVM integer codegen; identical two's-complement semantics
    on both engines."""
    t = load_tables(spark, sf_dir)
    k = F.col("o_orderkey")
    return (
        t["orders"]
        .filter(k % 10 == 3)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).alias("lo_byte"),
            k.bitwiseOR(F.lit(4096)).alias("with_flag"),
            k.bitwiseXOR(F.lit(21845)).alias("toggled"),
            F.bit_count(k.cast("long")).alias("popcount"),
            F.shiftleft(k, 2).alias("shifted"),
        )
    )


@register(
    "q_fn_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                AS VARCHAR) AS plus_3m,
           CAST(date_part('dow', CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
           CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                AS INT) AS epoch_days
    FROM orders
    WHERE o_orderkey % 25 = 0
    """,
)
def q_fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic family: quarter, month-end, month-clamped adds
    (Jan 31 + 1 month = Feb end on both engines), day-of-week (aligned to
    Spark's 1=Sunday convention), epoch-day offsets — the date surface the
    reference's R2 coercions feed into reporting rollups."""
    t = load_tables(spark, sf_dir)
    d = F.to_date("o_orderdate")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") % 25 == 0)
        .select(
            "o_orderkey",
            F.quarter(d).alias("qtr"),
            F.last_day(d).cast("string").alias("month_end"),
            F.add_months(d, 3).cast("string").alias("plus_3m"),
            F.dayofweek(d).alias("dow"),
            F.datediff(d, F.lit("1970-01-01").cast("date")).alias("epoch_days"),
        )
    )


@register(
    "q_fn_regex",
    oracle="""
    SELECT o_orderkey,
           CAST(regexp_extract(o_orderpriority, '^([0-9])', 1) AS INT) AS prio_num,
           regexp_extract(o_orderpriority, '-(.+)$', 1) AS prio_word,
           regexp_replace(o_orderpriority, '[^0-9]', '', 'g') AS digits_only,
           CAST(len(str_split_regex(o_orderpriority, '[ -]')) AS INT) AS n_tokens,
           regexp_matches(o_orderpriority, 'URGENT$') AS is_urgent,
           array_to_string(regexp_extract_all(o_orderpriority, '[A-Z]+'), '|')
               AS words
    FROM orders
    WHERE o_orderkey % 20 = 1
    """,
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family: capture-group extract, global replace,
    regex split, boolean match, extract-all — stated over the RE2-safe
    subset (no backreferences/lookaround) so Java regex and DuckDB's RE2
    agree. All codegen'd JVM string ops, pushdown-friendly."""
    t = load_tables(spark, sf_dir)
    p = F.col("o_orderpriority")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") % 20 == 1)
        .select(
            "o_orderkey",
            F.regexp_extract(p, r"^([0-9])", 1).cast("int").alias("prio_num"),
            F.regexp_extract(p, r"-(.+)$", 1).alias("prio_word"),
            F.regexp_replace(p, r"[^0-9]", "").alias("digits_only"),
            F.size(F.split(p, r"[ -]")).alias("n_tokens"),
            p.rlike("URGENT$").alias("is_urgent"),
            F.array_join(F.regexp_extract_all(p, F.lit("[A-Z]+"), 0), "|").alias(
                "words"
            ),
        )
    )


@register(
    "q_fn_array_setops",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_slice(regexp_split_to_array(text, '\\s+'), 1, 30) AS a,
               list_slice(regexp_split_to_array(text, '\\s+'), 16, 45) AS b
        FROM documents
    )
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_intersect(a, b)), ','), '')
               AS common,
           CAST(len(list_distinct(list_concat(a, b))) AS INT) AS n_union,
           CAST(len(list_filter(list_distinct(a),
                                x -> NOT list_contains(b, x))) AS INT)
               AS n_only_a,
           list_has_any(a, b) AS overlaps
    FROM d
    """,
)
def q_fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (intersect / union-distinct / except / overlap)
    over two token windows of each document — the in-row set ops that back
    shingle overlap and tag comparison without exploding rows. Set results
    are sorted then joined to a string: both engines agree on membership,
    not on internal order, so ordering is pinned before comparison.
    Tokenizer unified on ws_tokens/``\\s+`` in round 7 (r06 verdict item
    7)."""
    from .operators.text import ws_tokens

    t = load_tables(spark, sf_dir)
    ws = ws_tokens("text")
    d = t["documents"].select(
        "doc_id",
        F.slice(ws, 1, 30).alias("a"),
        F.slice(ws, 16, 30).alias("b"),
    )
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect("a", "b")), ",").alias(
            "common"
        ),
        F.size(F.array_union("a", "b")).alias("n_union"),
        F.size(F.array_except("a", "b")).alias("n_only_a"),
        F.arrays_overlap("a", "b").alias("overlaps"),
    )


@register(
    "q_fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           -- Spark's schema_of_variant string, derived from DuckDB's
           -- json_structure for the integer-object shape this corpus
           -- carries (a nested shape would need a fuller type-name map).
           CASE WHEN json_structure(props) IN ('{"k":"UBIGINT"}', '{"k":"BIGINT"}')
                THEN 'OBJECT<k: BIGINT>' END AS inferred_schema,
           -- is_variant_null(try_parse_json('not json')): the failed parse
           -- yields SQL NULL (not the variant null), so the predicate is
           -- FALSE — same derivation via DuckDB's TRY_CAST to JSON.
           (try_cast('not json' AS JSON) IS NOT NULL
            AND json_type(try_cast('not json' AS JSON)) = 'NULL')
               AS bad_parse_is_null
    FROM events
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VariantType: ``parse_json`` the events.props payload into the
    binary semi-structured type and extract typed paths with
    ``variant_get`` — the open-schema JSON path that skips per-query schema
    declaration (vs #50's ``from_json``). DuckDB 1.0 has no variant type,
    but every output column is derivable through its JSON functions, so the
    key carries a full oracle; equivalence with the schema-declared
    extraction is additionally property-tested in tests/test_udx_extra.py.

    (Probe note: Spark 4's other headline semi-structured API,
    ``transformWithStateInPandas``, is unavailable in this container — its
    driver worker needs google.protobuf — so custom stateful streaming
    stays on applyInPandasWithState; see streaming/jobs.py.)
    """
    t = load_tables(spark, sf_dir)
    v = F.parse_json("props")
    return t["events"].select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.schema_of_variant(v).alias("inferred_schema"),
        F.is_variant_null(F.try_parse_json(F.lit("not json"))).alias(
            "bad_parse_is_null"
        ),
    )


@register(
    "q_fn_url",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'https://' || source || '.example.com/corpus/' || lang
                 || '/doc-' || doc_id || '?chars=' || n_chars || '&v=2' AS url
        FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]chars=([^&]*)', 1) AS chars_param,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM urls
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar family: host / path / query / single-param extraction via
    Spark's dedicated ``parse_url`` (plus ``url_encode``-family siblings it
    anchors). URLs are synthesized deterministically from document
    attributes — the corpus has none — so every component is
    oracle-checkable; DuckDB has no parse_url, so the oracle extracts the
    identical components with anchored regexes (RFC-3986 generic syntax).
    Pure projection: no shuffle, whole-stage codegen'd, scales with the
    scan."""
    t = load_tables(spark, sf_dir)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/corpus/"),
        F.col("lang"), F.lit("/doc-"), F.col("doc_id").cast("string"),
        F.lit("?chars="), F.col("n_chars").cast("string"), F.lit("&v=2"),
    )
    d = t["documents"].select("doc_id", url.alias("url"))
    return d.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("chars")).alias("chars_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@register(
    "q_fn_binary",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha256,
           to_base64(encode(p_name)) AS name_b64,
           lower(hex(encode(p_name))) AS name_hex,
           octet_length(encode(p_name)) AS n_bytes
    FROM part
    WHERE p_partkey < 100
    """,
)
def q_fn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary & cryptographic-hash scalar family: md5 / sha-256 digests,
    base64 and hex encodings, byte length — the content-addressing
    primitives behind dedup fingerprints, cache keys, and stable sampling
    (q_sample_hash, q_shuffle_epoch build on exactly these). All are
    bytewise-standardized (RFC 1321/6234/4648), so the oracle is a direct
    function-for-function match; hex case is normalized (Spark emits
    lowercase from md5/sha2 but uppercase from hex()). Pure projection —
    codegen'd, no shuffle."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") < 100)
        .select(
            "p_partkey",
            F.md5("p_name").alias("name_md5"),
            F.sha2("p_name", 256).alias("name_sha256"),
            F.base64(F.col("p_name").cast("binary")).alias("name_b64"),
            F.lower(F.hex("p_name")).alias("name_hex"),
            F.length(F.col("p_name").cast("binary")).alias("n_bytes"),
        )
    )
