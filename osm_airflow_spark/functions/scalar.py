"""Scalar functions H1–H9 (SURVEY.md §2.H).

Tag/value transformation is the essence of the reference's "flex"
styling — Lua hooks normalize OSM tag values into typed columns
(/root/reference/README.md:74,93). Every operator here is a built-in
``pyspark.sql.functions`` expression: JVM-side, whole-stage-codegen'd,
vectorized over Parquet batches. No Python in any of these paths —
that is the point (UDFs for genuinely custom logic live in llm/udfs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_airflow_spark.io import load_table
from osm_airflow_spark.registry import query


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name) AS name_lower,
           UPPER(p_brand) AS brand_upper,
           TRIM(p_type) AS type_trim,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_name, 1, 5) AS name_prefix,
           p_brand || ':' || p_type AS brand_type,
           array_to_string(string_split(p_name, ' '), '|') AS name_words
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 — string normalization (tag-value cleanup). The split words
    are re-joined with '|' so the output schema stays scalar (array
    columns break downstream hash comparison); the split/tokenize
    semantic is still exercised end to end."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim("p_type").alias("type_trim"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.array_join(F.split("p_name", " "), "|").alias("name_words"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT p_partkey, p_name,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_name, '^(red|blue)') AS is_primary_color,
           regexp_extract(p_brand, '(\\d+)', 1) AS brand_num
    FROM part
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 — regex match/extract/replace on tag-like values. (Spark
    regexp_replace is global by default; DuckDB needs the 'g' flag —
    dialect drift caught by the oracle harness.)"""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_name",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("^(red|blue)").alias("is_primary_color"),
        F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           date_trunc('month', o_orderdate) AS month_start,
           date_trunc('week', o_orderdate) AS week_start,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date
    FROM orders
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 — snapshot-date arithmetic (pgosm_date pinning,
    osm_etl.py:13; weekly cadence, osm_etl.py:45 → the week_start
    bucket)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_trunc("week", "o_orderdate").alias("week_start"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_2002"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / 3, 2) AS third_price,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k,
           sqrt(l_quantity) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 — arithmetic on measures. All IEEE-exact per row (sqrt is
    correctly-rounded by spec; round ties can't occur on non-
    representable decimals)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 3, 2).alias("third_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_band,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_label,
           CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS is_rush
    FROM orders
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5 — CASE WHEN classification (road-class bucketing in flex
    routing terms, README.md:93)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_label"
        ),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("is_rush"),
    )


@query(
    "fn_map_json",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_keys(props)[1] AS first_key
    FROM events
    """,
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 — map functions over promoted tag payloads: parse the JSON
    once into MapType, then map_keys/element_at (the engine-side
    analogue of OSM's tags map, README.md:80-82)."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").cast("long").alias("k_val"),
        F.map_keys(m).getItem(0).alias("first_key"),
    )


@query(
    "fn_array_explode",
    oracle="""
    SELECT p_partkey, CAST(pos - 1 AS INT) AS word_pos, word
    FROM (
      SELECT p_partkey,
             unnest(string_split(p_name, ' ')) AS word,
             unnest(generate_series(1, len(string_split(p_name, ' ')))) AS pos
      FROM part
    )
    """,
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H7 — array functions + positional explode: the node_refs
    pattern (README.md:80) — order carried by array position,
    recoverable after explode via posexplode."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("word_pos", "word")
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_val
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8 — JSON path extraction from residual payloads (flex stores
    leftover tags as jsonb, README.md:78,93; fixture: events.props)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           md5(source || ':' || lang) AS source_lang_md5
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H9 — stable content hashes: the identity primitive for dedup
    and bucketing at 100 TB (SURVEY §2.K reuses this). md5/sha2 are
    standardized → oracle-checkable; xxhash64 (used internally for
    cheap shuffle keys) is Spark-specific and stays out of declared
    output."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.concat_ws(":", "source", "lang")).alias("source_lang_md5"),
    )


@query(
    "fn_edit_distance",
    oracle="""
    SELECT p_partkey, p_name,
           levenshtein(p_name, 'red widget') AS dist_to_red_widget,
           CASE WHEN length(p_name) >= length('red widget')
                THEN length(p_name) ELSE length('red widget') END
             - levenshtein(p_name, 'red widget') AS common_score
    FROM part
    """,
)
def fn_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H12 (extension) — Levenshtein edit distance (fuzzy tag-value
    matching: OSM tag typos like 'residental'; dedup-adjacent string
    similarity)."""
    p = load_table(spark, sf_dir, "part")
    target = F.lit("red widget")
    return p.select(
        "p_partkey",
        "p_name",
        F.levenshtein("p_name", target).cast("long").alias("dist_to_red_widget"),
        (
            F.greatest(F.length("p_name"), F.length(target))
            - F.levenshtein("p_name", target)
        ).cast("long").alias("common_score"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey >> 8 AS high_bits,
           xor(o_orderkey, 6700417) AS xored,
           o_orderkey | 1 AS odd_forced
    FROM orders
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H13 (extension) — bitwise ops on keys (bucket masks, simhash
    chunking, bloom-filter bit math all reduce to these)."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        F.shiftright(k, 8).alias("high_bits"),
        k.bitwiseXOR(F.lit(6700417)).alias("xored"),
        k.bitwiseOR(F.lit(1)).alias("odd_forced"),
    )


@query(
    "fn_string_shape",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '.') AS brand_padded,
           reverse(p_name) AS name_reversed,
           repeat(p_type, 2) AS type_doubled,
           translate(p_name, 'aeiou', 'AEIOU') AS name_upvoweled,
           left(p_name, 3) AS name_left3,
           right(p_name, 3) AS name_right3
    FROM part
    """,
)
def fn_string_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H14 (extension) — string shaping: pad/reverse/repeat/translate
    and the left/right slices (fixed-width export formatting, value
    normalization)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, ".").alias("brand_padded"),
        F.reverse("p_name").alias("name_reversed"),
        F.repeat("p_type", 2).alias("type_doubled"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_upvoweled"),
        F.substring("p_name", 1, 3).alias("name_left3"),
        F.expr("right(p_name, 3)").alias("name_right3"),
    )


@query(
    "fn_array_ops",
    oracle="""
    SELECT p_partkey,
           list_contains(string_split(p_name, ' '), 'red') AS has_red,
           array_to_string(string_split(p_name, ' ')[1:2], '|') AS first_two,
           len(string_split(p_name, ' ')) AS n_words,
           array_to_string(list_sort(string_split(p_name, ' ')), '|') AS words_sorted,
           array_to_string(list_sort(string_split(p_name, ' ')), '-') AS joined
    FROM part
    """,
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H15 (extension) — array surface beyond explode: containment,
    slicing, sizing, in-array sort, join-to-string (the node_refs
    manipulation toolkit, README.md:80). Slice and sort results are
    '|'-joined in the final projection so the schema stays scalar —
    the array ops themselves still run inside the plan."""
    p = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.array_contains(words, "red").alias("has_red"),
        F.array_join(F.slice(words, 1, 2), "|").alias("first_two"),
        F.size(words).cast("long").alias("n_words"),
        F.array_join(F.array_sort(words), "|").alias("words_sorted"),
        F.array_join(F.array_sort(words), "-").alias("joined"),
    )


@query(
    "fn_null_safety",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS segment_masked,
           (c_acctbal IS NOT DISTINCT FROM NULL) AS bal_is_null,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_floor0
    FROM customer
    """,
)
def fn_null_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H16 (extension) — null-handling semantics: nullif/coalesce
    masking, null-safe comparison (<=> ↔ IS NOT DISTINCT FROM), and
    null-out + default patterns — the tag-absence handling every OSM
    layer needs (most tags are absent on most elements)."""
    c = load_table(spark, sf_dir, "customer")
    bal_nonneg = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("SUPPRESSED")).alias(
            "segment_masked"
        ),
        F.col("c_acctbal").eqNullSafe(F.lit(None).cast("double")).alias("bal_is_null"),
        bal_nonneg.alias("bal_nonneg"),
        F.coalesce(bal_nonneg, F.lit(0.0)).alias("bal_floor0"),
    )


@query(
    "fn_encoding",
    oracle="""
    SELECT doc_id,
           base64(encode(text)) AS b64,
           translate(base64(encode(text)), '+/', '-_') AS b64_urlsafe,
           lower(hex(encode(text))) AS hex_bytes,
           CAST(octet_length(from_base64(base64(encode(text)))) AS BIGINT)
             AS rt_bytes
    FROM documents
    """,
)
def fn_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — binary↔text encodings (base64 / URL-safe base64 /
    hex) with a decode round-trip proof, the transport-encoding layer
    every export/API surface needs.

    Two measured cross-engine traps, handled explicitly: (1) Spark's
    ``base64`` uses Java's MIME encoder and inserts ``\\r\\n`` every
    76 chars on long payloads (measured: 410 vs 400 chars on a
    300-byte input) while DuckDB emits RFC 4648 without line breaks —
    the Spark side strips the CRLFs; (2) ``hex`` casing differs by
    engine, so both sides lowercase. ``unbase64`` decodes the chunked
    form fine (MIME decoder is lenient), so the round-trip byte count
    proves decode correctness. Pure per-row expressions — narrow,
    codegen'd, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    # Java MIME chunking: strip the \r\n line breaks Spark inserts
    b64 = F.regexp_replace(F.base64(payload), "\r\n", "")
    return d.select(
        "doc_id",
        b64.alias("b64"),
        F.translate(b64, "+/", "-_").alias("b64_urlsafe"),
        F.lower(F.hex(payload)).alias("hex_bytes"),
        F.octet_length(F.unbase64(F.base64(payload)))
        .cast("long")
        .alias("rt_bytes"),
    )


@query(
    "fn_url_parse",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.org/docs/' || doc_id
             || '?lang=' || lang || '&v=2' AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, 'https://([^/]+)', 1) AS host,
           regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM urls
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — URL decomposition (host / path / query / named
    query param), the first step of web-scrape curation: domain-level
    dedup, per-site quotas, and robots policies all key on the parsed
    host. URLs are synthesized in-column from fixture fields (no URL
    column exists), then the SPARK side uses the BUILT-IN
    ``parse_url`` (JVM java.net.URI-backed, codegen'd) while the
    oracle re-derives each part with regexes — proving the builtin's
    semantics against an independent specification rather than regex
    vs regex. Per-row narrow expressions, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


# Luhn digit terms: payload digit i (0 = rightmost) doubles on even i
# (the position adjacent to the appended check digit), with 2d > 9
# folding to 2d - 9. Unrolled for a fixed 12-digit payload.
def _luhn_sum_sql(expr: str) -> str:
    terms = []
    for i in range(12):
        d = f"(({expr}) // {10 ** i}) % 10"
        if i % 2 == 0:
            terms.append(
                f"(CASE WHEN 2 * ({d}) > 9 THEN 2 * ({d}) - 9"
                f" ELSE 2 * ({d}) END)"
            )
        else:
            terms.append(f"({d})")
    return " + ".join(terms)


@query(
    "fn_luhn",
    oracle=f"""
    WITH acct AS (
      SELECT c_custkey,
             CAST((c_custkey * 1000003) % 1000000000000 AS BIGINT) AS payload
      FROM customer
    ),
    scored AS (
      SELECT c_custkey, payload,
             CAST((10 - ({_luhn_sum_sql('payload')}) % 10) % 10 AS BIGINT)
               AS check_digit
      FROM acct
    )
    SELECT c_custkey,
           lpad(CAST(payload AS VARCHAR), 12, '0')
             || CAST(check_digit AS VARCHAR) AS account_number,
           check_digit,
           (({_luhn_sum_sql('payload')}) + check_digit) % 10 = 0 AS valid,
           (({_luhn_sum_sql('payload')}) + ((check_digit + 1) % 10)) % 10 = 0
             AS corrupted_valid
    FROM scored
    """,
)
def fn_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension — LUHN check-digit computation and validation
    (ISO/IEC 7812 mod-10): synthesize a 12-digit account payload per
    customer, append its Luhn digit, and validate both the correct
    number (always true — the self-consistency contract) and a
    corrupted check digit (always false: a single-digit error is
    exactly what Luhn detects) — the ingest data-quality screen for
    identifier columns, beside fn_string_shape's structural checks.

    Determinism: everything is integer digit arithmetic (div/mod by
    power-of-ten literals, the doubling fold unrolled 12 wide) —
    no floats anywhere; the padded string render is locale-free.

    Scale: per-row map work inside whole-stage codegen, zero
    shuffles, ~40 integer ops/row."""
    c = load_table(spark, sf_dir, "customer")
    payload = ((F.col("c_custkey") * 1000003) % 1000000000000).cast("long")
    acct = c.select("c_custkey", payload.alias("payload"))

    def luhn_sum(col):
        s = None
        for i in range(12):
            d = (col / (10 ** i)).cast("long") % 10
            t = F.when(2 * d > 9, 2 * d - 9).otherwise(2 * d) if i % 2 == 0 else d
            s = t if s is None else s + t
        return s

    scored = acct.select(
        "c_custkey", "payload",
        ((10 - luhn_sum(F.col("payload")) % 10) % 10)
        .cast("long")
        .alias("check_digit"),
    )
    return scored.select(
        "c_custkey",
        F.concat(
            F.lpad(F.col("payload").cast("string"), 12, "0"),
            F.col("check_digit").cast("string"),
        ).alias("account_number"),
        "check_digit",
        (
            (luhn_sum(F.col("payload")) + F.col("check_digit")) % 10 == 0
        ).alias("valid"),
        (
            (luhn_sum(F.col("payload")) + (F.col("check_digit") + 1) % 10)
            % 10
            == 0
        ).alias("corrupted_valid"),
    )
