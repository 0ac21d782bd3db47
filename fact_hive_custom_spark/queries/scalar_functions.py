"""Scalar function families (SURVEY.md §2.2.F) — one bundled query per family.

All functions are stock `pyspark.sql.functions` (JVM-side, codegen'd —
no Python in the data path). Oracle SQL mirrors each expression in
DuckDB's dialect; where dialects diverge (initcap, dayofweek origin,
regexp_replace global flag, months_between) the oracle emulates
Spark's documented semantics per SURVEY.md §7.4.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fact_hive_custom_spark.queries.registry import register
from fact_hive_custom_spark.tables import load_table


@register(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           concat(upper(c_name), '|', lower(c_name))               AS shout_mumble,
           substr(c_name, 10, 9)                                   AS key_digits,
           trim(lpad(CAST(c_custkey AS VARCHAR), 6, '0'))          AS padded_key,
           length(c_name)                                          AS name_len,
           upper(substr(c_name, 1, 1)) || lower(substr(c_name, 2)) AS name_initcap,
           string_split(c_name, '#')[2]                            AS after_hash,
           instr(c_name, '#')                                      AS hash_pos,
           translate(c_name, '0123456789', 'XXXXXXXXXX')           AS masked,
           levenshtein(c_name, 'Customer#000000000')               AS lev_dist,
           regexp_extract(c_name, '([0-9]+)$', 1)                  AS trailing_num,
           regexp_replace(c_name, '0+', '0', 'g')                  AS squeezed
    FROM customer
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: concat/upper/lower/substr/trim/lpad/length/initcap/
    split/instr/translate/levenshtein/regexp_extract/regexp_replace.

    Note: Spark regexp_replace is global; DuckDB needs the 'g' flag.
    DuckDB lacks initcap → oracle emulates (single-word input here).
    """
    c = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.concat(F.upper(name), F.lit("|"), F.lower(name)).alias("shout_mumble"),
        F.substring(name, 10, 9).alias("key_digits"),
        F.trim(F.lpad(F.col("c_custkey").cast("string"), 6, "0")).alias("padded_key"),
        F.length(name).alias("name_len"),
        F.initcap(name).alias("name_initcap"),
        F.split(name, "#").getItem(1).alias("after_hash"),
        F.instr(name, "#").alias("hash_pos"),
        F.translate(name, "0123456789", "XXXXXXXXXX").alias("masked"),
        F.levenshtein(name, F.lit("Customer#000000000")).alias("lev_dist"),
        F.regexp_extract(name, r"([0-9]+)$", 1).alias("trailing_num"),
        F.regexp_replace(name, "0+", "0").alias("squeezed"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                        AS o_year,
           month(o_orderdate)                                       AS o_month,
           day(o_orderdate)                                         AS o_day,
           dayofweek(o_orderdate) + 1                               AS dow,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)              AS due_date,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)             AS plus_3mo,
           (1998 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)) AS months_to_1998,
           last_day(CAST(o_orderdate AS DATE))                      AS month_end,
           CAST(date_trunc('month', o_orderdate) AS DATE)           AS month_start,
           CAST(epoch(o_orderdate) AS BIGINT)                       AS epoch_sec,
           CAST(o_orderdate AS DATE)                                AS as_date
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: year/month/day/dayofweek/date_add/datediff/
    add_months/months_between/last_day/trunc/unix_timestamp/to_date.

    Dialect notes: Spark dayofweek is 1=Sunday; DuckDB 0=Sunday (+1 in
    oracle). months_between is evaluated against month-start targets so
    its fractional part is 0 and it equals pure calendar-month distance
    in both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    dd = d.cast("date")
    return o.select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.month(d).alias("o_month"),
        F.dayofmonth(d).alias("o_day"),
        F.dayofweek(d).alias("dow"),
        F.date_add(dd, 30).alias("due_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), dd).alias("days_to_eoy"),
        F.add_months(dd, 3).alias("plus_3mo"),
        F.months_between(F.lit("1998-01-01").cast("date"), F.trunc(dd, "month"))
        .cast("int")
        .alias("months_to_1998"),
        F.last_day(dd).alias("month_end"),
        F.trunc(dd, "month").alias("month_start"),
        F.unix_timestamp(d).alias("epoch_sec"),
        F.to_date(d).alias("as_date"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25)                                   AS dev_from_25,
           round(l_extendedprice, 1)                              AS price_r1,
           CAST(ceil(l_discount * 100) AS BIGINT)                 AS disc_pct_ceil,
           CAST(floor(l_tax * 100) AS BIGINT)                     AS tax_pct_floor,
           ROUND(sqrt(l_quantity), 6)                             AS qty_sqrt,
           ROUND(pow(l_discount, 2), 6)                           AS disc_sq,
           ROUND(exp(l_discount), 6)                              AS disc_exp,
           ROUND(ln(l_extendedprice), 6)                          AS price_ln,
           ROUND(log10(l_extendedprice), 6)                       AS price_log10,
           ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7             AS key_mod7,
           CAST(sign(l_quantity - 25) AS DOUBLE)                  AS dev_sign,
           greatest(l_quantity, l_linenumber * 10)                AS biggest,
           least(l_quantity, l_linenumber * 10)                   AS smallest
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/round/ceil/floor/sqrt/pow/exp/ln/log10/pmod/sign/
    greatest/least. Spark ceil→BIGINT vs DuckDB ceil→DOUBLE: cast in the
    oracle; pmod emulated as ((a%b)+b)%b."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25).alias("dev_from_25"),
        F.round(F.col("l_extendedprice"), 1).alias("price_r1"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
        F.round(F.sqrt(q), 6).alias("qty_sqrt"),
        F.round(F.pow(F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.round(F.exp(F.col("l_discount")), 6).alias("disc_exp"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice")), 6).alias("price_log10"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
        F.signum(q - 25).alias("dev_sign"),
        F.greatest(q, F.col("l_linenumber") * 10).alias("biggest"),
        F.least(q, F.col("l_linenumber") * 10).alias("smallest"),
    )


@register(
    "q_fn_cond",
    oracle="""
    SELECT s_suppkey,
           coalesce(NULLIF(s_name, 'Supplier#000000000'), 'FIRST')     AS name_or_first,
           nullif(s_nationkey, 0)                                      AS nation_or_null,
           ifnull(nullif(s_nationkey, 0), -1)                          AS nation_or_neg1,
           CASE WHEN s_acctbal >= 0 THEN 'credit' ELSE 'debit' END     AS bal_kind
    FROM supplier
    """,
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null family: coalesce/nullif/nvl(ifnull)/if."""
    s = load_table(spark, sf_dir, "supplier")
    nation_or_null = F.nullif(F.col("s_nationkey"), F.lit(0))
    return s.select(
        "s_suppkey",
        F.coalesce(F.nullif(F.col("s_name"), F.lit("Supplier#000000000")), F.lit("FIRST")).alias(
            "name_or_first"
        ),
        nation_or_null.alias("nation_or_null"),
        F.nvl(nation_or_null, F.lit(-1)).alias("nation_or_neg1"),
        F.expr("if(s_acctbal >= 0, 'credit', 'debit')").alias("bal_kind"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding)                                                    AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6)                            AS first_val,
           ROUND(CAST(list_sort(embedding)[1] AS DOUBLE), 6)                 AS min_val,
           len(list_distinct(embedding))                                     AS n_distinct,
           len(list_filter(embedding, x -> x > 0))                           AS n_pos,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)), 4) AS sum_doubled,
           ROUND(list_dot_product(embedding, embedding), 4)                  AS norm_sq,
           list_contains(embedding, embedding[1])                            AS has_first
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order family over `embeddings.embedding`
    (array<float>, dim 64): size/element_at/sort_array/array_distinct/
    array_contains + transform/filter/aggregate/zip_with.

    The dot product via zip_with+aggregate folds left-to-right — the
    same association DuckDB's list_dot_product uses, so 4-dp rounding
    is stable. All lambdas run inside codegen (no UDFs).
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_val"),
        F.round(F.element_at(F.sort_array(emb), 1).cast("double"), 6).alias("min_val"),
        F.size(F.array_distinct(emb)).alias("n_distinct"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(
                F.transform(emb, lambda x: dbl(x) * 2.0), F.lit(0.0), lambda acc, x: acc + x
            ),
            4,
        ).alias("sum_doubled"),
        F.round(
            F.aggregate(
                F.zip_with(emb, emb, lambda x, y: dbl(x) * dbl(y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("norm_sq"),
        F.array_contains(emb, F.element_at(emb, 1)).alias("has_first"),
    )


# Payload contract for the JSON/map/variant family: exactly the
# fixture shape {"k": <int>} (space optional - the compact-props
# drift variant). Anything else - malformed JSON, empty string,
# wrong value type - QUARANTINES on both engines: DuckDB
# json_extract hard-errors on malformed input and CAST('"x"'
# AS INTEGER) on wrong types, while Spark nulls them (from_json
# PERMISSIVE) or FAILFASTs (parse_json), so no NULL-propagating
# middle ground exists; a regex shape gate is portable and exact.
_PROPS_SHAPE = '^\\{"k": ?-?[0-9]+\\}$'


@register(
    "q_fn_map",
    oracle=r"""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER)           AS k_val,
           array_to_string(json_keys(props), ',')                AS key_list,
           CAST(json_extract(props, '$.k') AS INTEGER) * 2       AS k_doubled,
           'k'                                                   AS exploded_key,
           CAST(json_extract(props, '$.k') AS INTEGER)           AS exploded_val
    FROM events WHERE props IS NOT NULL
      AND regexp_matches(props, '^\{"k": ?-?[0-9]+\}$')
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: from_json to map, map_keys/map_values/element_at,
    map explode, str_to_map, create_map. The fixture props is exactly
    {"k": <int>} (FIXTURES.md) so the exploded map has one entry/row."""
    # see _PROPS_SHAPE: malformed/NULL/mistyped payloads quarantine
    e = load_table(spark, sf_dir, "events").filter(
        F.col("props").rlike(_PROPS_SHAPE)
    )
    m = F.from_json(F.col("props"), "map<string,int>")
    # str_to_map round-trip: rebuild "k:<v>" then re-parse — exercises
    # str_to_map + create_map + element_at together.
    rebuilt = F.str_to_map(F.concat(F.lit("k:"), F.element_at(m, "k").cast("string")), F.lit(","), F.lit(":"))
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.concat_ws(",", F.map_keys(m)).alias("key_list"),
        (
            F.element_at(F.map_from_arrays(F.map_keys(m), F.map_values(m)), "k").cast("int")
            + F.element_at(rebuilt, "k").cast("int")
        ).alias("k_doubled"),
        F.explode(m).alias("exploded_key", "exploded_val"),
    )


@register(
    "q_fn_json",
    oracle=r"""
    SELECT event_id,
           json_extract_string(props, '$.k')                     AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER)           AS k_int,
           to_json(struct_pack(k := CAST(json_extract(props, '$.k') AS INTEGER))) AS rebuilt,
           json_extract_string(props, '$.k')                     AS k_tuple
    FROM events WHERE props IS NOT NULL
      AND regexp_matches(props, '^\{"k": ?-?[0-9]+\}$')
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object / json_tuple / from_json(struct) /
    to_json round-trip."""
    # see _PROPS_SHAPE: malformed/NULL/mistyped payloads quarantine
    e = load_table(spark, sf_dir, "events").filter(
        F.col("props").rlike(_PROPS_SHAPE)
    )
    parsed = F.from_json(F.col("props"), "struct<k:int>")
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.to_json(parsed).alias("rebuilt"),
        F.json_tuple(F.col("props"), "k").alias("k_tuple"),
    )


@register(
    "q_fn_explode",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS arr FROM documents
    )
    SELECT doc_id,
           unnest(range(0, len(arr))) AS pos,
           unnest(arr) AS token
    FROM toks
    """,
)
def q_fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator family: posexplode of tokenized document text (explode /
    posexplode / explode_outer / inline are the same physical Generate
    operator — narrow, no shuffle, pipelined with the scan)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
    )


@register(
    "q_fn_variant",
    oracle=r"""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(CAST(json_extract(props, '$.k') AS INTEGER) AS VARCHAR) AS k_str,
           to_json(struct_pack(k := CAST(json_extract(props, '$.k') AS INTEGER))) AS rebuilt
    FROM events
    WHERE props IS NOT NULL
      AND regexp_matches(props, '^\{"k": ?-?[0-9]+\}$')
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT family (Spark 4.0 semi-structured type): parse_json ->
    open-schema VARIANT, typed extraction via variant_get, serialization
    via to_json. Unlike from_json(struct<...>) (q_fn_json) the schema is
    not declared up front — the 100 TB ingestion pattern for evolving
    event payloads; parquet stores VARIANT as a binary-encoded column
    supporting shredded pushdown."""
    # see _PROPS_SHAPE: parse_json FAILFASTs on malformed input
    e = load_table(spark, sf_dir, "events").filter(
        F.col("props").rlike(_PROPS_SHAPE)
    )
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.to_json(v).alias("rebuilt"),
    )


@register(
    "q_fn_struct",
    oracle="""
    WITH nested AS (
        SELECT struct_pack(
                   key := o_orderkey,
                   cust := o_custkey,
                   pr := struct_pack(price := o_totalprice,
                                     prio := o_orderpriority)
               ) AS o
        FROM orders
    )
    SELECT o.key AS order_key,
           o.cust AS cust_key,
           o.pr.price * 2 AS doubled,
           upper(o.pr.prio) AS prio,
           (o.pr.price > 300000) AS is_large
    FROM nested
    WHERE o.pr.price > 100000
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct (nested-record) construction, nested access, and
    filtering through two levels — the column shape typed multimodal
    metadata rides in. Catalyst flattens the struct accesses back to
    the source columns (no materialized intermediate), so the parquet
    scan still prunes to exactly the four referenced fields.
    """
    o = load_table(spark, sf_dir, "orders")
    nested = o.select(
        F.struct(
            F.col("o_orderkey").alias("key"),
            F.col("o_custkey").alias("cust"),
            F.struct(
                F.col("o_totalprice").alias("price"),
                F.col("o_orderpriority").alias("prio"),
            ).alias("pr"),
        ).alias("o")
    )
    return nested.filter(F.col("o.pr.price") > 100000).select(
        F.col("o.key").alias("order_key"),
        F.col("o.cust").alias("cust_key"),
        (F.col("o.pr.price") * 2).alias("doubled"),
        F.upper(F.col("o.pr.prio")).alias("prio"),
        (F.col("o.pr.price") > 300000).alias("is_large"),
    )


@register(
    "q_fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE CAST(round(l_extendedprice * 100) AS BIGINT)
                     / CAST(l_linenumber - 1 AS DOUBLE) END AS safe_ratio,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS lineno_rt
    FROM lineitem
    WHERE l_orderkey % 500 = 0
    """,
)
def q_fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface (try_divide / try_cast): division
    by zero and impossible casts yield NULL instead of failing the
    job — the ANSI-mode hardening a production pipeline needs so one
    malformed row can't kill a 100 TB pass. Exercised three ways:
    a zero denominator (every first line item), a non-numeric cast
    (returnflag), and a numeric round-trip cast that must SUCCEED.

    Float discipline: safe_ratio is a single pointwise IEEE division
    (exact-integer operands, no accumulation), so both engines emit
    bit-identical doubles — the summation-order hazard §7.4 warns
    about does not apply to scalar ops.

    Scale: pure map-side codegen, no shuffle; the modulo filter is
    pushed into the scan.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 500 == 0
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(cents, (F.col("l_linenumber") - 1).cast("double")).alias(
            "safe_ratio"
        ),
        F.try_to_number(F.col("l_returnflag"), F.lit("9")).cast("int").alias(
            "flag_as_int"
        ),
        F.col("l_linenumber").cast("string").cast("int").alias("lineno_rt"),
    )


@register(
    "q_fn_url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://corpus.example/' || COALESCE(lang, 'und')
                   || '/doc?id=' || CAST(doc_id AS VARCHAR)
                   || '&src=' || COALESCE(source, 'unknown') AS url
        FROM documents
    )
    SELECT doc_id,
           'corpus.example' AS host,
           '/' || regexp_extract(url, '//[^/]+/([^?]*)', 1) AS path,
           regexp_extract(url, 'id=([0-9]+)', 1) AS id_param,
           regexp_extract(url, 'src=([^&]+)', 1) AS src_param
    FROM u
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family (parse_url): host / path / named query
    parameter extraction — crawl-pipeline plumbing (canonical-URL
    dedup keys, per-domain quotas). URLs are built deterministically
    from document fields so both engines dissect identical strings;
    the Spark side uses the REAL parse_url operators (the capability
    under test), the oracle reproduces the same fields with plain
    regexes (DuckDB has no parse_url — the check is on values, not on
    which builtin computed them).

    Scale: map-only codegen, no shuffle — URL canonicalization rides
    the scan like q_llm_pii_redact's regex pass.
    """
    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        "doc_id",
        # COALESCE defaults: a NULL metadata field must not null out the
        # whole URL (concat is NULL-propagating in both engines, but the
        # oracle's literal host column is not) - and 'und'/'unknown'
        # segments are what a real canonicalizer emits anyway
        F.concat(
            F.lit("https://corpus.example/"),
            F.coalesce(F.col("lang"), F.lit("und")),
            F.lit("/doc?id="),
            F.col("doc_id").cast("string"),
            F.lit("&src="),
            F.coalesce(F.col("source"), F.lit("unknown")),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("id")).alias(
            "id_param"
        ),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("src")).alias(
            "src_param"
        ),
    )


@register(
    "q_fn_timezone",
    oracle="""
    WITH loc AS (
        SELECT timezone('America/New_York', timezone('UTC', ts)) AS lt
        FROM events WHERE ts IS NOT NULL
    )
    SELECT strftime(lt, '%Y-%m-%d') AS ny_date,
           CAST(hour(lt) AS BIGINT) AS ny_hour,
           COUNT(*) AS n
    FROM loc GROUP BY 1, 2
    """,
)
def q_fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-aware bucketing: event counts by America/New_York local
    date and hour — the reporting-calendar conversion every
    multi-region deployment needs, including both 2024 DST transitions
    (Mar 10 has no 02:xx local bucket, Nov 3 doubles 01:xx).

    Cross-engine wall-clock contract: Spark's session is pinned UTC
    (tables.py), so `from_utc_timestamp(ts, tz)` + `date_format`
    renders the tz wall time; DuckDB reaches the identical wall time
    with the session-INDEPENDENT double conversion
    `timezone(tz, timezone('UTC', ts))` — a bare TIMESTAMPTZ cast
    would silently re-interpret in whatever session zone the driver
    runs. Both engines resolve the zone through IANA tzdata (2024
    rules are identical across shipped versions).

    Scale: map-side zone shift fused into the scan, then one
    partial-aggregated groupBy on (date, hour) — cardinality is the
    calendar, not the data."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    loc = ev.select(
        F.from_utc_timestamp(F.col("ts"), "America/New_York").alias("lt")
    )
    return loc.groupBy(
        F.date_format("lt", "yyyy-MM-dd").alias("ny_date"),
        F.hour("lt").cast("bigint").alias("ny_hour"),
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_fn_regexp",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
               AS n_numbers,
           CAST(len(regexp_extract_all(text, '[a-z]+[0-9]')) AS BIGINT)
               AS n_alnum_runs,
           regexp_extract(text, '([a-z]{6,})', 1) AS first_long_word,
           length(regexp_replace(text, '[aeiou]', '', 'g'))
               AS n_consonantish
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def q_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar surface in one pass: match counting
    (regexp_count ≡ len(regexp_extract_all)), capture-group
    extraction (first ≥6-letter word), and global replacement
    (vowel strip) — the §F pattern-function family beside
    q_fn_string's plain string ops. The dialect is the portable
    subset (character classes, bounded quantifiers, one capture
    group) that behaves identically under Java regex (Spark) and
    RE2 (DuckDB); Spark's regexp_replace is global by default,
    DuckDB's needs the explicit 'g' flag — pinned here.

    Plan: one narrow codegen pass, no shuffle (row-parallel scalar
    work — at 100 TB this is pure map throughput)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select(
        "doc_id",
        F.expr("regexp_count(text, '[0-9]+')").cast("bigint").alias("n_numbers"),
        F.expr("regexp_count(text, '[a-z]+[0-9]')")
        .cast("bigint")
        .alias("n_alnum_runs"),
        F.regexp_extract(F.col("text"), "([a-z]{6,})", 1).alias(
            "first_long_word"
        ),
        F.length(F.regexp_replace(F.col("text"), "[aeiou]", "")).alias(
            "n_consonantish"
        ),
    )
