"""Scalar-function query catalog (SURVEY.md §2.8): string surgery, temporal
encodings, JSON path extraction, state machines, EAV melt/pivot, census,
ordered limits, fixed windows, and fallback-coalesce joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..functions.sanitize import sanitize_text, valid_name
from ..sources.tables import load_table
from .base import Q


# --------------------------------------------------------------------------
# F1/F2/F3: sanitize + validate + regex-chain name surgery.
# Reference: sanitize_text Functions/data_sanitization.py:12-28; name regex
# powerbi_main_fun.py:1112-1116; marketing-name chain :2443-2455.
# --------------------------------------------------------------------------
def f03_name_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    digits = F.regexp_extract(name, r"Customer#(\d+)", 1)
    return cust.select(
        "c_custkey",
        sanitize_text(name).alias("name_sanitized"),
        valid_name(name).alias("name_valid"),
        digits.alias("id_digits"),
        F.regexp_replace(digits, r"^0+", "").alias("id_trimmed"),
        F.trim(F.regexp_replace(F.regexp_replace(name, r"#", " "), r"\s+", " ")).alias(
            "name_despaced"
        ),
    )


F03_ORACLE = r"""
SELECT
  c_custkey,
  CASE WHEN c_name IS NULL THEN NULL
       WHEN length(trim(regexp_replace(c_name, '[^\x00-\xff]', '', 'g'))) = 0 THEN 'Invalid'
       ELSE regexp_replace(c_name, '[^\x00-\xff]', '', 'g') END AS name_sanitized,
  CASE WHEN regexp_full_match(c_name, '[A-Za-z0-9_ -]{1,60}')
       THEN c_name ELSE 'Invalid' END AS name_valid,
  regexp_extract(c_name, 'Customer#(\d+)', 1) AS id_digits,
  regexp_replace(regexp_extract(c_name, 'Customer#(\d+)', 1), '^0+', '') AS id_trimmed,
  trim(regexp_replace(regexp_replace(c_name, '#', ' ', 'g'), '\s+', ' ', 'g')) AS name_despaced
FROM customer
"""


# --------------------------------------------------------------------------
# F5/J4/F26/F27: country normalization + fallback-coalesce dual join.
# Reference: country CASE chain powerbi_main_fun.py:798-819; two-pass region
# lookup :688-690/:784-786; edge/profile coalesce :2313-2337.
# --------------------------------------------------------------------------
def f05_country_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # partial primary dim (even keys only) forces the fallback path
    primary = nation.filter(F.col("n_nationkey") % 2 == 0).select(
        F.col("n_nationkey").alias("pk"), F.col("n_name").alias("p_name")
    )
    full = nation.select(
        F.col("n_nationkey").alias("fk"), F.col("n_name").alias("f_name")
    )
    joined = (
        cust.join(F.broadcast(primary), cust.c_nationkey == primary.pk, "left")
        .join(F.broadcast(full), cust.c_nationkey == full.fk, "left")
        .withColumn("nation_name", F.coalesce(F.col("p_name"), F.col("f_name")))
        .withColumn(
            "dim_source",
            F.when(F.col("p_name").isNotNull(), "primary").otherwise("fallback"),
        )
    )
    normalized = F.when(F.col("nation_name") == "UNITED STATES", "US").when(
        F.col("nation_name") == "UNITED KINGDOM", "UK"
    ).when(F.col("nation_name") == "GERMANY", "DE").when(
        F.col("nation_name") == "FRANCE", "FR"
    ).otherwise(F.col("nation_name"))
    return joined.groupBy(
        normalized.alias("nation_norm"), F.col("dim_source")
    ).agg(F.count("*").alias("n_customers"))


F05_ORACLE = """
WITH joined AS (
  SELECT
    c_custkey,
    COALESCE(p.n_name, f.n_name) AS nation_name,
    CASE WHEN p.n_name IS NOT NULL THEN 'primary' ELSE 'fallback' END AS dim_source
  FROM customer
  LEFT JOIN (SELECT * FROM nation WHERE n_nationkey % 2 = 0) p
    ON c_nationkey = p.n_nationkey
  LEFT JOIN nation f ON c_nationkey = f.n_nationkey
)
SELECT
  CASE WHEN nation_name = 'UNITED STATES' THEN 'US'
       WHEN nation_name = 'UNITED KINGDOM' THEN 'UK'
       WHEN nation_name = 'GERMANY' THEN 'DE'
       WHEN nation_name = 'FRANCE' THEN 'FR'
       ELSE nation_name END AS nation_norm,
  dim_source,
  COUNT(*) AS n_customers
FROM joined
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# F9/F7: epoch-ms round trip + ISO formatting.
# Reference: epoch conversions powerbi_main_fun.py:1700-1706; ISO parse :848.
# --------------------------------------------------------------------------
def f09_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    iso = F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
    return ev.select(
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        iso.alias("ts_iso"),
        F.unix_millis(
            F.to_timestamp(iso, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        ).alias("ts_ms_roundtrip"),
    )


F09_ORACLE = """
SELECT
  event_id,
  epoch_ms(ts) AS ts_ms,
  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_iso,
  epoch_ms(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '%Y-%m-%d %H:%M:%S.%f'))
    AS ts_ms_roundtrip
FROM events
WHERE event_id < 500
"""


# --------------------------------------------------------------------------
# F28/F18: JSON path extraction + typed coercion from the props column.
# Reference: dict-key chains into module data powerbi_main_fun.py:1988-1990;
# bool/typed coercion Functions/helpers.py:39-92.
# --------------------------------------------------------------------------
def f28_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_k"),
        F.max(k).alias("max_k"),
        (F.sum(k).cast("double") / F.count(k)).alias("avg_k"),
    )


F28_ORACLE = """
SELECT
  event_type,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
    / COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# F22: HA state machine — when-chain + substring-derived booleans.
# Reference: update_ha_and_cluster powerbi_main_fun.py:1391-1459.
# --------------------------------------------------------------------------
def f22_state_machine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ha = (
        F.when(F.col("o_orderstatus") == "O", "ACTIVE_STANDBY_UP")
        .when(F.col("o_orderstatus") == "P", "ACTIVE_STANDBY_DOWN")
        .otherwise("NONE")
    )
    staged = orders.select(
        "o_orderkey",
        ha.alias("ha_state"),
        F.when(ha.contains("ACTIVE"), 1).otherwise(0).alias("is_active"),
        F.when(ha.contains("DOWN"), 1).otherwise(0).alias("is_down"),
    )
    return staged.groupBy("ha_state", "is_active", "is_down").agg(
        F.count("*").alias("n_orders")
    )


F22_ORACLE = """
WITH staged AS (
  SELECT
    CASE WHEN o_orderstatus = 'O' THEN 'ACTIVE_STANDBY_UP'
         WHEN o_orderstatus = 'P' THEN 'ACTIVE_STANDBY_DOWN'
         ELSE 'NONE' END AS ha_state
  FROM orders
)
SELECT
  ha_state,
  CASE WHEN contains(ha_state, 'ACTIVE') THEN 1 ELSE 0 END AS is_active,
  CASE WHEN contains(ha_state, 'DOWN') THEN 1 ELSE 0 END AS is_down,
  COUNT(*) AS n_orders
FROM staged
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# EAV melt: wide row → (entity, name, used, num, text, filter_val) long form.
# Reference: the EAV attribute model fun_mysql_inserts.py:347-368,
# Functions/sql_upserts.py:28-49.
# --------------------------------------------------------------------------
def eav_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    attrs = cust.select(
        F.col("c_custkey").alias("entity_id"),
        F.expr(
            "stack(3,"
            " 'name', c_name, CAST(NULL AS DOUBLE),"
            " 'segment', c_mktsegment, CAST(NULL AS DOUBLE),"
            " 'acctbal', CAST(NULL AS STRING), c_acctbal"
            ") AS (name, text, num)"
        ),
    )
    used = F.when(
        F.col("text").isNotNull() | F.col("num").isNotNull(), 1
    ).otherwise(0)
    return attrs.select(
        "entity_id",
        "name",
        used.alias("used"),
        "num",
        "text",
        F.concat_ws("-", F.col("name"), used).alias("filter_val"),
    )


EAV_MELT_ORACLE = """
WITH melted AS (
  SELECT c_custkey AS entity_id, 'name' AS name, c_name AS text,
         CAST(NULL AS DOUBLE) AS num
  FROM customer
  UNION ALL
  SELECT c_custkey, 'segment', c_mktsegment, CAST(NULL AS DOUBLE) FROM customer
  UNION ALL
  SELECT c_custkey, 'acctbal', CAST(NULL AS VARCHAR), c_acctbal FROM customer
)
SELECT
  entity_id,
  name,
  CASE WHEN text IS NOT NULL OR num IS NOT NULL THEN 1 ELSE 0 END AS used,
  num,
  text,
  name || '-' || CASE WHEN text IS NOT NULL OR num IS NOT NULL THEN 1 ELSE 0 END
    AS filter_val
FROM melted
"""


# --------------------------------------------------------------------------
# EAV pivot: long attributes → wide row via map_from_entries.
# Reference: all-attributes-for-entity dict fun_mysql_query.py:164-184 (S8).
# --------------------------------------------------------------------------
def eav_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    attrs = eav_melt(spark, sf_dir)
    wide = attrs.groupBy("entity_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("name"), F.col("text")))
        ).alias("tmap"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("name"), F.col("num")))
        ).alias("nmap"),
    )
    return wide.select(
        "entity_id",
        F.col("tmap")["name"].alias("name"),
        F.col("tmap")["segment"].alias("segment"),
        F.col("nmap")["acctbal"].alias("acctbal"),
    )


EAV_PIVOT_ORACLE = """
SELECT
  c_custkey AS entity_id,
  c_name AS name,
  c_mktsegment AS segment,
  c_acctbal AS acctbal
FROM customer
"""


# --------------------------------------------------------------------------
# U1/U2: external-enrichment UDF (offline deterministic client) + rollup.
# Reference: Nominatim/MaxMind lookups powerbi_main_fun.py:624-653, :736-745.
# The md5-derived fake client is replicated in SQL, proving the mapInPandas
# plumbing (batching, caching, rate limiting) preserves per-row semantics.
# --------------------------------------------------------------------------
def u01_geo_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.enrichment import enrich_region

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = enrich_region(cust, "c_custkey")
    return enriched.groupBy("region").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


U01_ORACLE = """
WITH enriched AS (
  SELECT
    c_custkey,
    c_mktsegment,
    ['AMER','EMEA','APAC','LATAM'][
      (CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2)) AS INT) % 4) + 1
    ] AS region
  FROM customer
)
SELECT region, COUNT(*) AS n_customers, COUNT(DISTINCT c_mktsegment) AS n_segments
FROM enriched
GROUP BY region
"""


# --------------------------------------------------------------------------
# A15: distinct-entity census (the reference's SLA audit).
# Reference: inventory_sla.py:110-140.
# --------------------------------------------------------------------------
def a15_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    c = cust.agg(F.count("*").alias("n_customers"))
    o = orders.agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers_with_orders"),
    )
    return c.crossJoin(o)


A15_ORACLE = """
SELECT
  (SELECT COUNT(*) FROM customer) AS n_customers,
  (SELECT COUNT(*) FROM orders) AS n_orders,
  (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_customers_with_orders
"""


# --------------------------------------------------------------------------
# O2: deterministic ordered limit.
# Reference: maxSamples/limit caps powerbi_main_fun.py:1908,
# Functions/vco_calls.py:283.
# --------------------------------------------------------------------------
def o02_ordered_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy("event_id")
        .limit(100)
        .select("event_id", "event_type", "value")
    )


O02_ORACLE = """
SELECT event_id, event_type, value
FROM events ORDER BY event_id LIMIT 100
"""


# --------------------------------------------------------------------------
# W6: fixed historical window (constant interval filter).
# Reference: Dec-2019 pinned link-series interval powerbi_main_fun.py:543-545.
# --------------------------------------------------------------------------
def w06_fixed_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    lo = F.to_timestamp(F.lit("2024-01-05 00:00:00"))
    hi = F.to_timestamp(F.lit("2024-01-12 00:00:00"))
    return (
        ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
    )


W06_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
GROUP BY event_type
"""


QUERIES: dict[str, Q] = {
    "f03_name_surgery": Q(
        f03_name_surgery,
        F03_ORACLE,
        ("F1", "F2", "F3", "F4", "U4"),
        "sanitize + validate + regex-chain string surgery",
    ),
    "f05_country_fallback": Q(
        f05_country_fallback,
        F05_ORACLE,
        ("F5", "F6", "J4", "F26", "F27"),
        "country normalization + dual-join coalesce fallback",
    ),
    "f09_epoch_roundtrip": Q(
        f09_epoch_roundtrip,
        F09_ORACLE,
        ("F7", "F8", "F9"),
        "epoch-ms / ISO round-trip conversions",
    ),
    "f28_json_extract": Q(
        f28_json_extract,
        F28_ORACLE,
        ("F28", "F18", "F19"),
        "JSON path extraction + typed coercion + rollup",
    ),
    "f22_state_machine": Q(
        f22_state_machine,
        F22_ORACLE,
        ("F22",),
        "HA state machine when-chain + contains-derived bools",
    ),
    "eav_melt": Q(
        eav_melt,
        EAV_MELT_ORACLE,
        ("S11", "F21", "S9"),
        "wide → EAV long-form attribute melt",
    ),
    "eav_pivot": Q(
        eav_pivot,
        EAV_PIVOT_ORACLE,
        ("S8",),
        "EAV long form → wide via map_from_entries",
    ),
    "u01_geo_enrich": Q(
        u01_geo_enrich,
        U01_ORACLE,
        ("U1", "U2", "J9", "T7"),
        "external-enrichment mapInPandas with cache + rate limiter",
    ),
    "a15_census": Q(a15_census, A15_ORACLE, ("A15",), "distinct-entity census audit"),
    "o02_ordered_limit": Q(
        o02_ordered_limit, O02_ORACLE, ("O2", "O1"), "deterministic ordered limit"
    ),
    "w06_fixed_window": Q(
        w06_fixed_window, W06_ORACLE, ("W6", "F7", "S4"), "fixed historical interval"
    ),
}
