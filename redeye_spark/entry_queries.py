"""Driver-contract queries and their DuckDB oracles.

Strategy: the `events` testdata table is deterministically transformed
into NCSA log lines by IDENTICAL arithmetic in Spark SQL and DuckDB SQL
(only formatting functions differ per dialect). The Spark side then runs
the real pipeline machinery — tokenize -> mapInPandas regex parse ->
enrich -> route -> aggregate — while the oracle derives the expected
output from first principles (CASE expressions over the source columns),
so the two computations share no code path: a genuine independent check
of the parser semantics, error taxonomy, routing, and aggregation.

Column-name discipline: every computed column is aliased identically on
both sides (driver hashes values after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .functions.logparse import FORMAT_COMMON
from .operators import enrich as enrich_op
from .operators import parse_op, route as route_op, tokenize_op
from .operators import aggregate as agg_op

# ---------------------------------------------------------------------------
# Shared deterministic line construction (dialect differences isolated).
# Offsets exercise per-row UTC-offset preservation end to end.
# ---------------------------------------------------------------------------
_OFFS = [("-0700", -420, "-07:00"), ("-0400", -240, "-04:00"), ("+0000", 0, "+00:00"),
         ("+0200", 120, "+02:00"), ("+0530", 330, "+05:30")]

_OFF_STR = "CASE CAST(event_id % 5 AS INT) " + " ".join(
    f"WHEN {i} THEN '{o[0]}'" for i, o in enumerate(_OFFS)) + " END"
_OFF_MIN = "CASE CAST(event_id % 5 AS INT) " + " ".join(
    f"WHEN {i} THEN {o[1]}" for i, o in enumerate(_OFFS)) + " END"
_OFF_RFC = "CASE CAST(event_id % 5 AS INT) " + " ".join(
    f"WHEN {i} THEN '{o[2]}'" for i, o in enumerate(_OFFS)) + " END"

_STATUS = ("CASE CAST((event_id + user_id) % 10 AS INT) "
           "WHEN 0 THEN 200 WHEN 1 THEN 200 WHEN 2 THEN 200 WHEN 3 THEN 200 "
           "WHEN 4 THEN 301 WHEN 5 THEN 304 WHEN 6 THEN 404 WHEN 7 THEN 403 "
           "WHEN 8 THEN 500 ELSE 503 END")


def _frags(dialect: str) -> dict[str, str]:
    """Column-expression fragments; {S} = the dialect's string type."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    if dialect == "spark":
        wall = f"ts + make_dt_interval(0, 0, {_OFF_MIN}, 0)"
        ts_fmt = f"date_format({wall}, 'dd/MMM/yyyy:HH:mm:ss')"
        iso_fmt = f"date_format({wall}, \"yyyy-MM-dd'T'HH:mm:ss\")"
    else:
        wall = f"ts + to_minutes(CAST({_OFF_MIN} AS BIGINT))"
        ts_fmt = f"strftime({wall}, '%d/%b/%Y:%H:%M:%S')"
        iso_fmt = f"strftime({wall}, '%Y-%m-%dT%H:%M:%S')"
    f = {
        "doc_id": f"'ev-' || CAST(event_id AS {s})",
        "host": (f"'10.' || CAST(user_id % 200 AS {s}) || '.' || CAST(event_id % 250 AS {s})"
                 f" || '.' || CAST((event_id * 7) % 250 AS {s})"),
        "user_str": f"CASE WHEN user_id % 5 = 0 THEN '-' ELSE 'u' || CAST(user_id % 100 AS {s}) END",
        "ts_fmt": ts_fmt,
        "iso_fmt": iso_fmt,
        "off_str": _OFF_STR,
        "off_rfc": _OFF_RFC,
        "method": ("CASE event_type WHEN 'view' THEN 'GET' WHEN 'click' THEN 'GET' "
                   "WHEN 'signup' THEN 'POST' WHEN 'purchase' THEN 'PUT' ELSE 'GET' END"),
        "uri": f"'/api/v' || CAST(event_id % 3 AS {s}) || '/item/' || CAST(event_id % 1000 AS {s})",
        "proto": "CASE WHEN event_id % 4 = 0 THEN 'HTTP/1.0' ELSE 'HTTP/1.1' END",
        "status_str": f"CASE WHEN event_id % 97 = 0 THEN '-' ELSE CAST({_STATUS} AS {s}) END",
        "clen_str": (f"CASE WHEN event_id % 13 = 0 THEN '-' "
                     f"ELSE CAST(CAST(floor(value * 100) AS BIGINT) % 100000 AS {s}) END"),
        # malformed injection over 'error' events (~1/5 of rows, 3 kinds)
        "badk": ("CASE WHEN event_type = 'error' AND event_id % 3 = 0 THEN 'garbage' "
                 "WHEN event_type = 'error' AND event_id % 3 = 1 THEN 'badts' "
                 "WHEN event_type = 'error' AND event_id % 3 = 2 THEN 'badint' "
                 "ELSE 'ok' END"),
    }
    f["ts_piece"] = f"CASE WHEN {f['badk']} = 'badts' THEN 'not-a-time' ELSE {f['ts_fmt']} || ' ' || {f['off_str']} END"
    f["status_piece"] = f"CASE WHEN {f['badk']} = 'badint' THEN 'NaN' ELSE {f['status_str']} END"
    f["line"] = (
        f"CASE WHEN {f['badk']} = 'garbage' THEN 'this is not a log line ' || CAST(event_id AS {s}) "
        f"ELSE {f['host']} || ' - ' || {f['user_str']} || ' [' || {f['ts_piece']} || '] ' "
        f"|| '\"' || {f['method']} || ' ' || {f['uri']} || ' ' || {f['proto']} || '\" ' "
        f"|| {f['status_piece']} || ' ' || {f['clen_str']} END"
    )
    return f


def _spark_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> (doc_id, source, line) with session TZ pinned to UTC so
    naive parquet timestamps render identically to DuckDB."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    f = _frags("spark")
    return spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        f"{f['doc_id']} AS doc_id",
        "event_type AS source",
        f"{f['line']} AS line",
    )


def _parsed(spark: SparkSession, sf_dir: str, carry_tokens: bool = False) -> DataFrame:
    raw = tokenize_op.tokenize_lines(_spark_lines(spark, sf_dir))
    return parse_op.parse_sequences(raw, fmt=FORMAT_COMMON, carry_tokens=carry_tokens)


def _oracle_base() -> str:
    """DuckDB CTE: expected parse output derived WITHOUT regex/parsing."""
    f = _frags("duck")
    return f"""
base AS (
  SELECT
    {f['doc_id']} AS doc_id,
    event_type AS source,
    {f['badk']} AS badk,
    {f['line']} AS line,
    {f['host']} AS e_host,
    CASE WHEN user_id % 5 = 0 THEN NULL ELSE 'u' || CAST(user_id % 100 AS VARCHAR) END AS e_user,
    {f['iso_fmt']} || {f['off_rfc']} AS e_ts_str,
    {f['method']} AS e_method,
    {f['uri']} AS e_uri,
    {f['proto']} AS e_proto,
    CASE WHEN event_id % 97 = 0 THEN NULL ELSE CAST({_STATUS} AS BIGINT) END AS e_status,
    CASE WHEN event_id % 13 = 0 THEN NULL
         ELSE CAST(floor(value * 100) AS BIGINT) % 100000 END AS e_clen,
    ts AS e_ts
  FROM events
),
expected AS (
  SELECT
    doc_id, source, line,
    CASE WHEN badk = 'badts' THEN 'TimestampParseError'
         WHEN badk IN ('garbage', 'badint') THEN 'ParseError' END AS error_kind,
    CASE WHEN badk = 'ok' THEN e_host END AS remote_host,
    CASE WHEN badk = 'ok' THEN e_user END AS remote_user,
    CASE WHEN badk = 'ok' THEN e_ts_str END AS timestamp_str,
    CASE WHEN badk = 'ok' THEN e_method END AS method,
    CASE WHEN badk = 'ok' THEN e_uri END AS requested_uri,
    CASE WHEN badk = 'ok' THEN e_proto END AS protocol,
    CASE WHEN badk = 'ok' THEN e_method || ' ' || e_uri || ' ' || e_proto END AS requested_url,
    CASE WHEN badk = 'ok' THEN e_status END AS status_code,
    CASE WHEN badk = 'ok' THEN e_clen END AS content_length,
    CASE WHEN badk = 'ok' THEN '1' END AS version,
    CASE WHEN badk = 'ok' THEN e_ts END AS ts_utc
  FROM base
)"""


_PARSE_COLS = [
    "doc_id", "source", "remote_host", "remote_user", "timestamp_str", "requested_url",
    "method", "requested_uri", "protocol", "status_code", "content_length", "version",
    "message", "error_kind",
]


# ---------------------------------------------------------------------------
# queries() / oracle_sql() entries
# ---------------------------------------------------------------------------

def q_parse_common(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2-P11: full parse through tokenize -> mapInPandas regex machinery."""
    return _parsed(spark, sf_dir).select(*_PARSE_COLS)


SQL_PARSE_COMMON = f"""
WITH {_oracle_base()}
SELECT doc_id, source, remote_host, remote_user, timestamp_str, requested_url,
       method, requested_uri, protocol, status_code, content_length, version,
       line AS message, error_kind
FROM expected
"""


def q_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 error route: counts by error taxonomy (types.rs:33-38)."""
    return (
        _parsed(spark, sf_dir)
        .filter(F.col("error_kind").isNotNull())
        .groupBy("error_kind")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_DEAD_LETTER = f"""
WITH {_oracle_base()}
SELECT error_kind, COUNT(*) AS n FROM expected
WHERE error_kind IS NOT NULL GROUP BY error_kind
"""


def q_enrich_status_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join: status_class x method counts over ok rows."""
    parsed = _parsed(spark, sf_dir)
    enriched = enrich_op.enrich(
        parsed, enrich_op.dim_status_class(spark), enrich_op.dim_ua_family(spark)
    )
    return (
        enriched.filter(F.col("error_kind").isNull() & F.col("status_code").isNotNull())
        .groupBy("status_class", "method")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_ENRICH_STATUS_CLASS = f"""
WITH {_oracle_base()}
SELECT CAST(floor(status_code / 100) AS BIGINT) || 'xx' AS status_class, method, COUNT(*) AS n
FROM expected WHERE error_kind IS NULL AND status_code IS NOT NULL
GROUP BY 1, 2
"""


def q_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate fan-out totality: rows per sink."""
    parsed = _parsed(spark, sf_dir)
    enriched = enrich_op.enrich(
        parsed, enrich_op.dim_status_class(spark), enrich_op.dim_ua_family(spark)
    )
    return route_op.route_counts(route_op.tag_routes(enriched))


SQL_ROUTE_COUNTS = f"""
WITH {_oracle_base()}
SELECT CASE WHEN error_kind IS NOT NULL THEN 'dead_letter'
            WHEN status_code BETWEEN 200 AND 299 THEN 'sink_2xx'
            WHEN status_code BETWEEN 300 AND 399 THEN 'sink_3xx'
            WHEN status_code BETWEEN 400 AND 599 THEN 'sink_4xx5xx'
            ELSE 'sink_other' END AS sink,
       COUNT(*) AS n
FROM expected GROUP BY 1
"""


def q_agg_counts_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sink hourly aggregate via the SALTED two-phase path; bucket
    returned as string to keep cross-engine hashing exact."""
    parsed = _parsed(spark, sf_dir)
    enriched = enrich_op.enrich(
        parsed, enrich_op.dim_status_class(spark), enrich_op.dim_ua_family(spark)
    )
    tagged = route_op.tag_routes(enriched)
    counts = agg_op.salted_counts(tagged, "hour", salt_buckets=8)
    return counts.select(
        "sink",
        F.date_format("bucket", "yyyy-MM-dd HH:00:00").alias("bucket_str"),
        "status_class", "method", "source", "n",
    )


SQL_AGG_COUNTS_HOUR = f"""
WITH {_oracle_base()}
SELECT CASE WHEN error_kind IS NOT NULL THEN 'dead_letter'
            WHEN status_code BETWEEN 200 AND 299 THEN 'sink_2xx'
            WHEN status_code BETWEEN 300 AND 399 THEN 'sink_3xx'
            WHEN status_code BETWEEN 400 AND 599 THEN 'sink_4xx5xx'
            ELSE 'sink_other' END AS sink,
       strftime(date_trunc('hour', ts_utc), '%Y-%m-%d %H:00:00') AS bucket_str,
       CASE WHEN status_code IS NOT NULL THEN CAST(floor(status_code / 100) AS BIGINT) || 'xx' END AS status_class,
       method, source, COUNT(*) AS n
FROM expected GROUP BY ALL
"""


def q_token_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-array equality invariant (FIXTURES §3.1) for every row."""
    parsed = parse_op.validate_tokens(_parsed(spark, sf_dir, carry_tokens=True))
    return parsed.select("doc_id", F.size("tokens").cast("long").alias("n_bytes"), "token_ok")


# n_tok == LENGTH(line) because constructed lines are pure ASCII.
SQL_TOKEN_ROUNDTRIP = f"""
WITH {_oracle_base()}
SELECT doc_id, CAST(length(line) AS BIGINT) AS n_bytes, true AS token_ok FROM expected
"""


def q_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 JSON-lines sink. No SQL oracle: redeye's JSON key order is
    HashMap-nondeterministic (README pipes through jq -S), and DuckDB
    cannot reproduce to_json key order — correctness of the JSON shape
    is covered field-for-field by tests/test_logparse.py golden cases."""
    return parse_op.to_logstash_json(_parsed(spark, sf_dir))


# --- relational coverage over TPC-H-ish tables (SURVEY §2.2) ---

def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregate; decimal sums for cross-engine exactness."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)")
                 * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
       SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
       SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way broadcast join: customer x orders x nation -> revenue."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


SQL_NATION_REVENUE = """
SELECT n_name,
       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: latest event per user (deterministic tie-break)."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


SQL_LAST_EVENT_PER_USER = """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


QUERIES = {
    "parse_common": q_parse_common,
    "dead_letter": q_dead_letter,
    "enrich_status_class": q_enrich_status_class,
    "route_counts": q_route_counts,
    "agg_counts_hour": q_agg_counts_hour,
    "token_roundtrip": q_token_roundtrip,
    "json_lines": q_json_lines,
    "lineitem_pricing": q_lineitem_pricing,
    "nation_revenue": q_nation_revenue,
    "last_event_per_user": q_last_event_per_user,
}

ORACLES = {
    "parse_common": SQL_PARSE_COMMON,
    "dead_letter": SQL_DEAD_LETTER,
    "enrich_status_class": SQL_ENRICH_STATUS_CLASS,
    "route_counts": SQL_ROUTE_COUNTS,
    "agg_counts_hour": SQL_AGG_COUNTS_HOUR,
    "token_roundtrip": SQL_TOKEN_ROUNDTRIP,
    # json_lines: intentionally no oracle (key-order nondeterminism)
    "lineitem_pricing": SQL_LINEITEM_PRICING,
    "nation_revenue": SQL_NATION_REVENUE,
    "last_event_per_user": SQL_LAST_EVENT_PER_USER,
}
