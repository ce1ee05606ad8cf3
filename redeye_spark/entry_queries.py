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
        # identd field: mostly '-' like real logs, but present on a slice
        # so the ident column and its JSON key-omission are exercised
        "ident_str": f"CASE WHEN event_id % 11 = 7 THEN 'svc' || CAST(event_id % 10 AS {s}) ELSE '-' END",
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
    # Combined-format extras: quoted referer / user-agent. "-" inside
    # quotes parses then drops (parser.rs:522-528); the 'emptyq' malformed
    # kind emits "" which ([^"]+) rejects (parser.rs:269-270).
    f["referer"] = ("CASE CAST(event_id % 4 AS INT) WHEN 0 THEN '-' "
                    "WHEN 1 THEN 'http://www.example.com/start.html' "
                    "WHEN 2 THEN 'https://search.example.org/?q=x' ELSE '-' END")
    f["ua"] = ("CASE CAST(event_id % 6 AS INT) "
               "WHEN 0 THEN 'Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36' "
               "WHEN 1 THEN 'curl/8.4.0' "
               "WHEN 2 THEN 'Mozilla/4.08 [en] (Win98; I ;Nav)' "
               "WHEN 3 THEN 'Googlebot/2.1 (+http://www.google.com/bot.html)' "
               "WHEN 4 THEN '-' ELSE 'python-requests/2.31.0' END")
    f["badk_combined"] = ("CASE WHEN event_type = 'error' AND event_id % 4 = 0 THEN 'garbage' "
                          "WHEN event_type = 'error' AND event_id % 4 = 1 THEN 'badts' "
                          "WHEN event_type = 'error' AND event_id % 4 = 2 THEN 'badint' "
                          "WHEN event_type = 'error' AND event_id % 4 = 3 THEN 'emptyq' "
                          "ELSE 'ok' END")
    f["ts_piece"] = f"CASE WHEN {f['badk']} = 'badts' THEN 'not-a-time' ELSE {f['ts_fmt']} || ' ' || {f['off_str']} END"
    f["status_piece"] = f"CASE WHEN {f['badk']} = 'badint' THEN 'NaN' ELSE {f['status_str']} END"
    f["line"] = (
        f"CASE WHEN {f['badk']} = 'garbage' THEN 'this is not a log line ' || CAST(event_id AS {s}) "
        f"ELSE {f['host']} || ' ' || {f['ident_str']} || ' ' || {f['user_str']} || ' [' || {f['ts_piece']} || '] ' "
        f"|| '\"' || {f['method']} || ' ' || {f['uri']} || ' ' || {f['proto']} || '\" ' "
        f"|| {f['status_piece']} || ' ' || {f['clen_str']} END"
    )
    # combined line shares the common core but uses badk_combined for the
    # malformed taxonomy, + trailing quoted headers
    tsp = f"CASE WHEN {f['badk_combined']} = 'badts' THEN 'not-a-time' ELSE {f['ts_fmt']} || ' ' || {f['off_str']} END"
    stp = f"CASE WHEN {f['badk_combined']} = 'badint' THEN 'NaN' ELSE {f['status_str']} END"
    uap = f"CASE WHEN {f['badk_combined']} = 'emptyq' THEN '' ELSE {f['ua']} END"
    f["line_combined"] = (
        f"CASE WHEN {f['badk_combined']} = 'garbage' THEN 'this is not a log line ' || CAST(event_id AS {s}) "
        f"ELSE {f['host']} || ' ' || {f['ident_str']} || ' ' || {f['user_str']} || ' [' || {tsp} || '] ' "
        f"|| '\"' || {f['method']} || ' ' || {f['uri']} || ' ' || {f['proto']} || '\" ' "
        f"|| {stp} || ' ' || {f['clen_str']} "
        f"|| ' \"' || {f['referer']} || '\" \"' || {uap} || '\"' END"
    )
    return f


def _utc(spark: SparkSession) -> None:
    """Pin session TZ: the driver's session config is unknown, and naive
    parquet timestamps must render/compare identically to DuckDB."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _spark_lines(spark: SparkSession, sf_dir: str, fmt: str = FORMAT_COMMON) -> DataFrame:
    """events -> (doc_id, source, line) with session TZ pinned to UTC so
    naive parquet timestamps render identically to DuckDB."""
    from .functions.logparse import FORMAT_COMBINED

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    f = _frags("spark")
    line = f["line_combined"] if fmt == FORMAT_COMBINED else f["line"]
    return spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        f"{f['doc_id']} AS doc_id",
        "event_type AS source",
        f"{line} AS line",
    )


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin the frame across the session's cores: the sf
    testdata is one parquet file per table, so a regex/UDF-heavy query
    would otherwise run on ONE core. Row-wise callers only — the
    result set (and every oracle hash) is partitioning-invariant."""
    return df.repartition(spark.sparkContext.defaultParallelism)


def _parsed(spark: SparkSession, sf_dir: str, carry_tokens: bool = False,
            fmt: str = FORMAT_COMMON) -> DataFrame:
    raw = tokenize_op.tokenize_lines(_spark_lines(spark, sf_dir, fmt))
    # explicit round-robin repartition before the parse UDF: the sf
    # testdata is one parquet file, so without it the whole parse runs
    # on ONE core (2-3x wall at sf0.1). Row-wise op — the result set is
    # partitioning-invariant, so every oracle hash is unaffected.
    return parse_op.parse_sequences(
        raw, fmt=fmt, carry_tokens=carry_tokens,
        num_partitions=spark.sparkContext.defaultParallelism,
    )


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
    CASE WHEN event_id % 11 = 7 THEN 'svc' || CAST(event_id % 10 AS VARCHAR) END AS e_ident,
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
    CASE WHEN badk = 'ok' THEN e_ident END AS ident,
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
    "doc_id", "source", "remote_host", "ident", "remote_user", "timestamp_str",
    "requested_url", "method", "requested_uri", "protocol", "status_code",
    "content_length", "version", "message", "error_kind",
]


# ---------------------------------------------------------------------------
# queries() / oracle_sql() entries
# ---------------------------------------------------------------------------

def q_parse_common(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2-P11: full parse through tokenize -> mapInPandas regex machinery."""
    return _parsed(spark, sf_dir).select(*_PARSE_COLS)


SQL_PARSE_COMMON = f"""
WITH {_oracle_base()}
SELECT doc_id, source, remote_host, ident, remote_user, timestamp_str,
       requested_url, method, requested_uri, protocol, status_code,
       content_length, version, line AS message, error_kind
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


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (COUNT DISTINCT per group): plans as the
    two-phase expand/partial-distinct strategy — the scale-correct shape
    (per-partition dedup before the shuffle)."""
    parsed = _parsed(spark, sf_dir)
    return (
        parsed.filter(F.col("error_kind").isNull())
        .groupBy("method")
        .agg(
            F.countDistinct("remote_host").alias("n_hosts"),
            F.countDistinct("requested_uri").alias("n_uris"),
            F.count(F.lit(1)).alias("n_requests"),
        )
    )


SQL_DISTINCT_COUNTS = f"""
WITH {_oracle_base()}
SELECT method,
       COUNT(DISTINCT remote_host) AS n_hosts,
       COUNT(DISTINCT requested_uri) AS n_uris,
       COUNT(*) AS n_requests
FROM expected WHERE error_kind IS NULL
GROUP BY method
"""


def q_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (Spark `percentile` == DuckDB
    quantile_cont: linear interpolation on the sorted values). The
    approximate-sketch variant for 100 TB is percentile_approx /
    approx_quantile — same plan shape, bounded state."""
    parsed = _parsed(spark, sf_dir)
    return (
        parsed.filter(F.col("error_kind").isNull() & F.col("content_length").isNotNull())
        .groupBy("method")
        .agg(
            F.round(F.expr("percentile(content_length, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(content_length, 0.95)"), 4).alias("p95"),
            F.max("content_length").alias("max_len"),
        )
    )


SQL_LATENCY_PERCENTILES = f"""
WITH {_oracle_base()}
SELECT method,
       round(quantile_cont(content_length, 0.5), 4) AS p50,
       round(quantile_cont(content_length, 0.95), 4) AS p95,
       MAX(content_length) AS max_len
FROM expected WHERE error_kind IS NULL AND content_length IS NOT NULL
GROUP BY method
"""


def q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP multi-grouping (Expand-based plan: one pass emits all
    grouping sets). Error rows are excluded first so NULL grouping keys
    unambiguously mark subtotal rows in both engines."""
    parsed = _parsed(spark, sf_dir)
    return (
        parsed.filter(F.col("error_kind").isNull())
        .rollup("method", "protocol")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_ROLLUP_COUNTS = f"""
WITH {_oracle_base()}
SELECT method, protocol, COUNT(*) AS n
FROM expected WHERE error_kind IS NULL
GROUP BY ROLLUP(method, protocol)
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
    """S2 JSON-lines sink in CANONICAL (sorted-key, jq -S) form over the
    COMBINED format, so the driver verifies the full JSON contract:
    key naming ("@timestamp", "@version", nested request_headers with
    literal "user-agent"), key omission of '-' fields at every level,
    number rendering, and string escaping (messages contain quotes).
    redeye's own HashMap key order is nondeterministic — its README
    pipes output through `jq -S` to compare, which is exactly this form.
    The reference-ordered sink itself is parse_op.to_logstash_json
    (reachable via job.py --json-sink)."""
    from .functions.logparse import FORMAT_COMBINED

    return parse_op.to_canonical_json(_parsed(spark, sf_dir, fmt=FORMAT_COMBINED))


# --- relational coverage over TPC-H-ish tables (SURVEY §2.2) ---

def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregate; decimal sums for cross-engine exactness."""
    _utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)")
                 * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )  # decimal sums are exact at 2-4dp; the final double cast is lossless (< 2^53)


SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
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
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


SQL_NATION_REVENUE = """
SELECT n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort/limit top-k: orderBy+limit plans as
    TakeOrderedAndProject — per-partition local top-k then a driver-side
    merge of n_partitions*k rows, the only scale-correct global top-k
    (never a full sort). Deterministic tie-break on the unique key."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join over the supplier + nation dims with a HAVING-style
    post-aggregation filter (exercises the remaining TPC-H-ish tables)."""
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        )
        .filter(F.col("n_suppliers") >= 1)
    )


SQL_SUPPLIER_BALANCE = """
SELECT n_name, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name HAVING COUNT(*) >= 1
"""


def q_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-level aggregate with a pushed filter over the part table."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return (
        part.filter(F.col("p_size") >= 10)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
    )


SQL_PARTS_BY_BRAND = """
SELECT p_brand, COUNT(*) AS n_parts,
       round(AVG(p_retailprice), 2) AS avg_price,
       MAX(p_size) AS max_size
FROM part WHERE p_size >= 10 GROUP BY p_brand
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
    "distinct_counts": q_distinct_counts,
    "latency_percentiles": q_latency_percentiles,
    "rollup_counts": q_rollup_counts,
    "token_roundtrip": q_token_roundtrip,
    "json_lines": q_json_lines,
    "lineitem_pricing": q_lineitem_pricing,
    "nation_revenue": q_nation_revenue,
    "top_orders": q_top_orders,
    "supplier_balance": q_supplier_balance,
    "parts_by_brand": q_parts_by_brand,
    "last_event_per_user": q_last_event_per_user,
}

ORACLES = {
    "parse_common": SQL_PARSE_COMMON,
    "dead_letter": SQL_DEAD_LETTER,
    "enrich_status_class": SQL_ENRICH_STATUS_CLASS,
    "route_counts": SQL_ROUTE_COUNTS,
    "agg_counts_hour": SQL_AGG_COUNTS_HOUR,
    "distinct_counts": SQL_DISTINCT_COUNTS,
    "latency_percentiles": SQL_LATENCY_PERCENTILES,
    "rollup_counts": SQL_ROLLUP_COUNTS,
    "token_roundtrip": SQL_TOKEN_ROUNDTRIP,
    "lineitem_pricing": SQL_LINEITEM_PRICING,
    "nation_revenue": SQL_NATION_REVENUE,
    "top_orders": SQL_TOP_ORDERS,
    "supplier_balance": SQL_SUPPLIER_BALANCE,
    "parts_by_brand": SQL_PARTS_BY_BRAND,
    "last_event_per_user": SQL_LAST_EVENT_PER_USER,
}


# ---------------------------------------------------------------------------
# Combined-format parse (P4 + quirks 3/4: quoted headers, emptyq rejects)
# ---------------------------------------------------------------------------

def q_parse_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.logparse import FORMAT_COMBINED

    return _parsed(spark, sf_dir, fmt=FORMAT_COMBINED).select(
        "doc_id", "remote_host", "timestamp_str", "status_code",
        "referer", "user_agent", "error_kind",
    )


def _oracle_combined_base() -> str:
    f = _frags("duck")
    return f"""
cbase AS (
  SELECT
    {f['doc_id']} AS doc_id,
    {f['badk_combined']} AS badk,
    {f['line_combined']} AS line,
    {f['host']} AS e_host,
    CASE WHEN event_id % 11 = 7 THEN 'svc' || CAST(event_id % 10 AS VARCHAR) END AS e_ident,
    CASE WHEN user_id % 5 = 0 THEN NULL ELSE 'u' || CAST(user_id % 100 AS VARCHAR) END AS e_user,
    {f['iso_fmt']} || {f['off_rfc']} AS e_ts_str,
    {f['method']} AS e_method,
    {f['uri']} AS e_uri,
    {f['proto']} AS e_proto,
    CASE WHEN event_id % 97 = 0 THEN NULL ELSE CAST({_STATUS} AS BIGINT) END AS e_status,
    CASE WHEN event_id % 13 = 0 THEN NULL
         ELSE CAST(floor(value * 100) AS BIGINT) % 100000 END AS e_clen,
    CASE WHEN {f['referer']} = '-' THEN NULL ELSE {f['referer']} END AS e_referer,
    CASE WHEN {f['ua']} = '-' THEN NULL ELSE {f['ua']} END AS e_ua
  FROM events
),
cexpected AS (
  SELECT doc_id, line,
    CASE WHEN badk = 'badts' THEN 'TimestampParseError'
         WHEN badk IN ('garbage', 'badint', 'emptyq') THEN 'ParseError' END AS error_kind,
    CASE WHEN badk = 'ok' THEN e_host END AS remote_host,
    CASE WHEN badk = 'ok' THEN e_ident END AS ident,
    CASE WHEN badk = 'ok' THEN e_user END AS remote_user,
    CASE WHEN badk = 'ok' THEN e_ts_str END AS timestamp_str,
    CASE WHEN badk = 'ok' THEN e_method END AS method,
    CASE WHEN badk = 'ok' THEN e_uri END AS requested_uri,
    CASE WHEN badk = 'ok' THEN e_proto END AS protocol,
    CASE WHEN badk = 'ok' THEN e_method || ' ' || e_uri || ' ' || e_proto END AS requested_url,
    CASE WHEN badk = 'ok' THEN e_status END AS status_code,
    CASE WHEN badk = 'ok' THEN e_clen END AS content_length,
    CASE WHEN badk = 'ok' THEN e_referer END AS referer,
    CASE WHEN badk = 'ok' THEN e_ua END AS user_agent
  FROM cbase
)"""


SQL_PARSE_COMBINED = f"""
WITH {_oracle_combined_base()}
SELECT doc_id, remote_host, timestamp_str, status_code, referer, user_agent, error_kind
FROM cexpected
"""


# Canonical JSON built by hand with sorted keys; concat_ws skips NULL
# fragments, reproducing to_json's ignoreNullFields at both levels, and
# DuckDB's to_json() escapes strings identically (JSON standard). Plain
# concatenation (no f-string) keeps the JSON braces readable.
SQL_JSON_LINES = "WITH " + _oracle_combined_base() + """
SELECT doc_id,
  '{' || concat_ws(',',
    '"@timestamp":' || to_json(timestamp_str),
    '"@version":"1"',
    CASE WHEN content_length IS NOT NULL THEN '"content_length":' || content_length END,
    CASE WHEN ident IS NOT NULL THEN '"ident":' || to_json(ident) END,
    '"message":' || to_json(line),
    '"method":' || to_json(method),
    '"protocol":' || to_json(protocol),
    '"remote_host":' || to_json(remote_host),
    CASE WHEN remote_user IS NOT NULL THEN '"remote_user":' || to_json(remote_user) END,
    CASE WHEN referer IS NOT NULL OR user_agent IS NOT NULL THEN
      '"request_headers":{' || concat_ws(',',
        CASE WHEN referer IS NOT NULL THEN '"referer":' || to_json(referer) END,
        CASE WHEN user_agent IS NOT NULL THEN '"user-agent":' || to_json(user_agent) END
      ) || '}' END,
    '"requested_uri":' || to_json(requested_uri),
    '"requested_url":' || to_json(requested_url),
    CASE WHEN status_code IS NOT NULL THEN '"status_code":' || status_code END
  ) || '}' AS json
FROM cexpected WHERE error_kind IS NULL
"""


def q_enrich_ua_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast UA-family lookup join over combined-format parses."""
    from .functions.logparse import FORMAT_COMBINED

    parsed = _parsed(spark, sf_dir, fmt=FORMAT_COMBINED)
    enriched = enrich_op.enrich(
        parsed, enrich_op.dim_status_class(spark), enrich_op.dim_ua_family(spark)
    )
    return (
        enriched.filter(F.col("user_agent").isNotNull())
        .groupBy("ua_family")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_ENRICH_UA_FAMILY = f"""
WITH {_oracle_combined_base()}
SELECT CASE WHEN user_agent LIKE 'Mozilla%' OR user_agent LIKE 'Opera%' THEN 'browser'
            WHEN user_agent LIKE 'curl%' OR user_agent LIKE 'Wget%'
                 OR user_agent LIKE 'python-requests%' OR user_agent LIKE 'Go-http-client%' THEN 'cli'
            WHEN user_agent LIKE 'Googlebot%' OR user_agent LIKE 'bingbot%'
                 OR user_agent LIKE 'Baiduspider%' OR user_agent LIKE 'facebookexternalhit%' THEN 'bot'
            ELSE 'other' END AS ua_family,
       COUNT(*) AS n
FROM cexpected WHERE user_agent IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Training-data ops over documents / embeddings (first-class coverage)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.exact_dedup(docs)


SQL_DEDUP_EXACT = """
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
FROM documents GROUP BY text
"""


def q_dedup_exact_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB exact-dedup path: group by (xxhash64(text), length)
    so the shuffle carries ~16 bytes/row instead of documents. The
    output contract is identical, so the SAME by-text SQL oracle
    verifies it — including the absence of hash collisions."""
    from .operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.exact_dedup(docs, by_hash=True)


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.quality_metrics(docs).select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "avg_word_len", "punct_ratio", "dup_word_ratio",
    )


SQL_TEXT_QUALITY = r"""
WITH w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS BIGINT) AS n_words,
       CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
            THEN round(length(regexp_replace(text, '\s+', '', 'g')) * 1.0 / len(ws), 4) END AS avg_word_len,
       CASE WHEN length(text) > 0
            THEN round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text), 4) END AS punct_ratio,
       CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
            THEN round((len(ws) - len(list_distinct(ws))) * 1.0 / len(ws), 4) END AS dup_word_ratio
FROM w
"""


def q_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        text_op.token_count(F.col("text")).cast("long").alias("n_words"),
        text_op.subword_estimate(F.col("text")).cast("long").alias("n_subwords"),
    )


SQL_SUBWORD_TOKENS = r"""
WITH w AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws FROM documents)
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS BIGINT) AS n_words,
       CAST(list_aggregate(list_transform(ws, x -> CAST(ceil(length(x) / 4.0) AS INT)), 'sum') AS BIGINT) AS n_subwords
FROM w
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.lang_id(docs).groupBy("lang_guess").agg(F.count(F.lit(1)).alias("n"))


def _stop_sql(lang: str) -> str:
    from .operators.text import STOPWORDS

    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_intersect(ws, [{words}]))"


SQL_LANG_ID = rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents
),
h AS (
  SELECT doc_id, {_stop_sql('en')} AS h_en, {_stop_sql('es')} AS h_es,
         {_stop_sql('fr')} AS h_fr, {_stop_sql('de')} AS h_de
  FROM w
)
SELECT CASE WHEN greatest(h_en, h_es, h_fr, h_de) = 0 THEN 'und'
            WHEN h_en = greatest(h_en, h_es, h_fr, h_de) THEN 'en'
            WHEN h_es = greatest(h_en, h_es, h_fr, h_de) THEN 'es'
            WHEN h_fr = greatest(h_en, h_es, h_fr, h_de) THEN 'fr'
            ELSE 'de' END AS lang_guess,
       COUNT(*) AS n
FROM h GROUP BY 1
"""


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 3 vectors (exact ANN
    baseline). Returns ranks only — cross-engine float hashing of the
    cosine itself is not stable at the last ulp."""
    from .operators import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = [(int(r["vec_id"]), list(r["embedding"]))
               for r in embs.filter(F.col("vec_id") < 3).collect()]
    top = similarity.brute_force_topk(embs, queries, k=5)
    return top.select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"))


SQL_SIMILARITY_TOPK = """
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id
         ) AS rank
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 3
) WHERE rank <= 5
"""


def _ivf_fixed_centroids(nlist: int = 8, dim: int = 64, seed: int = 7):
    """Deterministic centroids for the driver-checked IVF query: seeded
    Gaussian directions, normalized. Fixing the centroids (instead of
    k-means-fitting them) lets the DuckDB oracle embed the SAME values as
    literals and replicate the FULL IVF semantics — assignment, probing,
    pruned ranking — in SQL. Production callers use fit_centroids()."""
    import numpy as np

    rng = np.random.default_rng(seed)
    c = rng.normal(size=(nlist, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


_IVF_NPROBE = 3


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 for the first 3 vectors with fixed centroids: the
    oracle mirrors list assignment + nprobe probing + in-list ranking
    exactly, so this verifies the whole IVF plan (assign -> prune ->
    masked local top-k -> global merge), not just output shape."""
    from .operators import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = [(int(r["vec_id"]), list(r["embedding"]))
               for r in embs.filter(F.col("vec_id") < 3).collect()]
    top = similarity.ivf_topk(
        embs, queries, k=5, nprobe=_IVF_NPROBE, centroids=_ivf_fixed_centroids()
    )
    return top.select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"))


def _ivf_oracle_sql() -> str:
    cents = _ivf_fixed_centroids()
    rows = ", ".join(
        "(%d, [%s]::DOUBLE[])" % (i, ", ".join(repr(float(v)) for v in c))
        for i, c in enumerate(cents)
    )
    return f"""
WITH cents(list_id, cvec) AS (VALUES {rows}),
assign AS (
  SELECT e.vec_id, e.embedding,
         (SELECT c.list_id FROM cents c
          ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.list_id
          LIMIT 1) AS list_id
  FROM embeddings e
),
probes AS (
  SELECT q.vec_id AS query_id, c.list_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.cvec) DESC, c.list_id
         ) AS pr
  FROM embeddings q, cents c WHERE q.vec_id < 3
)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT p.query_id, a.vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY p.query_id
           ORDER BY list_cosine_similarity(q.embedding, a.embedding) DESC, a.vec_id
         ) AS rank
  FROM (SELECT query_id, list_id FROM probes WHERE pr <= {_IVF_NPROBE}) p
  JOIN assign a ON a.list_id = p.list_id
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE a.vec_id <> p.query_id
) WHERE rank <= 5
"""


SQL_IVF_TOPK = _ivf_oracle_sql()


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # trim matches the oracle's tokenization at the edges (corpus text
    # carries no edge whitespace today; this keeps the pair robust)
    from .operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "text", F.trim("text")
    )
    return dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.5)


SQL_NGRAM_JACCARD = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
),
g AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] AS gram
  FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(n_common * 1.0 / (sa.n_grams + sb.n_grams - n_common), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common * 1.0 / (sa.n_grams + sb.n_grams - n_common) >= 0.5
"""


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media-column plumbing: metadata projection without decode
    (documents.text bytes stand in for opaque payloads)."""
    from .operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.col("doc_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.substring(F.col("text"), 1, 64), "utf-8").alias("payload"),
    )
    m = multimodal.attach_metadata(media)
    return m.select("doc_id", F.col("meta.n_bytes").alias("n_bytes"), F.col("meta.magic").alias("magic"))


SQL_MULTIMODAL_META = """
SELECT doc_id,
       CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT) AS n_bytes,
       upper(hex(encode(substr(text, 1, 4)))) AS magic
FROM documents
"""


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pair set (ids only — est_jaccard is a hash
    estimate with no SQL form). The oracle computes the EXACT 5-byte
    character-shingle Jaccard in DuckDB: the testdata's planted near-dups
    sit at J >= 0.92 with the next pair at 0.33, so the LSH pair set at
    threshold 0.5 must equal the exact pair set — a real end-to-end
    check of shingling, signatures, banding, and estimation."""
    from .operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_lsh_pairs(docs, threshold=0.5).select("id_a", "id_b")


# Exact char-5-shingle Jaccard (the operator's shingle definition: all
# 5-byte windows; rows shorter than 5 contribute the whole row).
SQL_MINHASH_PAIRS = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(length(text) - 4, 1)),
           i -> substr(text, i, 5))) AS grams
  FROM documents
),
g AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
sizes AS (SELECT doc_id, len(grams) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling fan-out (doc -> up to 8 fixed-size
    frames), the explode-shaped operator real video decode plugs into.
    The corpus text is pure ASCII, so byte frames decode back to strings
    and the oracle re-derives them with substr arithmetic."""
    from .operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("video").alias("media_type"),
        F.encode(F.substring(F.col("text"), 1, 64), "utf-8").alias("payload"),
    )
    frames = multimodal.sample_frames(media, every_n_bytes=16, max_frames=8)
    return frames.select(
        "doc_id", "frame_idx", F.decode("frame_bytes", "utf-8").alias("frame_str")
    )


SQL_FRAME_SAMPLE = """
WITH m AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, substr(text, 1, 64) AS payload
  FROM documents
)
SELECT doc_id, CAST(i - 1 AS INT) AS frame_idx,
       substr(payload, (i - 1) * 16 + 1, 16) AS frame_str
FROM m, UNNEST(generate_series(1,
       least(8, greatest(1, CAST(floor(length(payload) / 16) AS INT))))) AS t(i)
"""


def q_dedup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end of the dedup story: apply the MinHash-LSH pair set to the
    corpus with the keep-lowest-id policy and return the surviving ids.
    Oracle: ids not appearing as id_b in the exact-Jaccard pair set."""
    from .operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    return dedup.drop_near_duplicates(docs, pairs).select("doc_id")


# The pair query embeds verbatim as a derived table (DuckDB allows WITH
# inside a parenthesized subquery) — no brittle string surgery.
SQL_DEDUP_FILTER = f"""
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id_b FROM ({SQL_MINHASH_PAIRS}) AS pair_set)
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite curation quality score (monotone blend of the rounded
    metrics) — the formula is replicated verbatim in SQL, so the driver
    hash-checks the full scoring path, not just the raw metrics."""
    from .operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.quality_score(docs).select("doc_id", "quality")


SQL_QUALITY_SCORE = r"""
WITH w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws FROM documents
),
m AS (
  SELECT doc_id,
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS BIGINT) AS n_words,
    CASE WHEN length(text) > 0
         THEN round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text), 4)
         ELSE NULL END AS punct_ratio,
    CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
         THEN round(len(list_intersect(list_transform(string_split_regex(trim(lower(text)), '\s+'), x -> trim(x)),
              ['the','and','of','to','in','is','that','for','with','was'])) * 1.0 / len(ws), 4)
         ELSE NULL END AS stopword_ratio,
    CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
         THEN round((len(ws) - len(list_distinct(ws))) * 1.0 / len(ws), 4)
         ELSE NULL END AS dup_word_ratio
  FROM w
)
SELECT doc_id,
  round(
    least(n_words / 20.0, 1.0) * 0.4
    + (1 - least(coalesce(punct_ratio, 0.0) * 4, 1.0)) * 0.2
    + least(coalesce(stopword_ratio, 0.0) * 5, 1.0) * 0.2
    + (1 - least(coalesce(dup_word_ratio, 0.0) * 2, 1.0)) * 0.2,
  4) AS quality
FROM m
"""


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming<=3 pairs under a FULL oracle: the md5-keyed token
    hash is shared with DuckDB, which rebuilds every signature from the
    same md5 hex digits (64 bit-vote sums) and applies the exact
    all-pairs bit_count(xor) <= 3 cut. Spark's banded pair set equals
    the exact cut because hamming <= 3 over 4 16-bit blocks guarantees
    at least one identical block (pigeonhole) — so this verifies
    tokenization, hashing, voting, banding, AND the hamming filter."""
    from .operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash_near_pairs(docs, max_hamming=3)


def _simhash_oracle_sql(seed: int = 42, max_hamming: int = 3) -> str:
    """DuckDB replica of simhash_signatures: bit b of a token's 64-bit
    hash lives in md5-hex digit 16 - b//4 (1-based, big-endian), bit
    b%4 of the digit's value. Weight of bit 63 is long-min (sign bit)."""
    bit_sums = ",\n         ".join(
        f"sum(((strpos('0123456789abcdef', substr(hx, {16 - b // 4}, 1))-1) >> {b % 4}) & 1) AS c{b}"
        for b in range(64)
    )
    weights = " + ".join(
        f"CASE WHEN 2*c{b} > n THEN {-(1 << 63) if b == 63 else (1 << b)} ELSE 0 END"
        for b in range(64)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS tok
  FROM documents
),
h AS (SELECT doc_id, md5('sh{seed}:' || tok) AS hx FROM toks),
bits AS (
  SELECT doc_id, count(*) AS n,
         {bit_sums}
  FROM h GROUP BY doc_id
),
sig AS (SELECT doc_id, CAST({weights} AS BIGINT) AS sh FROM bits),
allsig AS (
  SELECT d.doc_id, coalesce(s.sh, 0) AS sh
  FROM documents d LEFT JOIN sig s USING (doc_id)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
FROM allsig a JOIN allsig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
"""


SQL_SIMHASH_PAIRS = _simhash_oracle_sql()


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints, checked through their GROUP
    structure: the fingerprint equality classes must equal the
    normalized-text (lower, whitespace-split) equality classes — which
    verifies determinism, normalization semantics, and injectivity on
    the corpus even though DuckDB cannot chain xxhash64 itself."""
    from pyspark.sql import Window
    from .operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fps = text_op.document_fingerprints(docs)
    w = Window.partitionBy("fp")
    return fps.select(
        "doc_id",
        F.min("doc_id").over(w).alias("keep_id"),
        F.count(F.lit(1)).over(w).alias("group_n"),
    )


SQL_DOC_FINGERPRINTS = r"""
WITH k AS (
  SELECT doc_id,
         array_to_string(string_split_regex(trim(lower(text)), '\s+'), chr(31)) AS key
  FROM documents
)
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY key) AS keep_id,
       COUNT(*) OVER (PARTITION BY key) AS group_n
FROM k
"""


QUERIES.update({
    "parse_combined": q_parse_combined,
    "enrich_ua_family": q_enrich_ua_family,
    "dedup_exact": q_dedup_exact,
    "dedup_exact_hashed": q_dedup_exact_hashed,
    "text_quality": q_text_quality,
    "subword_tokens": q_subword_tokens,
    "lang_id": q_lang_id,
    "similarity_topk": q_similarity_topk,
    "ivf_topk": q_ivf_topk,
    "ngram_jaccard": q_ngram_jaccard,
    "multimodal_meta": q_multimodal_meta,
    "minhash_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
    "doc_fingerprints": q_doc_fingerprints,
    "dedup_filter": q_dedup_filter,
    "quality_score": q_quality_score,
    "frame_sample": q_frame_sample,
})

ORACLES.update({
    "json_lines": SQL_JSON_LINES,
    "parse_combined": SQL_PARSE_COMBINED,
    "enrich_ua_family": SQL_ENRICH_UA_FAMILY,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_exact_hashed": SQL_DEDUP_EXACT,
    "text_quality": SQL_TEXT_QUALITY,
    "subword_tokens": SQL_SUBWORD_TOKENS,
    "lang_id": SQL_LANG_ID,
    "similarity_topk": SQL_SIMILARITY_TOPK,
    "ivf_topk": SQL_IVF_TOPK,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "multimodal_meta": SQL_MULTIMODAL_META,
    "minhash_pairs": SQL_MINHASH_PAIRS,
    "doc_fingerprints": SQL_DOC_FINGERPRINTS,
    "dedup_filter": SQL_DEDUP_FILTER,
    "quality_score": SQL_QUALITY_SCORE,
    "frame_sample": SQL_FRAME_SAMPLE,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
})


# ---------------------------------------------------------------------------
# Sessionization + sequence-length stats (window fns / training-data prep)
# ---------------------------------------------------------------------------

def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of parsed requests per remote host
    (window functions: lag -> gap flag -> running sum)."""
    from .operators import sessionize as sess_op

    parsed = _parsed(spark, sf_dir).filter(
        F.col("error_kind").isNull() & F.col("remote_host").isNotNull()
    )
    return sess_op.session_stats(parsed, key="remote_host", ts="timestamp", gap_minutes=30)


SQL_SESSION_STATS = f"""
WITH {_oracle_base()},
ok AS (
  SELECT remote_host, date_trunc('second', ts_utc) AS t
  FROM expected WHERE error_kind IS NULL AND remote_host IS NOT NULL
),
s AS (
  SELECT remote_host, t,
         CASE WHEN lag(t) OVER w IS NULL
                   OR epoch(t) - epoch(lag(t) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
  FROM ok WINDOW w AS (PARTITION BY remote_host ORDER BY t)
),
s2 AS (
  SELECT remote_host, t,
         SUM(new_s) OVER (PARTITION BY remote_host ORDER BY t ROWS UNBOUNDED PRECEDING) AS sn
  FROM s
)
SELECT remote_host,
       remote_host || '#' || CAST(sn AS VARCHAR) AS session_id,
       COUNT(*) AS n_requests,
       CAST(MAX(epoch(t)) - MIN(epoch(t)) AS BIGINT) AS duration_sec
FROM s2 GROUP BY 1, 2
"""


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram of the tokenized corpus (training-data
    length stats; n_tok == line byte length for ASCII lines)."""
    from .operators import sequences as seq_op

    raw = tokenize_op.tokenize_lines(_spark_lines(spark, sf_dir))
    return seq_op.length_histogram(raw, bucket=16)


SQL_LENGTH_HISTOGRAM = f"""
WITH {_oracle_base()}
SELECT CAST(floor(length(line) / 16) * 16 AS BIGINT) AS len_bucket,
       COUNT(*) AS n,
       CAST(SUM(length(line)) AS BIGINT) AS total_tok
FROM base GROUP BY 1
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing, checked through its partition-order-free
    INVARIANTS (pack boundaries legitimately depend on partition-local
    arrival order, so pack rows themselves can't be oracled):
      * token conservation — sum(n_tok) minus the one separator per
        extra doc equals the input token count exactly;
      * doc conservation — sum(n_docs) equals the input row count;
      * budget — no multi-doc pack exceeds max_tokens (single oversized
        docs are allowed through un-truncated by design).
    All three are DuckDB-expressible over the input (tokens are line
    bytes), so this runs the real packing operator end to end under a
    full value-hash check."""
    from .operators import sequences as seq_op

    raw = tokenize_op.tokenize_lines(_spark_lines(spark, sf_dir)).coalesce(4)
    packed = seq_op.pack_sequences(raw, max_tokens=2048)
    return packed.agg(
        F.sum(F.col("n_tok") - (F.col("n_docs") - 1)).cast("long").alias("total_tok_net"),
        F.sum("n_docs").cast("long").alias("total_docs"),
        F.count(
            F.when((F.col("n_docs") > 1) & (F.col("n_tok") > 2048), 1)
        ).alias("oversize_multi"),
    )


SQL_PACK_SEQUENCES = f"""
WITH {_oracle_base()}
SELECT CAST(SUM(length(line)) AS BIGINT) AS total_tok_net,
       CAST(COUNT(*) AS BIGINT) AS total_docs,
       CAST(0 AS BIGINT) AS oversize_multi
FROM base
"""


def q_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via hyperplane-LSH bucketing
    + exact in-bucket cosine — no driver-side collect at any scale. The
    oracle is the EXACT all-pairs cosine threshold in DuckDB, so this
    checks LSH recall (the band parameters are sized for recall ~1 at
    the 0.45 threshold: p=0.65, 64 bands x 4 bits -> miss ~4e-6/pair)
    AND the in-bucket cosine math. Pair ids only: the cosine value's
    last ulp is not hash-stable across engines (it IS checked against
    numpy in pytest)."""
    from .operators import dedup

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = dedup.cosine_lsh_pairs(embs, threshold=0.45, bits_per_band=4, bands=64)
    return pairs.select("id_a", "id_b")


# Threshold margin note: nearest pair cosines to 0.45 in the testdata are
# 0.4494/0.4516 (sf0.01) and 0.4489/0.4532 (sf0.001) — 1e-3 margins, far
# beyond any cross-engine float noise.
SQL_COSINE_NEAR_DUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the derived log corpus: every line carries an
    IPv4 (the remote host) and an appended synthetic email, so both
    placeholder substitutions are exercised; chained regexp_replace runs
    at scan speed. Patterns are Java-regex/RE2-common so the DuckDB
    oracle replays them verbatim."""
    from .operators import text as text_op

    lines = _spread(spark, _spark_lines(spark, sf_dir).select(
        "doc_id",
        F.concat(F.col("line"), F.lit(" "), F.col("doc_id"), F.lit("@example.net")).alias("text"),
    ))
    return text_op.redact_pii(lines).select("doc_id", "text_redacted")


SQL_REDACT_PII = f"""
WITH {_oracle_base()}
SELECT doc_id,
       regexp_replace(
         regexp_replace(line || ' ' || doc_id || '@example.net',
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<email>', 'g'),
         '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<ipv4>', 'g'
       ) AS text_redacted
FROM expected
"""


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle: md5-keyed global order
    (range-partitioned sort at scale); the first 25 keys are checked —
    both engines compute the identical md5 permutation."""
    from .operators import sequences as seq_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        seq_op.epoch_shuffle(docs, epoch=1)
        .select("doc_id", "shuffle_key")
        .limit(25)
    )


SQL_EPOCH_SHUFFLE = """
SELECT doc_id, md5('e1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM documents
ORDER BY shuffle_key LIMIT 25
"""


def q_stream_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming end to end under a full oracle: the derived
    corpus streams through readStream -> the SAME parse/enrich/tag plan
    -> watermarked 1-hour windowed counts (append mode, availableNow).
    Single input file + single micro-batch makes it deterministic: no
    intra-stream late-drops, and exactly the windows whose end the
    terminal watermark (max event time - 2h) has passed are emitted —
    a condition DuckDB reproduces from first principles. Multi-batch
    behavior (real late-data handling) is pytest-covered."""
    import atexit
    import shutil
    import tempfile

    from .streaming import stream as stream_mod
    from .plans.pipeline import PipelineConfig

    base = tempfile.mkdtemp(prefix="redeye_stream_q_")
    try:
        raw = tokenize_op.tokenize_lines(_spark_lines(spark, sf_dir)).coalesce(1)
        raw.write.mode("overwrite").parquet(base + "/in")
        q = stream_mod.start_windowed_counts(
            spark, base + "/in", base + "/out", base + "/ckpt",
            cfg=PipelineConfig(), window="1 hour", watermark="2 hours",
            trigger_available_now=True, max_files_per_trigger=None,
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("stream_counts query did not finish within 600s")
    except BaseException:
        shutil.rmtree(base, ignore_errors=True)
        raise
    # Free the bulky scratch (corpus copy + checkpoint) now; the windowed
    # OUTPUT parquet stays on disk until process exit and is returned as a
    # lazy scan — no driver-side collect of an unbounded (hour x sink x
    # method x source) result.
    shutil.rmtree(base + "/in", ignore_errors=True)
    shutil.rmtree(base + "/ckpt", ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return spark.read.parquet(base + "/out").select(
        "sink",
        F.date_format("bucket", "yyyy-MM-dd HH:00:00").alias("bucket_str"),
        "status_class", "method", "source", "n",
    )


# Watermark semantics replicated: a window [start, start+1h) is emitted
# iff start + 1h <= max(event_time) - 2h. Only ok rows reach the
# aggregation (error rows carry NULL timestamps).
SQL_STREAM_COUNTS = f"""
WITH {_oracle_base()},
ok AS (SELECT * FROM expected WHERE error_kind IS NULL),
wm AS (SELECT max(ts_utc) - INTERVAL 2 HOUR AS w FROM ok)
SELECT CASE WHEN status_code BETWEEN 200 AND 299 THEN 'sink_2xx'
            WHEN status_code BETWEEN 300 AND 399 THEN 'sink_3xx'
            WHEN status_code BETWEEN 400 AND 599 THEN 'sink_4xx5xx'
            ELSE 'sink_other' END AS sink,
       strftime(date_trunc('hour', ts_utc), '%Y-%m-%d %H:00:00') AS bucket_str,
       CASE WHEN status_code IS NOT NULL THEN CAST(floor(status_code / 100) AS BIGINT) || 'xx' END AS status_class,
       method, source, COUNT(*) AS n
FROM ok, wm
WHERE date_trunc('hour', ts_utc) + INTERVAL 1 HOUR <= wm.w
GROUP BY ALL
"""


QUERIES.update({
    "session_stats": q_session_stats,
    "length_histogram": q_length_histogram,
    "pack_sequences": q_pack_sequences,
    "cosine_near_dup": q_cosine_near_dup,
    "stream_counts": q_stream_counts,
    "redact_pii": q_redact_pii,
    "epoch_shuffle": q_epoch_shuffle,
})
ORACLES.update({
    "session_stats": SQL_SESSION_STATS,
    "length_histogram": SQL_LENGTH_HISTOGRAM,
    "cosine_near_dup": SQL_COSINE_NEAR_DUP,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "stream_counts": SQL_STREAM_COUNTS,
    "redact_pii": SQL_REDACT_PII,
    "epoch_shuffle": SQL_EPOCH_SHUFFLE,
})


# ---------------------------------------------------------------------------
# Round 3: fact x fact shuffle join, set ops, sketch percentiles
# ---------------------------------------------------------------------------

def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shape large x large SHUFFLE join: orders semi-joined to
    lineitem on orderkey plus a non-equi lateness condition (a lineitem
    shipped >60 days after the order date). Neither side of a fact x fact
    join fits a broadcast at scale, so the lineitem side carries an
    explicit MERGE hint: both sides shuffle-partition on the key and
    sort-merge — the plan a 100 TB lineitem JOIN orders actually runs
    (and what AQE would pick once both sides exceed the broadcast
    threshold; the hint makes the shape deterministic across SFs).
    Plan-gated in tests/test_plans.py: SortMergeJoin + LeftSemi, no
    BroadcastHashJoin; AQE skew-split over this shape is smoke-tested
    separately."""
    _utc(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    late = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li.hint("merge"), late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_ORDER_PRIORITY_COUNTS = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q_customer_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set-op (SURVEY §2.2 'Set ops'): customers who ordered in
    1995 but not in 1996. subtract() is EXCEPT DISTINCT — plans as a
    left-anti aggregate over the two scans, the corpus-delta shape
    (yesterday's ids minus today's) a training pipeline diffs snapshots
    with."""
    _utc(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = orders.filter(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)


SQL_CUSTOMER_CHURN = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def q_customer_retained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set-op: customers active in both 1995 and 1996."""
    _utc(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = orders.filter(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


SQL_CUSTOMER_RETAINED = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def q_latency_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: percentile_approx (Greenwald-Khanna
    sketch, memory bounded by `accuracy` regardless of group size) over
    the same grouping as the exact q_latency_percentiles. With accuracy
    >= the group size the sketch buffers losslessly and returns the
    EXACT discrete quantile (the element at rank ceil(p*n)) — equal to
    DuckDB quantile_disc, which is the oracle here. At scale the same
    plan holds with rank error <= n/accuracy instead of an exact-percentile
    OOM (exact `percentile` buffers every value per group)."""
    parsed = _parsed(spark, sf_dir)
    acc = F.lit(1_000_000)
    return (
        parsed.filter(F.col("error_kind").isNull() & F.col("content_length").isNotNull())
        .groupBy("method")
        .agg(
            F.percentile_approx("content_length", F.lit(0.5), acc).alias("p50"),
            F.percentile_approx("content_length", F.lit(0.95), acc).alias("p95"),
            F.percentile_approx("content_length", F.lit(0.99), acc).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
    )


SQL_LATENCY_PERCENTILES_APPROX = f"""
WITH {_oracle_base()}
SELECT method,
       quantile_disc(content_length, 0.5) AS p50,
       quantile_disc(content_length, 0.95) AS p95,
       quantile_disc(content_length, 0.99) AS p99,
       COUNT(*) AS n
FROM expected WHERE error_kind IS NULL AND content_length IS NOT NULL
GROUP BY method
"""


QUERIES.update({
    "order_priority_counts": q_order_priority_counts,
    "customer_churn": q_customer_churn,
    "customer_retained": q_customer_retained,
    "latency_percentiles_approx": q_latency_percentiles_approx,
})
ORACLES.update({
    "order_priority_counts": SQL_ORDER_PRIORITY_COUNTS,
    "customer_churn": SQL_CUSTOMER_CHURN,
    "customer_retained": SQL_CUSTOMER_RETAINED,
    "latency_percentiles_approx": SQL_LATENCY_PERCENTILES_APPROX,
})


def q_dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph: every document
    labeled with the minimum doc_id reachable through minhash pairs
    (singletons label themselves). Closes the chain-shaped gap of the
    keep-lowest-id policy. Oracle: DuckDB recursive CTE computing min
    reachable id over the EXACT char-5-shingle Jaccard pair set (which
    equals the LSH pair set on this corpus — see q_minhash_pairs)."""
    from .operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    comps = dedup.connected_components(pairs)
    return docs.select("doc_id").join(comps, on="doc_id", how="left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )


SQL_DEDUP_CC = f"""
WITH RECURSIVE pairs AS ({SQL_MINHASH_PAIRS}),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(id, r) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
"""


QUERIES.update({"dedup_cc": q_dedup_cc})
ORACLES.update({"dedup_cc": SQL_DEDUP_CC})


def q_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (fake=False): each document's ASCII text is
    wrapped into a valid binary-PPM (P6) payload — header with
    doc_id-derived dimensions, pixel bytes = the text rpad-repeated to
    width*height*3 — and decoded by the pure-numpy PPM parser
    (operators/multimodal._decode_ppm). The oracle re-derives width,
    height, and all 8 histogram features from the same byte arithmetic
    in SQL. Features come back as 8 scalar columns (not an array) so the
    cross-engine value hash is type-stable; float32 -> double -> round(6)
    is bit-identical in both engines (same IEEE ops)."""
    from .operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.encode(
            F.concat(
                F.format_string(
                    "P6\n%d %d\n255\n",
                    (F.col("doc_id") % 5 + 4).cast("int"),
                    (F.col("doc_id") % 4 + 3).cast("int"),
                ),
                F.expr(
                    "rpad(text, cast((doc_id % 5 + 4) * (doc_id % 4 + 3) * 3 as int), text)"
                ),
            ),
            "utf-8",
        ).alias("payload"),
    )
    feats = multimodal.decode_image(media, fake=False)
    return feats.select(
        "doc_id",
        "width",
        "height",
        *[
            F.round(F.col("features")[k].cast("double"), 6).alias(f"f{k}")
            for k in range(8)
        ],
    )


_DECODE_BUCKETS = ",\n         ".join(
    f"sum(CASE WHEN b = {k} THEN 1 ELSE 0 END) AS c{k}" for k in range(8)
)
_DECODE_FEATS = ",\n       ".join(
    f"round(CAST(CAST(CAST(c{k} AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f{k}" for k in range(8)
)
SQL_DECODE_IMAGE = f"""
WITH px AS (
  SELECT doc_id,
         CAST(doc_id % 5 + 4 AS INT) AS w,
         CAST(doc_id % 4 + 3 AS INT) AS h,
         rpad(text, CAST((doc_id % 5 + 4) * (doc_id % 4 + 3) * 3 AS INT), text) AS pix
  FROM documents
),
u AS (
  SELECT doc_id, w, h, (ascii(substr(pix, CAST(i AS INT), 1)) // 32) AS b
  FROM px, unnest(generate_series(1, length(pix))) AS t(i)
),
c AS (
  SELECT doc_id, w, h, count(*) AS n,
         {_DECODE_BUCKETS}
  FROM u GROUP BY doc_id, w, h
)
SELECT CAST(doc_id AS VARCHAR) AS doc_id, w AS width, h AS height,
       {_DECODE_FEATS}
FROM c
"""

QUERIES.update({"decode_image": q_decode_image})
ORACLES.update({"decode_image": SQL_DECODE_IMAGE})


def q_shipping_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shape fact x fact INNER shuffle join (the companion to
    order_priority_counts' semi-join): lineitem JOIN orders on orderkey
    (MERGE hint — both sides fact-sized at scale), date-filtered on both
    sides (filters push to both scans BEFORE the shuffle), then a
    two-column aggregate and top-10 by revenue. Decimal sums for
    cross-engine exactness; TakeOrderedAndProject for the limit."""
    _utc(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = orders.filter(F.col("o_orderdate") < F.lit("1996-01-01"))
    l = li.filter(F.col("l_shipdate") >= F.lit("1996-01-01"))
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
    return (
        o.join(l.hint("merge"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_SHIPPING_REVENUE = """
SELECT o_orderkey, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderdate < TIMESTAMP '1996-01-01'
  AND l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

QUERIES.update({"shipping_revenue": q_shipping_revenue})
ORACLES.update({"shipping_revenue": SQL_SHIPPING_REVENUE})


# ---------------------------------------------------------------------------
# Round 3: deterministic splits/sampling, TF-IDF, decontamination
# ---------------------------------------------------------------------------

def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: assignment is a pure
    function of (seed, doc_id) via shared-rule md5 buckets — stable
    across runs, retries, cluster sizes, and input order, unlike
    rand()-based randomSplit. The oracle rebuilds every assignment from
    the same md5 hex digits."""
    from .operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.train_val_test_split(docs).select("doc_id", "split")


SQL_TRAIN_VAL_SPLIT = """
WITH b AS (
  SELECT doc_id,
         (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
  FROM documents
)
SELECT doc_id,
       CASE WHEN bucket < 204 THEN 'train'
            WHEN bucket < 230 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source 20% sample (bucket keyed by
    (source, doc_id), so draws are independent across strata but stable
    under retries — the property sampleBy()'s Bernoulli draw lacks)."""
    from .operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.stratified_sample(docs, fraction=0.2).select("doc_id", "source")


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, source
FROM documents
WHERE (strpos('0123456789abcdef', substr(md5('strat42:' || source || '|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
    + (strpos('0123456789abcdef', substr(md5('strat42:' || source || '|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 51
"""


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf, ties broken by
    term so the cut is total-ordered). Scores are rounded BEFORE the
    rank window in both engines, so ordering can never diverge on float
    noise."""
    from .operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_op.top_tfidf_terms(docs, k=3)


SQL_TFIDF_TERMS = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
scored AS (
  SELECT doc_id, term,
         round(tf * (ln((n.n + 1.0) / (df + 1.0)) + 1.0), 6) AS score
  FROM tf JOIN dfq USING (term), n
),
ranked AS (
  SELECT doc_id, term, score,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS INT) AS rank
  FROM scored
)
SELECT doc_id, term, score, rank FROM ranked WHERE rank <= 3
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train docs (all sources but src0)
    sharing any word-5-gram with the held-out eval set (source src0).
    The eval gram set is explicitly broadcast — the 10^12-row corpus
    streams through a map-side semi-join and never shuffles."""
    from .operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "text", F.trim("text")
    )
    train = docs.filter(F.col("source") != "src0")
    eval_df = docs.filter(F.col("source") == "src0")
    return dedup.contaminated_ids(train, eval_df, n=5)


SQL_DECONTAMINATE = r"""
WITH w AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ws FROM documents
),
g AS (
  SELECT DISTINCT doc_id, source, array_to_string(ws[i:i+4], ' ') AS gram
  FROM w, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)
)
SELECT DISTINCT g.doc_id
FROM g JOIN (SELECT DISTINCT gram FROM g WHERE source = 'src0') e USING (gram)
WHERE g.source <> 'src0'
"""


QUERIES.update({
    "train_val_split": q_train_val_split,
    "stratified_sample": q_stratified_sample,
    "tfidf_terms": q_tfidf_terms,
    "decontaminate": q_decontaminate,
})
ORACLES.update({
    "train_val_split": SQL_TRAIN_VAL_SPLIT,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "tfidf_terms": SQL_TFIDF_TERMS,
    "decontaminate": SQL_DECONTAMINATE,
})


def _grok_common_parts() -> tuple[str, list[str]]:
    from .functions.grok import grok_to_regex

    return grok_to_regex(
        r"%{IPORHOST:remote_host} %{USER:ident} %{USER:user} "
        r"\[%{HTTPDATE:ts}\] "
        r'"%{WORD:method} %{NOTSPACE:path} %{NOTSPACE:protocol}" '
        r"%{INT:status} %{NOTSPACE:bytes}"
    )


def q_grok_common(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grok-style extraction (the north_star names "regex/grok"
    explicitly): a grok expression compiled to ONE engine-portable
    anchored regex, evaluated entirely JVM-side as codegen
    regexp_extract columns — the ad-hoc-format companion to the fixed
    Common/Combined single-pass Arrow parser. Malformed lines (2% of
    the corpus) surface as grok_match=false with empty fields; the
    oracle runs the IDENTICAL compiled regex through DuckDB's RE2."""
    from .functions.grok import grok_extract

    lines = _spread(spark, _spark_lines(spark, sf_dir))
    pattern = (
        r"%{IPORHOST:remote_host} %{USER:ident} %{USER:user} "
        r"\[%{HTTPDATE:ts}\] "
        r'"%{WORD:method} %{NOTSPACE:path} %{NOTSPACE:protocol}" '
        r"%{INT:status} %{NOTSPACE:bytes}"
    )
    return grok_extract(lines, pattern, keep=["doc_id"])


def _grok_oracle_sql() -> str:
    regex, fields = _grok_common_parts()
    esc = regex.replace("'", "''")
    cols = ",\n       ".join(
        f"regexp_extract(line, '{esc}', {i + 1}) AS {f}" for i, f in enumerate(fields)
    )
    return f"""
WITH {_oracle_base()}
SELECT doc_id,
       {cols},
       regexp_matches(line, '{esc}') AS grok_match
FROM base
"""


SQL_GROK_COMMON = _grok_oracle_sql()

QUERIES.update({"grok_common": q_grok_common})
ORACLES.update({"grok_common": SQL_GROK_COMMON})


# ---------------------------------------------------------------------------
# Round 3b: as-of join, range join, multi-way join, chunking, hopping windows
# ---------------------------------------------------------------------------

def q_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join: every event picks up the latest order
    of the same user placed at-or-before the event time — the temporal
    enrichment shape Spark has no native operator for. Implemented as
    union + running last(IGNORE NULLS) window (operators/asof.py): ONE
    exchange, no row amplification, vs the naive range-join that
    shuffles |events| x orders-per-user rows (the oracle does exactly
    that, as ground truth). Ties broken by highest orderkey; users with
    no prior order stay NULL (left semantics)."""
    from .operators.asof import asof_join

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey"),
        F.col("o_orderdate"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )
    out = asof_join(
        ev, od,
        left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["last_orderkey", "last_totalprice"],
        tie_col="last_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "last_orderkey",
        "last_totalprice",
    )


SQL_ASOF_LAST_ORDER = """
WITH m AS (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       m.o_orderkey AS last_orderkey, m.o_totalprice AS last_totalprice
FROM events e LEFT JOIN m ON m.event_id = e.event_id AND m.rn = 1
"""


def q_value_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast range join: events bucketed by which [lo, hi) band
    contains `value` (latency-tier shape). The band dim is broadcast, so
    the non-equi join is a map-side BroadcastNestedLoopJoin — no
    shuffle of the fact stream, no cartesian exchange (which is what an
    unhinted non-equi join degenerates to). min/max are raw parquet
    doubles (no arithmetic), bit-exact across engines."""
    from .operators.enrich import range_enrich

    _utc(spark)
    bands = spark.createDataFrame(
        [("micro", 0.0, 10.0), ("small", 10.0, 25.0), ("mid", 25.0, 50.0),
         ("large", 50.0, 100.0), ("huge", 100.0, 1e9)],
        "band string, lo double, hi double",
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        range_enrich(ev, bands, "value")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


SQL_VALUE_BAND_COUNTS = """
WITH bands(band, lo, hi) AS (
  VALUES ('micro', 0.0, 10.0), ('small', 10.0, 25.0), ('mid', 25.0, 50.0),
         ('large', 50.0, 100.0), ('huge', 100.0, 1e9)
)
SELECT band, COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value
FROM events e LEFT JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY band
"""


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shape multi-way join — the mixed-strategy plan a 100 TB
    star query needs: lineitem JOIN orders is the one fact x fact edge
    (MERGE-hinted sort-merge), every dimension edge (customer, and the
    supplier->nation->region chain) is an explicit broadcast hash join,
    including the non-key c_nationkey = s_nationkey condition that makes
    Q5 famous. Date filter pushes to the orders scan, r_name filter
    prunes the dim chain before broadcast. Decimal revenue for
    cross-engine exactness."""
    _utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    dim = supplier.join(
        F.broadcast(
            nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
    return (
        li.hint("merge")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(dim),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_REGIONAL_REVENUE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: each document's whitespace tokens split
    into 64-token blocks with stride 48 (16-token overlap) — the
    fixed-length training-block transform. Pure codegen
    (explode(sequence) + slice, operators/sequences.py::chunk_tokens):
    no shuffle, no Python; amplification equals output size."""
    from .operators import sequences
    from .operators.text import ws_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", ws_tokens("text").alias("tokens")
    )
    out = sequences.chunk_tokens(docs, "tokens", block=64, stride=48)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("chunk").cast("long").alias("n_tok"),
        F.array_join("chunk", " ").alias("chunk_text"),
    )


SQL_CHUNK_TOKENS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS ws
  FROM documents
),
sized AS (SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) > 0)
SELECT doc_id,
       i AS chunk_idx,
       len(ws[i*48+1 : least(i*48+64, n)]) AS n_tok,
       array_to_string(ws[i*48+1 : least(i*48+64, n)], ' ') AS chunk_text
FROM sized,
     UNNEST(generate_series(0, CAST(ceil(greatest(n - 64, 0) / 48.0) AS BIGINT))) AS t(i)
"""


def q_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window counts (1h window, 30min slide — every event in
    exactly two windows): the overlapping-window aggregate, computed
    with F.window so the 2x row replication happens inside the map-side
    partial aggregate and never crosses the shuffle."""
    from .operators import aggregate as agg

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = agg.hopping_counts(ev, "ts", ["event_type"])
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start_str"),
        "event_type",
        "n",
    )


SQL_HOPPING_COUNTS = """
WITH s AS (
  SELECT event_type,
         make_timestamp(((CAST(floor(epoch(ts) / 1800) AS BIGINT) - k) * 1800)
                        * 1000000) AS wstart
  FROM events, (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) AS t(k)
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start_str,
       event_type, COUNT(*) AS n
FROM s
GROUP BY wstart, event_type
"""


def q_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile binning (curriculum-bucket shape): ntile(4) per
    event_type over a deterministic (value, event_id) order, then
    per-bin count and exact value range. This is the exact-sort path —
    one reducer per event_type holds that type's full order, fine for
    bounded type cardinality; the sketch path for unbounded groups is
    latency_percentiles_approx. min/max are raw parquet doubles,
    bit-exact across engines."""
    from pyspark.sql import Window

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


SQL_VALUE_QUARTILES = """
WITH q AS (
  SELECT event_type, value,
         ntile(4) OVER (PARTITION BY event_type
                        ORDER BY value ASC, event_id ASC) AS quartile
  FROM events
)
SELECT event_type, quartile, COUNT(*) AS n,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM q
GROUP BY event_type, quartile
"""


QUERIES.update({
    "asof_last_order": q_asof_last_order,
    "value_band_counts": q_value_band_counts,
    "regional_revenue": q_regional_revenue,
    "chunk_tokens": q_chunk_tokens,
    "hopping_counts": q_hopping_counts,
    "value_quartiles": q_value_quartiles,
})
ORACLES.update({
    "asof_last_order": SQL_ASOF_LAST_ORDER,
    "value_band_counts": SQL_VALUE_BAND_COUNTS,
    "regional_revenue": SQL_REGIONAL_REVENUE,
    "chunk_tokens": SQL_CHUNK_TOKENS,
    "hopping_counts": SQL_HOPPING_COUNTS,
    "value_quartiles": SQL_VALUE_QUARTILES,
})


def q_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): per-method request counts spread into
    one column per status class. The pivot value list is EXPLICIT, which
    matters twice at scale: Spark skips the extra distinct-scan pass it
    otherwise runs to discover the values, and the output schema is
    stable whatever slice of data a partition sees. Built on the full
    tokenize -> parse -> broadcast-enrich pipeline output, so the
    parser feeds it end to end."""
    parsed = _parsed(spark, sf_dir)
    # status dim only: the UA join would survive into the physical plan
    # (Catalyst can't prune an unused left join) and is not consumed here
    enriched = enrich_op.enrich(parsed, enrich_op.dim_status_class(spark))
    classes = ["2xx", "3xx", "4xx", "5xx"]
    return (
        enriched.filter(F.col("error_kind").isNull() & F.col("status_code").isNotNull())
        .groupBy("method")
        .pivot("status_class", classes)
        .agg(F.count(F.lit(1)))
        .select(
            "method",
            *[F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c}") for c in classes],
        )
    )


def _status_pivot_oracle() -> str:
    cases = ",\n       ".join(
        f"COUNT(CASE WHEN CAST(floor(status_code / 100) AS BIGINT) || 'xx' "
        f"= '{c}' THEN 1 END) AS n_{c}"
        for c in ["2xx", "3xx", "4xx", "5xx"]
    )
    return f"""
WITH {_oracle_base()}
SELECT method, {cases}
FROM expected WHERE error_kind IS NULL AND status_code IS NOT NULL
GROUP BY method
"""


def q_rolling_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling time-range window: for every event, the user's event
    count and integer-cents value sum over the PRECEDING hour (range
    frame over epoch seconds, not a row frame — gaps and bursts are
    handled correctly). The sum is over exact integers (cents), so both
    engines agree bit-for-bit regardless of their internal accumulation
    order — a float sum over a sliding frame is evaluation-order-
    sensitive and would flap the hash. The frame orders by WHOLE
    seconds on both sides (Spark unix_timestamp truncates; the oracle
    must floor(epoch(ts)), not CAST, which rounds half-up in DuckDB
    and shifts sub-second rows across the 3600s boundary)."""
    _utc(spark)
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cents = F.floor(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(cents).over(w).alias("cents_1h"),
    )


SQL_ROLLING_USER_ACTIVITY = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


QUERIES.update({
    "status_pivot": q_status_pivot,
    "rolling_user_activity": q_rolling_user_activity,
})
ORACLES.update({
    "status_pivot": _status_pivot_oracle(),
    "rolling_user_activity": SQL_ROLLING_USER_ACTIVITY,
})


def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE multi-grouping — all 2^k grouping sets in ONE Expand-based
    pass (the companion to rollup_counts' hierarchy sets). grouping_id
    disambiguates a genuine NULL key from a subtotal row, which matters
    once the cube keys are nullable (method is NULL on dead-letter rows
    if they weren't filtered — they are, but the id column keeps the
    contract explicit and engine-portable)."""
    parsed = _parsed(spark, sf_dir)
    return (
        parsed.filter(F.col("error_kind").isNull())
        .cube("method", "protocol")
        .agg(F.count(F.lit(1)).alias("n"),
             F.grouping_id().alias("gid"))
    )


SQL_CUBE_COUNTS = f"""
WITH {_oracle_base()}
SELECT method, protocol, COUNT(*) AS n,
       CAST(GROUPING(method, protocol) AS BIGINT) AS gid
FROM expected WHERE error_kind IS NULL
GROUP BY CUBE(method, protocol)
"""


def q_user_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the one join type nothing else exercises:
    per-user event counts x per-customer order counts, keeping users
    with no orders AND customers with no events (both sides pre-
    aggregated, so the join itself is key-unique and the outer NULLs
    are meaningful). Bucketed into a 3-way coverage tally."""
    _utc(spark)
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.col("user_id").alias("uid"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    od = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.col("o_custkey").alias("uid"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    both = ev.join(od, on="uid", how="full_outer")
    side = (
        F.when(F.col("n_events").isNull(), F.lit("orders_only"))
        .when(F.col("n_orders").isNull(), F.lit("events_only"))
        .otherwise(F.lit("both"))
    )
    return both.groupBy(side.alias("side")).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.coalesce("n_events", F.lit(0))).alias("total_events"),
        F.sum(F.coalesce("n_orders", F.lit(0))).alias("total_orders"),
    )


SQL_USER_ORDER_COVERAGE = """
WITH ev AS (
  SELECT user_id AS uid, COUNT(*) AS n_events FROM events GROUP BY user_id
),
od AS (
  SELECT o_custkey AS uid, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
),
j AS (
  SELECT CASE WHEN ev.n_events IS NULL THEN 'orders_only'
              WHEN od.n_orders IS NULL THEN 'events_only'
              ELSE 'both' END AS side,
         ev.n_events, od.n_orders
  FROM ev FULL OUTER JOIN od ON ev.uid = od.uid
)
SELECT side, COUNT(*) AS n_keys,
       CAST(SUM(COALESCE(n_events, 0)) AS BIGINT) AS total_events,
       CAST(SUM(COALESCE(n_orders, 0)) AS BIGINT) AS total_orders
FROM j GROUP BY side
"""


QUERIES.update({
    "cube_counts": q_cube_counts,
    "user_order_coverage": q_user_order_coverage,
})
ORACLES.update({
    "cube_counts": SQL_CUBE_COUNTS,
    "user_order_coverage": SQL_USER_ORDER_COVERAGE,
})


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation capstone — the composition a training-data
    pipeline actually runs, all existing operators chained: quality
    scoring (codegen formula) -> threshold filter -> exact dedup
    (keep-lowest-id semi join) -> deterministic md5 split -> per-split
    stats. Aggregates stay integer (doc counts, word counts, quality in
    basis points: the score is rounded to 4dp, so x10000 is integral)
    so no float accumulation order can flap the hash."""
    from .operators import dedup as dedup_op
    from .operators import sampling
    from .operators import text as text_op

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = text_op.quality_score(docs)
    kept = scored.filter(F.col("quality") >= 0.5)
    # window-based dedup filter: ONE scan of the scored frame — the
    # aggregate + self-semi-join formulation re-executes the regex
    # quality metrics on both join branches
    deduped = dedup_op.exact_dedup_filter(kept)
    split_df = sampling.train_val_test_split(deduped)
    return split_df.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_words").cast("long")).alias("total_words"),
        F.sum(F.round(F.col("quality") * 10000).cast("long")).alias("quality_bp"),
    )


SQL_CURATION_PIPELINE = r"""
WITH w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws FROM documents
),
m AS (
  SELECT doc_id, text,
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS BIGINT) AS n_words,
    CASE WHEN length(text) > 0
         THEN round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text), 4)
         ELSE NULL END AS punct_ratio,
    CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
         THEN round(len(list_intersect(list_transform(string_split_regex(trim(lower(text)), '\s+'), x -> trim(x)),
              ['the','and','of','to','in','is','that','for','with','was'])) * 1.0 / len(ws), 4)
         ELSE NULL END AS stopword_ratio,
    CASE WHEN len(ws) > 0 AND length(trim(text)) > 0
         THEN round((len(ws) - len(list_distinct(ws))) * 1.0 / len(ws), 4)
         ELSE NULL END AS dup_word_ratio
  FROM w
),
q AS (
  SELECT doc_id, text, n_words,
    round(
      least(n_words / 20.0, 1.0) * 0.4
      + (1 - least(coalesce(punct_ratio, 0.0) * 4, 1.0)) * 0.2
      + least(coalesce(stopword_ratio, 0.0) * 5, 1.0) * 0.2
      + (1 - least(coalesce(dup_word_ratio, 0.0) * 2, 1.0)) * 0.2,
    4) AS quality
  FROM m
),
kept AS (SELECT * FROM q WHERE quality >= 0.5),
keep AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text),
dd AS (SELECT kept.* FROM kept JOIN keep USING (doc_id)),
sp AS (
  SELECT *,
         CASE WHEN (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 204
              THEN 'train'
              WHEN (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 230
              THEN 'val'
              ELSE 'test' END AS split
  FROM dd
)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(CAST(round(quality * 10000) AS BIGINT)) AS BIGINT) AS quality_bp
FROM sp GROUP BY split
"""


QUERIES.update({"curation_pipeline": q_curation_pipeline})
ORACLES.update({"curation_pipeline": SQL_CURATION_PIPELINE})


_GROK_APP_PATTERN = (
    r"%{TIMESTAMP_ISO8601:ts_iso} %{LOGLEVEL:level} "
    r"\[%{WORD:svc}\] %{WORD:verb} %{URIPATH:path} took %{INT:ms}ms"
)


def _app_line_sql(dialect: str) -> str:
    """App-log line derived from events by identical arithmetic in both
    dialects (the grok companion to the NCSA line builder)."""
    f = _frags(dialect)
    iso = (
        "date_format(ts, \"yyyy-MM-dd'T'HH:mm:ss\")"
        if dialect == "spark"
        else "strftime(ts, '%Y-%m-%dT%H:%M:%S')"
    )
    level = ("CASE WHEN event_type = 'error' THEN 'ERROR' "
             "WHEN value < 10 THEN 'DEBUG' ELSE 'INFO' END")
    ms = "CAST(CAST(floor(value * 10) AS BIGINT) AS VARCHAR)" if dialect != "spark" \
        else "CAST(CAST(floor(value * 10) AS BIGINT) AS STRING)"
    return (
        f"{iso} || ' ' || {level} || ' [' || event_type || '] ' || "
        f"{f['method']} || ' ' || {f['uri']} || ' took ' || {ms} || 'ms'"
    )


def q_grok_app_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second grok format — an ISO-8601 app log (level, service, verb,
    URI path, latency) — exercising the round-3 library additions
    (TIMESTAMP_ISO8601, URIPATH) over a non-NCSA line shape. Same
    engine-portable contract: the oracle replays the IDENTICAL compiled
    regex through DuckDB RE2."""
    from .functions.grok import grok_extract

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lines = _spread(spark, ev.selectExpr(
        "'ev-' || CAST(event_id AS STRING) AS doc_id",
        f"{_app_line_sql('spark')} AS line",
    ))
    return grok_extract(lines, _GROK_APP_PATTERN, keep=["doc_id"])


def _grok_app_oracle_sql() -> str:
    from .functions.grok import grok_to_regex

    regex, fields = grok_to_regex(_GROK_APP_PATTERN)
    esc = regex.replace("'", "''")
    cols = ",\n       ".join(
        f"regexp_extract(line, '{esc}', {i + 1}) AS {f}" for i, f in enumerate(fields)
    )
    return f"""
WITH base AS (
  SELECT 'ev-' || CAST(event_id AS VARCHAR) AS doc_id,
         {_app_line_sql('duck')} AS line
  FROM events
)
SELECT doc_id,
       {cols},
       regexp_matches(line, '{esc}') AS grok_match
FROM base
"""


QUERIES.update({"grok_app_log": q_grok_app_log})
ORACLES.update({"grok_app_log": _grok_app_oracle_sql()})


def q_multiline_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiline log assembly (Logstash multiline-codec semantics):
    continuation lines (leading whitespace — stack-trace frames) fold
    into their preceding anchor line, scoped per source stream. Pure
    JVM: running last(IGNORE NULLS) window for ownership + ordered
    array re-aggregation; the oracle re-derives the same blocks with
    IGNORE NULLS last_value + ordered string_agg in DuckDB."""
    from .operators.multiline import assemble_multiline

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lines = ev.selectExpr(
        "event_type AS source",
        "event_id",
        "CASE WHEN CAST(event_id % 5 AS INT) IN (3, 4) "
        "     THEN '    at frame-' || CAST(event_id AS STRING) "
        "     ELSE 'ERROR event ' || CAST(event_id AS STRING) || ' failed' END AS line",
    )
    return assemble_multiline(lines, group_col="source", id_col="event_id")


SQL_MULTILINE_ASSEMBLE = r"""
WITH lines AS (
  SELECT event_type AS source, event_id,
         CASE WHEN CAST(event_id % 5 AS INT) IN (3, 4)
              THEN '    at frame-' || CAST(event_id AS VARCHAR)
              ELSE 'ERROR event ' || CAST(event_id AS VARCHAR) || ' failed' END AS line
  FROM events
),
owned AS (
  SELECT *,
         last_value(CASE WHEN NOT regexp_matches(line, '^\s') THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY source ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS anchor_id
  FROM lines
)
SELECT source, anchor_id, COUNT(*) AS n_lines,
       string_agg(line, chr(10) ORDER BY event_id) AS assembled
FROM owned GROUP BY source, anchor_id
"""


QUERIES.update({"multiline_assemble": q_multiline_assemble})
ORACLES.update({"multiline_assemble": SQL_MULTILINE_ASSEMBLE})


def q_asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each event picks up the EARLIEST order of
    the same user placed at-or-after the event time ("next purchase
    after the session") — the time-reversed twin of asof_last_order,
    same single-exchange union+window plan with the sort flipped.
    Ties (same user, same order date) break to the highest orderkey,
    matching the backward query's convention."""
    from .operators.asof import asof_join

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey"),
        F.col("o_orderdate"),
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_totalprice").alias("next_totalprice"),
    )
    out = asof_join(
        ev, od,
        left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["next_orderkey", "next_totalprice"],
        tie_col="next_orderkey",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "next_orderkey",
        "next_totalprice",
    )


SQL_ASOF_NEXT_ORDER = """
WITH m AS (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate ASC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       m.o_orderkey AS next_orderkey, m.o_totalprice AS next_totalprice
FROM events e LEFT JOIN m ON m.event_id = e.event_id AND m.rn = 1
"""


QUERIES.update({"asof_next_order": q_asof_next_order})
ORACLES.update({"asof_next_order": SQL_ASOF_NEXT_ORDER})


def q_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: each document's ASCII text becomes the PCM
    data of a valid 8-bit mono RIFF/WAVE payload (all header bytes are
    <128, so the chr()-built header survives UTF-8 encode byte-exact)
    and is chunk-walked by the pure-numpy WAV parser
    (operators/multimodal._decode_wav). The oracle re-derives sample
    counts and all 8 PCM-byte histogram features from the same rpad
    arithmetic in SQL — it never needs to build the binary, only to
    predict the decoder's output."""
    from .operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    L = "CAST(doc_id % 50 + 20 AS INT)"
    nul = "chr(0)"
    header = (
        f"'RIFF' || chr(36 + {L}) || {nul} || {nul} || {nul} || 'WAVEfmt ' || "
        f"chr(16) || {nul} || {nul} || {nul} || "          # fmt size 16
        f"chr(1) || {nul} || chr(1) || {nul} || "          # PCM, mono
        f"chr(64) || chr(31) || {nul} || {nul} || "        # rate 8000
        f"chr(64) || chr(31) || {nul} || {nul} || "        # byte rate 8000
        f"chr(1) || {nul} || chr(8) || {nul} || "          # align 1, 8-bit
        f"'data' || chr({L}) || {nul} || {nul} || {nul}"
    )
    media = docs.selectExpr(
        "CAST(doc_id AS STRING) AS doc_id",
        f"encode({header} || rpad(text, {L}, text), 'utf-8') AS payload",
    )
    feats = multimodal.decode_audio(media)
    return feats.select(
        "doc_id",
        "sample_rate",
        "n_channels",
        "n_samples",
        *[
            F.round(F.col("features")[k].cast("double"), 6).alias(f"f{k}")
            for k in range(8)
        ],
    )


SQL_DECODE_AUDIO = f"""
WITH px AS (
  SELECT doc_id,
         CAST(doc_id % 50 + 20 AS INT) AS L,
         rpad(text, CAST(doc_id % 50 + 20 AS INT), text) AS pcm
  FROM documents
),
u AS (
  SELECT doc_id, L, (ascii(substr(pcm, CAST(i AS INT), 1)) // 32) AS b
  FROM px, unnest(generate_series(1, length(pcm))) AS t(i)
),
c AS (
  SELECT doc_id, L, count(*) AS n,
         {_DECODE_BUCKETS}
  FROM u GROUP BY doc_id, L
)
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       8000 AS sample_rate, 1 AS n_channels, CAST(L AS BIGINT) AS n_samples,
       {_DECODE_FEATS}
FROM c
"""

QUERIES.update({"decode_audio": q_decode_audio})
ORACLES.update({"decode_audio": SQL_DECODE_AUDIO})
