"""Distributed as-of (point-in-time) join.

For every left row, attach the payload of the single most recent right
row with the same key and `right_ts <= left_ts` (inclusive by default) —
the standard temporal-enrichment join (latest config version at event
time, latest order before a session, last quote at trade time) that
Spark's join operators don't express directly and a naive range join
(`l.key = r.key AND r.ts <= l.ts` + row_number) explodes into
O(left x right-per-key) intermediate rows.

Spark-first implementation — the union + running-window trick:

    union(left tagged side=1, right tagged side=0)
      -> window PARTITION BY key ORDER BY (ts, side, tie)
         last(payload IGNORE NULLS) over rows UNBOUNDED PRECEDING..CURRENT
      -> keep side=1 rows

One exchange total (both sides hash-partitioned by key in the same
shuffle), one within-partition sort, zero row amplification: each right
row is visited once no matter how many left rows it serves. That is the
plan a 100 TB trade/quote-style as-of join needs — the alternative
(range join + dedup) shuffles |left| x avg-matches-per-row rows.

Skew note: a window cannot be salted (each key needs its full ordered
history on one reducer), so a pathologically hot key serializes on one
task; AQE cannot split a window partition. Pass ``bucket=`` to switch
to the time-bucketed plan: the window partitions by (key, coarse time
bucket) and each bucket's closing right payload is carried forward by
a second, tiny window over one row per (key, bucket) — a key with 10^9
events spreads across (time span / bucket) tasks instead of one, at
the cost of two extra (key, bucket) shuffles. Results are identical to
the plain path (pytest-pinned equivalence).

The right payload travels as ONE struct column: per-column
last(IGNORE NULLS) would stitch values from *different* right rows
whenever the matched row holds a legitimate NULL that an older row
filled. The struct is all-or-nothing, preserving row integrity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql import types as T

_K, _TS, _SIDE, _TIE, _PAY = (
    "_asof_key", "_asof_ts", "_asof_side", "_asof_tie", "_asof_payload"
)
_B, _CARRY, _RN = "_asof_bkt", "_asof_carry", "_asof_rn"

_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _bucket_seconds(bucket) -> float:
    """'7 days' / '1 hour' / plain seconds -> float seconds."""
    if isinstance(bucket, (int, float)):
        sec = float(bucket)
    else:
        parts = str(bucket).split()
        if len(parts) == 2 and parts[1].lower() in _UNITS:
            sec = float(parts[0]) * _UNITS[parts[1].lower()]
        elif len(parts) == 1:
            sec = float(parts[0])
        else:
            raise ValueError(
                f"bucket must be seconds or '<n> <unit>' with unit in "
                f"{sorted(set(_UNITS))}, got {bucket!r}"
            )
    if sec <= 0:
        raise ValueError(f"bucket must be positive, got {bucket!r}")
    return sec


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_col: str | None = None,
    strict: bool = False,
    direction: str = "backward",
    bucket: str | int | float | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + `right_cols` from the closest
    matching right row (NULL when no right row qualifies).

    - ``direction="backward"`` (default): the LATEST right row with
      ``right_ts <= left_ts`` — temporal enrichment ("state as of").
      ``direction="forward"``: the EARLIEST right row with
      ``right_ts >= left_ts`` — "next event after" (next deploy after
      an error, next maintenance window). Same single-exchange plan:
      forward just flips the window sort to descending.
    - ``strict=False`` (default): a right row at exactly ``left_ts``
      matches; ``strict=True`` excludes it.
    - Ties (several right rows at the same (key, ts)): the row with the
      greatest ``tie_col`` wins — pass a unique column for determinism;
      with ``tie_col=None`` the winner among exact-ts duplicates is
      partition-order-dependent.
    - ``right_cols`` must be disjoint from left's columns (alias on the
      right side first if they clash).
    - ``bucket`` (e.g. ``"1 day"``, ``"6 hours"``, or seconds): hot-key
      mitigation. The running window partitions by (key, time bucket)
      instead of key alone, and a tiny second window (one row per
      distinct (key, bucket)) carries each bucket's closing payload
      into later buckets. Identical results to the plain path for ANY
      bucket size — bucketing only changes the plan: a single
      pathological key parallelizes across its time buckets instead of
      serializing on one reducer. Costs two extra shuffles; leave None
      unless key skew is real.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right_cols {sorted(overlap)} collide with left columns — "
            "alias them on the right side first"
        )
    left_cols = left.columns
    l_types = {f.name: f.dataType for f in left.schema.fields}
    r_types = {f.name: f.dataType for f in right.schema.fields}
    pay_type = T.StructType(
        [T.StructField(c, r_types[c], True) for c in right_cols]
    )

    def _null(dt) -> Column:
        return F.lit(None).cast(dt)

    # The tie column keeps its native type: casting to double would
    # collapse 64-bit ids above 2^53 (reintroducing the nondeterminism
    # tie_col exists to remove) and NULL out non-numeric tie columns.
    # Left rows carry NULL — ordering among them never matters because
    # _SIDE sorts before _TIE.
    if tie_col is not None:
        if tie_col not in r_types:
            raise ValueError(f"tie_col {tie_col!r} is not a column of right")
        tie_right: Column = F.col(tie_col)
        tie_left: Column = _null(r_types[tie_col])
    else:
        tie_right = F.lit(0)
        tie_left = F.lit(0)
    # Join semantics: a NULL key never matches, and a right row with an
    # unknown effective time cannot serve as anyone's "latest" (NULLS
    # FIRST would otherwise slot it before every timestamp). Left rows
    # with NULL key/ts simply come out payload-NULL.
    right = right.filter(F.col(right_on).isNotNull() & F.col(right_ts).isNotNull())
    lu = left.select(
        F.col(left_on).alias(_K),
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        tie_left.alias(_TIE),
        *[F.col(c) for c in left_cols],
        _null(pay_type).alias(_PAY),
    )
    ru = right.select(
        F.col(right_on).alias(_K),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        tie_right.alias(_TIE),
        *[_null(l_types[c]).alias(c) for c in left_cols],
        F.struct(*[F.col(c) for c in right_cols]).alias(_PAY),
    )
    # Equal-ts ordering decides inclusivity: right-before-left (side 0
    # then 1) lets a same-instant right row be seen by the left row;
    # left-before-right hides it (strict <). Forward direction flips
    # the time sort so "running last" sees the closest LATER right row;
    # NULLS FIRST explicitly — desc defaults to nulls-last, which would
    # let a NULL-ts left row see every right row instead of none.
    side_order = F.col(_SIDE).desc() if strict else F.col(_SIDE).asc()
    ts_order = (
        F.col(_TS).asc()  # asc is NULLS FIRST by default
        if direction == "backward"
        else F.col(_TS).desc_nulls_first()
    )
    if bucket is None:
        w = (
            Window.partitionBy(_K)
            .orderBy(ts_order, side_order, F.col(_TIE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = (
            lu.unionByName(ru)
            .withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
            .filter(F.col(_SIDE) == 1)
        )
    else:
        filled = _bucketed_fill(
            lu, ru, ts_order, side_order, direction, _bucket_seconds(bucket)
        )
    return filled.select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"{_PAY}.{c}").alias(c) for c in right_cols],
    )


def _bucketed_fill(
    lu: DataFrame,
    ru: DataFrame,
    ts_order: Column,
    side_order: Column,
    direction: str,
    sec: float,
) -> DataFrame:
    """Hot-key-safe as-of fill, partitioned by (key, time bucket).

    Correct for ANY monotone bucket assignment: a right row can only
    serve left rows in its own bucket (handled by the within-bucket
    running window, same ordering as the plain path) or in later
    buckets (backward; earlier for forward) — handled by carrying each
    bucket's closing payload forward through a window over one row per
    distinct (key, bucket). Cross-bucket carries never interact with
    `strict`/tie ordering because equal timestamps always share a
    bucket. NULL-key/NULL-ts left rows keep NULL payloads: the carry
    join is a plain equi-join (NULLs match nothing) and right rows were
    already filtered non-NULL.
    """
    backward = direction == "backward"
    # Monotone per-row bucket id. Timestamps/dates go through epoch
    # seconds; float rounding at bucket edges is harmless — the SAME
    # monotone function is applied to both sides, which is all phases
    # A-C need (equal ts => equal bucket; ts order => bucket order).
    ts_type = lu.schema[_TS].dataType
    if isinstance(ts_type, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        ts_num = F.col(_TS).cast("timestamp").cast("double")
    else:
        ts_num = F.col(_TS).cast("double")
    bcol = F.floor(ts_num / F.lit(sec)).cast("long")
    lu = lu.withColumn(_B, bcol)
    ru = ru.withColumn(_B, bcol)

    # Phase A: the right row each bucket hands to its successors — the
    # one a query at the far edge of the bucket would match (latest for
    # backward, earliest for forward; ties resolved exactly like the
    # main window: greatest tie wins at equal ts).
    close_ts = F.col(_TS).desc() if backward else F.col(_TS).asc()
    wA = Window.partitionBy(_K, _B).orderBy(close_ts, F.col(_TIE).desc())
    closing = (
        ru.withColumn(_RN, F.row_number().over(wA))
        .filter(F.col(_RN) == 1)
        .select(_K, _B, F.col(_PAY).alias(_CARRY))
    )

    # Phase B: running carry across buckets, one row per (key, bucket)
    # present on EITHER side (left-only buckets still need a carry-in).
    # This window's partitions are tiny — history span / bucket — so
    # the hot key's serialized portion shrinks from O(rows) to
    # O(buckets).
    bkts = (
        lu.select(_K, _B)
        .unionByName(ru.select(_K, _B))
        .filter(F.col(_K).isNotNull() & F.col(_B).isNotNull())
        .distinct()
    )
    bkt_order = F.col(_B).asc() if backward else F.col(_B).desc()
    wB = (
        Window.partitionBy(_K)
        .orderBy(bkt_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        bkts.join(closing, [_K, _B], "left")
        .withColumn(_CARRY, F.last(_CARRY, ignorenulls=True).over(wB))
        .select(_K, _B, _CARRY)
    )

    # Phase C: plain running-window fill, but partitioned by (key,
    # bucket); rows whose bucket holds no earlier (later, forward)
    # right row fall back to the carried payload.
    w = (
        Window.partitionBy(_K, _B)
        .orderBy(ts_order, side_order, F.col(_TIE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        lu.unionByName(ru)
        .withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
        .filter(F.col(_SIDE) == 1)
        .join(carry, [_K, _B], "left")
        .withColumn(_PAY, F.coalesce(F.col(_PAY), F.col(_CARRY)))
    )
