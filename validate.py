#!/usr/bin/env python
"""Scale-sweep validator: run EVERY __spark_entry__.queries() entry on
Spark and compare against its oracle_sql() in DuckDB at an arbitrary
scale factor (default sf0.1 — 10x the driver's contract scale).

This is the artifact the round-4 verdict asked for (#5): the driver's
CORRECTNESS check runs at sf0.01, where small corpora can hide
similarity-estimate bugs (the r4 MinHash mod-2^64 wrap was green at
sf0.01 and wrong at sf0.1). Running this per round and committing the
JSON makes the "validated at sf0.1" claim a scripted artifact instead
of a self-report.

Usage:
  python validate.py [--sf-dir /root/testdata/sf0.1] [--out VALIDATE.json]
                     [--only name1,name2]

Output rows use the driver's CORRECTNESS format:
  {"<query>": {"rows_match": bool, "schema_match": bool,
               "hash_match": bool, "spark_rows": int, "oracle_rows": int,
               "err": null | str}}
Queries without an oracle record err="no_oracle" exactly like the
driver (counted separately in the summary, never as a hash-green), and
a 0-row hash match is a FAILURE (a vacuous oracle verifies nothing).
Exit code 0 iff no query failed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-sorted, order-insensitive, type-class-normalized frame —
    mirrors tests/test_entry_contract.py (the driver's protocol)."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c], utc=True).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif df[c].dtype == object or str(df[c].dtype) == "string":
            try:
                df[c] = pd.to_numeric(df[c]).astype(float).round(6)
            except (ValueError, TypeError):
                df[c] = df[c].astype("string")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    return hashlib.sha256(
        normalize(df).to_csv(index=False).encode("utf-8")
    ).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from redeye_spark.session import get_spark

    spark = get_spark(
        "validate",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    # Bound the oracle engine: without a limit DuckDB grows unchecked on
    # the window-heavy unrolled oracles (the sf1 BPE replay reached
    # >100 GB and drew the kernel OOM killer on the whole process).
    # A cap + temp_directory makes it SPILL instead of dying, and keeps
    # the Spark JVM's share of the box safe.
    con.sql("SET memory_limit='48GB'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(queries)
    if args.only:
        want = {s.strip() for s in args.only.split(",") if s.strip()}
        unknown = want - set(names)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
            return 2
        names = [n for n in names if n in want]

    def _green(r: dict) -> bool:
        return bool(
            r["rows_match"] and r["schema_match"] and r["hash_match"]
            and not r["err"]
        )

    results: dict[str, dict] = {}
    t_start = time.time()
    for name in names:
        row = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        t0 = time.time()
        try:
            got = queries[name](spark, args.sf_dir).toPandas()
            row["spark_rows"] = int(len(got))
            sql = oracles.get(name)
            if sql is None:
                # Mirror the driver's semantics exactly: an oracle-less
                # query is a recorded WEAKNESS (err: "no_oracle"), never
                # a silent green — the r5 verdict flagged the old
                # hash_match=true-on-rows-only path as flattery.
                row["rows_match"] = None
                row["schema_match"] = None
                row["hash_match"] = None
                row["oracle_rows"] = None
                row["err"] = "no_oracle"
            else:
                exp = con.sql(sql).df()
                row["oracle_rows"] = int(len(exp))
                row["rows_match"] = len(got) == len(exp)
                row["schema_match"] = sorted(got.columns) == sorted(exp.columns)
                if row["rows_match"] and row["schema_match"]:
                    row["hash_match"] = value_hash(got) == value_hash(exp)
                    if len(got) == 0:
                        # A 0-row hash trivially matches — the oracle
                        # verified nothing (ADVICE r5: important_parts/
                        # dominant_suppliers passed vacuously). Fail the
                        # sweep so non-discriminating oracles surface.
                        row["err"] = "empty_result: oracle does not discriminate"
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            row["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = row
        ok = _green(row)
        weak = row["err"] == "no_oracle"
        tag = "PASS" if ok else ("WEAK" if weak else "FAIL")
        print(f"{tag} {name} ({time.time() - t0:.1f}s)"
              + ("" if ok or weak else f" -> {json.dumps(row)}"), flush=True)

    n_ok = sum(1 for r in results.values() if _green(r))
    n_weak = sum(1 for r in results.values() if r["err"] == "no_oracle")
    n_fail = len(results) - n_ok - n_weak
    print(f"\n{n_ok} hash-verified + {n_weak} rows-only (no_oracle) + "
          f"{n_fail} failed, of {len(results)} at {args.sf_dir} "
          f"in {time.time() - t_start:.0f}s")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
