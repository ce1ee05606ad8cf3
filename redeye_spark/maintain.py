"""spark-submit entrypoint for table maintenance (compact / upsert).

The pipeline CLI (job.py) mirrors the reference's parse flags; this is
the operations companion for the tables it writes:

    spark-submit --py-files redeye_spark.zip redeye_spark/maintain.py \
        compact --base /data/out --table events --target-file-mb 128 \
        [--partition-by sink] [--cluster-by timestamp]

    spark-submit ... redeye_spark/maintain.py \
        upsert --base /data/out --table dim --updates /data/changes \
        --keys k1,k2 [--order-col ver] [--partition-by p]

One JSON stats line on stdout (same convention as job.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

if __package__ in (None, ""):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="redeye-maintain", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compact", help="rewrite a table into ~target-size files")
    c.add_argument("--base", required=True, help="table base dir")
    c.add_argument("--table", required=True)
    c.add_argument("--target-file-mb", type=int, default=128)
    c.add_argument("--partition-by", default=None, help="comma-separated")
    c.add_argument("--cluster-by", default=None,
                   help="comma-separated sort-order rewrite columns")
    c.add_argument("--min-files", type=int, default=4)
    c.add_argument("--master", default=None)

    u = sub.add_parser("upsert", help="latest-wins MERGE of an updates table")
    u.add_argument("--base", required=True, help="table base dir")
    u.add_argument("--table", required=True)
    u.add_argument("--updates", required=True, help="parquet path of change rows")
    u.add_argument("--keys", required=True, help="comma-separated key columns")
    u.add_argument("--order-col", default=None,
                   help="version column; greatest wins within the updates")
    u.add_argument("--partition-by", default=None, help="comma-separated")
    u.add_argument("--master", default=None)

    e = sub.add_parser("expire", help="drop whole partitions (retention/TTL)")
    e.add_argument("--base", required=True)
    e.add_argument("--table", required=True)
    e.add_argument("--partition-col", required=True)
    g = e.add_mutually_exclusive_group(required=True)
    g.add_argument("--drop", default=None, help="comma-separated values to drop")
    g.add_argument("--keep", default=None, help="comma-separated values to keep")
    e.add_argument("--master", default=None)

    d = sub.add_parser("delete", help="row-level delete by key (erasure)")
    d.add_argument("--base", required=True)
    d.add_argument("--table", required=True)
    d.add_argument("--keys-table", required=True, help="parquet path of key rows")
    d.add_argument("--keys", required=True, help="comma-separated key columns")
    d.add_argument("--partition-by", default=None, help="comma-separated")
    d.add_argument("--master", default=None)
    return p


def _cols(arg: str | None) -> list[str] | None:
    return [c.strip() for c in arg.split(",")] if arg else None


def main(argv: list[str] | None = None) -> int:
    args = build_arg_parser().parse_args(argv)
    from redeye_spark.session import get_spark
    from redeye_spark.sources.io import ParquetIO
    from redeye_spark.plans import maintenance

    spark = get_spark("redeye-maintain", master=args.master)
    io = ParquetIO(args.base)
    if args.cmd == "expire":
        stats = maintenance.expire_partitions(
            io, args.table, args.partition_col,
            keep_values=_cols(args.keep), drop_values=_cols(args.drop),
        )
    elif args.cmd == "delete":
        stats = maintenance.delete_keys(
            spark, io, args.table,
            spark.read.parquet(args.keys_table),
            key_cols=_cols(args.keys),
            partition_by=_cols(args.partition_by),
        )
    elif args.cmd == "compact":
        stats = maintenance.compact_table(
            spark, io, args.table,
            target_file_bytes=args.target_file_mb << 20,
            partition_by=_cols(args.partition_by),
            cluster_by=_cols(args.cluster_by),
            min_files_to_compact=args.min_files,
        )
    else:
        stats = maintenance.upsert_table(
            spark, io, args.table,
            spark.read.parquet(args.updates),
            key_cols=_cols(args.keys),
            partition_by=_cols(args.partition_by),
            order_col=args.order_col,
        )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
