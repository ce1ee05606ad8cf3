"""URL analysis helpers over parsed log fields — pure codegen Column
functions (Spark's built-in parse_url / split; no UDF, no shuffle)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def referer_domain(url: Column) -> Column:
    """Host component of an absolute URL (scheme required), NULL for
    NULL/relative/'-' inputs — Spark's built-in parse_url, which runs
    inside codegen."""
    return F.parse_url(url, F.lit("HOST"))


def path_segments(uri: Column) -> Column:
    """array<string> of non-empty path segments of a request URI
    ('/api/v1/item/42' -> ['api','v1','item','42'])."""
    return F.filter(
        F.split(F.coalesce(uri, F.lit("")), "/"), lambda s: s != F.lit("")
    )


def path_segment(uri: Column, idx: int) -> Column:
    """1-based path segment, NULL past the end (F.get is 0-based and
    NULL-safe — element_at throws under ANSI mode)."""
    return F.get(path_segments(uri), idx - 1)
