"""Deterministic synthetic access-log corpus generator (U1 analog).

The reference's fixture generator is a Python HTTP server emitting Common
format lines (util/server.py:20-25); ours is a seeded, fully vectorized
numpy generator that emits either format, tokenizes the lines into the
(doc_id, tokens, n_tok, source) input shape (BASELINE.json input_hint),
injects a configurable malformed rate, and skews one hot source to ~60%
of rows (FIXTURES §1.1).

All line assembly is numpy/pandas string ops — generation throughput must
not be the bottleneck of the benchmarks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.logparse import FORMAT_COMBINED, FORMAT_COMMON
from ..functions import tokens as tok

METHODS = np.array(["GET", "GET", "GET", "GET", "GET", "GET", "GET", "POST", "POST", "PUT", "DELETE"])
STATUSES = np.array([200, 200, 200, 200, 200, 200, 304, 301, 404, 403, 500, 503])
PROTOCOLS = np.array(["HTTP/1.0", "HTTP/1.1", "HTTP/1.1", "HTTP/2.0"])
URIS = np.array(
    ["/", "/index.html", "/api/v1/items", "/api/v1/users", "/static/app.js", "/static/site.css",
     "/images/logo.png", "/health", "/login", "/search"]
)
USER_AGENTS = np.array(
    [
        "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36",
        "Mozilla/4.08 [en] (Win98; I ;Nav)",
        "curl/8.4.0",
        "Wget/1.21",
        "python-requests/2.31.0",
        "Googlebot/2.1 (+http://www.google.com/bot.html)",
        "bingbot/2.0",
        "Opera/9.80 (Windows NT 6.0) Presto/2.12.388",
        "-",
    ]
)
REFERERS = np.array(
    ["http://www.example.com/start.html", "https://search.example.org/?q=x", "-", "-", "https://news.site/item/1"]
)
# Mixed UTC offsets so offset preservation is exercised end to end.
TZ_OFFSETS = np.array(["-0700", "-0400", "+0000", "+0200", "+0530"])
USERS = np.array(["-", "-", "-", "frank", "alice", "bob"])

SOURCES_COLD = ["web-01", "web-02", "api-01", "cdn-edge", "batch-replay"]
HOT_SOURCE = "web-hot"  # ~60% of all rows

MALFORMED_KINDS = np.array(["garbage", "badts", "badint", "truncated", "emptyq"])


def _gen_lines(
    n: int,
    fmt: str = FORMAT_COMBINED,
    seed: int = 42,
    malformed_rate: float = 0.02,
    hot_share: float = 0.6,
    start_ts: str = "2024-03-01T00:00:00",
    span_hours: int = 12,
    id_offset: int = 0,
) -> pd.DataFrame:
    """Generate n rows of (doc_id, source, line) as pandas, vectorized."""
    rng = np.random.default_rng(seed)

    host = (
        pd.Series(rng.integers(1, 255, n).astype(str)).radd("10.")
        + "." + pd.Series(rng.integers(0, 255, n).astype(str))
        + "." + pd.Series(rng.integers(1, 255, n).astype(str))
    )
    user = pd.Series(rng.choice(USERS, n))
    method = pd.Series(rng.choice(METHODS, n))
    uri = pd.Series(rng.choice(URIS, n))
    proto = pd.Series(rng.choice(PROTOCOLS, n))
    status = pd.Series(rng.choice(STATUSES, n).astype(str))
    length = pd.Series(rng.integers(0, 100_000, n).astype(str))
    length[rng.random(n) < 0.05] = "-"  # absent content_length
    status[rng.random(n) < 0.01] = "-"  # absent status

    # Timestamps: seconds offsets over the span, formatted in a per-row tz.
    base = pd.Timestamp(start_ts, tz="UTC")
    secs = rng.integers(0, span_hours * 3600, n)
    utc = base + pd.to_timedelta(secs, unit="s")
    off = rng.choice(TZ_OFFSETS, n)
    off_min = np.where(np.char.startswith(off.astype(str), "-"), -1, 1) * (
        pd.Series(off).str.slice(1, 3).astype(int) * 60 + pd.Series(off).str.slice(3, 5).astype(int)
    )
    local = pd.Series(utc) + pd.to_timedelta(off_min, unit="m")
    ts = local.dt.strftime("%d/%b/%Y:%H:%M:%S") + " " + pd.Series(off)

    line = (
        host + " - " + user + " [" + ts + "] \"" + method + " " + uri + " " + proto + "\" "
        + status + " " + length
    )
    if fmt == FORMAT_COMBINED:
        referer = pd.Series(rng.choice(REFERERS, n))
        ua = pd.Series(rng.choice(USER_AGENTS, n))
        line = line + " \"" + referer + "\" \"" + ua + "\""
    elif fmt != FORMAT_COMMON:
        raise ValueError(f"unknown format {fmt!r}")

    # Malformed injection (FIXTURES §2.5 categories).
    bad = rng.random(n) < malformed_rate
    kinds = rng.choice(MALFORMED_KINDS, n)
    line = line.where(~(bad & (kinds == "garbage")), "this is not an access log line")
    # Non-greedy: the timestamp is the FIRST bracketed group. Greedy .* in
    # combined lines containing 'Mozilla/4.08 [en] ...' spanned to the UA's
    # ']' and mangled ~11% of badts rows into plain ParseErrors.
    line = line.where(~(bad & (kinds == "badts")), line.str.replace(r"\[.*?\]", "[not-a-time]", n=1, regex=True))
    line = line.where(~(bad & (kinds == "badint")), line.str.replace(r"\" (\d+|-) ", '" NaN ', n=1, regex=True))
    line = line.where(~(bad & (kinds == "truncated")), line.str.slice(0, 30))
    if fmt == FORMAT_COMBINED:
        line = line.where(~(bad & (kinds == "emptyq")), line.str.replace(r'"[^"]*"$', '""', regex=True))

    # Source skew: hot source gets hot_share of rows.
    hot = rng.random(n) < hot_share
    source = pd.Series(np.where(hot, HOT_SOURCE, rng.choice(np.array(SOURCES_COLD), n)))

    doc_id = pd.Series(
        np.char.add("doc-", (np.arange(id_offset, id_offset + n) * 2654435761 % 10**12).astype("U12"))
    )
    return pd.DataFrame({"doc_id": doc_id, "source": source, "line": line})


def gen_frame(n: int, fmt: str = FORMAT_COMBINED, seed: int = 42, **kw) -> pd.DataFrame:
    """(doc_id, tokens, n_tok, source, line) with python-list tokens —
    test helper shape accepted by spark.createDataFrame."""
    g = _gen_lines(n, fmt=fmt, seed=seed, **kw)
    tokens = tok.tokenize(g["line"])
    g = g.copy()
    g.insert(1, "tokens", tokens.map(lambda a: a.tolist()))
    g.insert(2, "n_tok", tokens.map(len).astype("int32"))
    return g[["doc_id", "tokens", "n_tok", "source", "line"]]


def source_meta_frame(seed: int = 42) -> pd.DataFrame:
    sources = [HOT_SOURCE] + SOURCES_COLD
    regions = ["us-east", "us-west", "eu-central"]
    tiers = ["edge", "core"]
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "source": sources,
            "region": rng.choice(regions, len(sources)),
            "tier": rng.choice(tiers, len(sources)),
        }
    )


def write_input_table(path: str, n: int, fmt: str = FORMAT_COMBINED, seed: int = 42,
                      chunk: int = 250_000, **kw) -> None:
    """Write the tokenized input as parquet directly with pyarrow —
    chunked (bounded memory) and fully vectorized: the token column is
    built from string buffers, never per-row Python lists."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.tokens import tokens_list_array

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    arrow_schema = pa.schema(
        [
            pa.field("doc_id", pa.string(), nullable=False),
            pa.field("tokens", pa.list_(pa.int32()), nullable=False),
            pa.field("n_tok", pa.int32(), nullable=False),
            pa.field("source", pa.string(), nullable=False),
        ]
    )
    for i, start in enumerate(range(0, n, chunk)):
        m = min(chunk, n - start)
        g = _gen_lines(m, fmt=fmt, seed=seed + start, id_offset=start, **kw)
        toks = tokens_list_array(g["line"])
        lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False)).astype(np.int32)
        table = pa.Table.from_arrays(
            [
                pa.array(g["doc_id"], type=pa.string()),
                toks,
                pa.array(lens, type=pa.int32()),
                pa.array(g["source"], type=pa.string()),
            ],
            schema=arrow_schema,
        )
        pq.write_table(table, os.path.join(path, f"part-{i:05d}.parquet"))
