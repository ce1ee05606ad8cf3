"""Vectorized NCSA Common/Combined log-line parsing with redeye semantics.

Pure pandas/numpy — no Spark imports — so the semantic core is unit-testable
in microseconds and is exactly what the Arrow-batched mapInPandas operator
executes per batch.

Reference semantics (all cites into /root/reference/src/redeye/):
  * regexes: parser.rs:122-134 (Common), parser.rs:257-271 (Combined) —
    transliterated exactly ([^\\s] == \\S, single \\s inside the quoted
    request, \\s+ between fields, anchored ^...$).
  * trim before parse: parser.rs:149,286.
  * "-" => field omitted (NULL here), never null-in-JSON: parser.rs:522-528.
  * int fields are u64: non-numeric or negative values reject the WHOLE
    line with ParseError: parser.rs:504-519.
  * timestamp format "%d/%b/%Y:%T %z" (parser.rs:27) parsed preserving the
    original UTC offset; re-emitted RFC-3339 (types.rs:130). A bad
    timestamp rejects the line with TimestampParseError (types.rs:35,
    chrono From impl types.rs:99-103).
  * field order inside the builder chain gives error precedence:
    timestamp (capture 4) is parsed before the int fields (captures 9,10)
    — parser.rs:154-166 — so a line with both a bad timestamp and a bad
    int reports TimestampParseError.
  * no-match => ParseError: parser.rs:328-334.
  * fixed fields "@version"="1" and message=trimmed line: parser.rs:27-28,
    164-165.
  * Combined referer / user-agent captures are ([^"]+): a literal "-"
    matches then is dropped as empty, but "" fails the whole line
    (parser.rs:269-270).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# Error kinds (types.rs:33-38). IoError cannot occur in this layer;
# SerializationError cannot occur with a fixed schema.
ERR_PARSE = "ParseError"
ERR_TIMESTAMP = "TimestampParseError"

FORMAT_COMMON = "common"
FORMAT_COMBINED = "combined"

# parser.rs:122-134 — groups: 1 host, 2 ident, 3 user, 4 ts, 5 full request,
# 6 method, 7 uri, 8 protocol, 9 status, 10 bytes.
PATTERN_COMMON = re.compile(
    r"^(\S+)\s+"
    r"(\S+)\s+"
    r"(\S+)\s+"
    r"\[(.+)\]\s+"
    r"\"((\S+)\s(\S+)\s(\S+))\"\s+"
    r"(\S+)\s+"
    r"(\S+)$"
)

# parser.rs:257-271 — same 10 groups + 11 referer, 12 user-agent.
PATTERN_COMBINED = re.compile(
    r"^(\S+)\s+"
    r"(\S+)\s+"
    r"(\S+)\s+"
    r"\[(.+)\]\s+"
    r"\"((\S+)\s(\S+)\s(\S+))\"\s+"
    r"(\S+)\s+"
    r"(\S+)\s+"
    r"\"([^\"]+)\"\s+"
    r"\"([^\"]+)\"$"
)

_GROUPS_COMMON = [
    "remote_host",
    "ident",
    "remote_user",
    "_ts_raw",
    "requested_url",
    "method",
    "requested_uri",
    "protocol",
    "_status_raw",
    "_length_raw",
]
_GROUPS_COMBINED = _GROUPS_COMMON + ["referer", "user_agent"]

TS_FORMAT = "%d/%b/%Y:%H:%M:%S %z"  # parser.rs:27 (%T == %H:%M:%S)
OUTPUT_VERSION = "1"  # parser.rs:28

# u64::MAX == 18446744073709551615. Rust's u64 FromStr accepts an optional
# leading '+' and any number of digits within range (parser.rs:512-514).
_U64_RE = r"\+?[0-9]{1,20}"
_I64_MAX = 2**63 - 1

_OFFSET_RE = r"(?:([+-])(\d{2}):?(\d{2})|([Zz]))\s*$"


def _dash_null(s: pd.Series) -> pd.Series:
    """'-' => missing (parser.rs:522-528). Distinct from a failed capture."""
    return s.where(s != "-")


def _parse_u64(raw: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Return (Int64 values, bool error mask) with Rust u64-parse semantics.

    raw is already dash-nulled. Values that parse as u64 but exceed i64::MAX
    are flagged as errors (documented deviation: Spark LongType is i64; real
    content lengths never approach 2^63).
    """
    valid = raw.str.fullmatch(_U64_RE).fillna(False).astype(bool)
    vals = pd.to_numeric(raw.where(valid), errors="coerce")
    # 19-20 digit strings can overflow/lose precision through float;
    # re-check exactly with Python ints only for those rare rows.
    long_mask = valid & (raw.str.lstrip("+").str.len() > 18).fillna(False)
    if long_mask.any():
        exact = raw[long_mask].map(int)  # tiny row count; cold path
        ok = exact <= _I64_MAX
        vals = vals.astype("object")
        vals[long_mask] = exact.where(ok)
        valid = valid & ~(long_mask & ~ok.reindex(valid.index, fill_value=False))
    err = raw.notna() & ~valid
    return pd.to_numeric(vals.where(valid), errors="coerce").astype("Int64"), err


def _parse_timestamp(raw: pd.Series) -> tuple[pd.Series, pd.Series, pd.Series]:
    """Return (utc_instant, rfc3339_str_with_original_offset, error mask).

    raw is already dash-nulled. Strict strptime per TS_FORMAT; the RFC-3339
    string is rebuilt with pure string/vector ops so the original per-row
    offset survives (chrono DateTime<FixedOffset>::to_rfc3339, types.rs:130)
    without any per-row Python datetime objects.
    """
    utc = pd.to_datetime(raw, format=TS_FORMAT, errors="coerce", utc=True)
    off = raw.str.extract(_OFFSET_RE)
    z = off[3].notna()
    sign = off[0].where(~z, "+")
    hh = off[1].where(~z, "00")
    mm = off[2].where(~z, "00")
    have_off = sign.notna() & hh.notna() & mm.notna()
    err = raw.notna() & (utc.isna() | ~have_off)

    neg = (sign == "-").fillna(False).astype(bool).to_numpy()
    off_min = (pd.to_numeric(hh, errors="coerce") * 60 + pd.to_numeric(mm, errors="coerce")) * np.where(
        neg, -1, 1
    )
    local_wall = utc + pd.to_timedelta(off_min, unit="m")
    ts_str = (
        local_wall.dt.strftime("%Y-%m-%dT%H:%M:%S").astype("string")
        + sign.astype("string")
        + hh.astype("string")
        + ":"
        + mm.astype("string")
    )
    ts_str = ts_str.where(~err & raw.notna())
    utc = utc.where(~err)
    return utc, ts_str, err


def parse_lines(lines: pd.Series, fmt: str = FORMAT_COMMON) -> pd.DataFrame:
    """Parse a batch of raw log lines into the redeye superset schema.

    Returns a DataFrame with columns: remote_host ident remote_user
    timestamp timestamp_str requested_url method requested_uri protocol
    status_code content_length referer user_agent version message
    error_kind. On error rows every parsed field is NULL (redeye discards
    the line, src/bin/redeye.rs:56-65,82-89); message keeps the trimmed
    line for the dead-letter route and error_kind carries the taxonomy.
    """
    if fmt == FORMAT_COMBINED:
        pat, groups = PATTERN_COMBINED, _GROUPS_COMBINED
    elif fmt == FORMAT_COMMON:
        pat, groups = PATTERN_COMMON, _GROUPS_COMMON
    else:  # parser dispatch mirrors the CLI flag check, src/bin/redeye.rs:70-77
        raise ValueError(f"unknown log format: {fmt!r}")

    lines = lines.astype("string").reset_index(drop=True)
    trimmed = lines.str.strip()  # parser.rs:149,286
    ext = trimmed.str.extract(pat)
    ext.columns = groups

    # Group 1 is \S+ (never empty), so a NaN there means the regex did not
    # match (parser.rs:328-334).
    nomatch = ext["remote_host"].isna() & trimmed.notna()

    for c in groups:
        ext[c] = _dash_null(ext[c])

    ts_utc, ts_str, ts_err = _parse_timestamp(ext["_ts_raw"])
    status, status_err = _parse_u64(ext["_status_raw"])
    length, length_err = _parse_u64(ext["_length_raw"])

    # Precedence: regex no-match > timestamp (capture 4 parsed first,
    # parser.rs:157) > int fields (captures 9-10, parser.rs:162-163).
    error_kind = pd.Series(pd.NA, index=trimmed.index, dtype="string")
    error_kind[(status_err | length_err) & ~nomatch] = ERR_PARSE
    error_kind[ts_err & ~nomatch] = ERR_TIMESTAMP
    error_kind[nomatch] = ERR_PARSE
    ok = error_kind.isna()

    if fmt == FORMAT_COMBINED:
        referer = ext["referer"]
        user_agent = ext["user_agent"]
    else:
        referer = pd.Series(pd.NA, index=trimmed.index, dtype="string")
        user_agent = pd.Series(pd.NA, index=trimmed.index, dtype="string")

    out = pd.DataFrame(
        {
            "remote_host": ext["remote_host"].where(ok),
            "ident": ext["ident"].where(ok),
            "remote_user": ext["remote_user"].where(ok),
            "timestamp": ts_utc.where(ok),
            "timestamp_str": ts_str.where(ok),
            "requested_url": ext["requested_url"].where(ok),
            "method": ext["method"].where(ok),
            "requested_uri": ext["requested_uri"].where(ok),
            "protocol": ext["protocol"].where(ok),
            "status_code": status.where(ok),
            "content_length": length.where(ok),
            "referer": referer.where(ok),
            "user_agent": user_agent.where(ok),
            "version": pd.Series(OUTPUT_VERSION, index=trimmed.index, dtype="string").where(ok),
            "message": trimmed,  # parser.rs:165,306 — the TRIMMED line
            "error_kind": error_kind,
        }
    )
    return out


def event_to_json_dict(row: pd.Series) -> dict:
    """One parsed row -> the redeye JSON object (test helper, per-row OK).

    Reproduces key naming ("@timestamp", "@version", nested
    request_headers with literal key "user-agent" — parser.rs:301-304) and
    key-omission of NULLs / all-empty mappings (parser.rs:447-452).
    """
    if not pd.isna(row.get("error_kind")):
        raise ValueError(f"row is an error row: {row['error_kind']}")
    out: dict = {}
    plain = [
        ("remote_host", "remote_host"),
        ("ident", "ident"),
        ("remote_user", "remote_user"),
        ("timestamp_str", "@timestamp"),
        ("requested_url", "requested_url"),
        ("method", "method"),
        ("requested_uri", "requested_uri"),
        ("protocol", "protocol"),
    ]
    for col, key in plain:
        v = row.get(col)
        if not pd.isna(v):
            out[key] = v
    for col, key in [("status_code", "status_code"), ("content_length", "content_length")]:
        v = row.get(col)
        if not pd.isna(v):
            out[key] = int(v)
    headers = {}
    if not pd.isna(row.get("referer")):
        headers["referer"] = row["referer"]
    if not pd.isna(row.get("user_agent")):
        headers["user-agent"] = row["user_agent"]
    if headers:  # all-empty mapping omitted entirely, parser.rs:447-452
        out["request_headers"] = headers
    out["@version"] = row["version"]
    out["message"] = row["message"]
    return out
