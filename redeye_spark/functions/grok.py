"""Grok-style pattern extraction, compiled to plain regex and executed
JVM-side (whole-stage codegen `regexp_extract` — no Python anywhere).

Grok is the Logstash pattern language the reference's ecosystem speaks:
`%{NAME:field}` references a library pattern and captures it as a
field; `%{NAME}` matches without capturing. This module compiles a grok
expression to ONE anchored Java/RE2-compatible regex (sub-patterns use
only non-capturing groups, so capture group i+1 == field i) and
projects one column per field plus a `grok_match` flag.

The pattern library sticks to constructs with identical semantics in
Java regex, RE2, and DuckDB (no backreferences, no lookaround), so a
grok extraction is DuckDB-oracle-checkable with the same compiled
regex — the `grok_common` entry does exactly that.

Cost model: k captured fields = k `regexp_extract` calls per row (the
JRE caches the compiled Pattern per task; each call re-runs the match).
That is the right trade for ad-hoc formats — fully codegen, zero
Python exchange. The HOT path (the reference's fixed Common/Combined
formats) stays on the single-pass RE2-vectorized Arrow parser in
functions/logparse.py, which matches each line exactly once.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# Library patterns: engine-portable subset (Java regex == RE2 == DuckDB
# on ASCII input; no capture groups allowed inside).
GROK_PATTERNS: dict[str, str] = {
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "USER": r"[a-zA-Z0-9._-]+",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "HOSTNAME": r"[a-zA-Z0-9._-]+",
    "IPORHOST": r"[a-zA-Z0-9._-]+",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "QUOTEDSTRING": r'"[^"]*"',
    "LOGLEVEL": r"(?:DEBUG|INFO|WARN|ERROR|FATAL|TRACE)",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "SYSLOGTIMESTAMP": r"\w{3} +\d{1,2} \d{2}:\d{2}:\d{2}",
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "URIPATH": r"/[^\s?#]*",
    "EMAILADDRESS": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # Composite patterns (references expand recursively, captures and
    # all — the canonical grok shapes for exactly the log format the
    # reference parses; field names follow the Logstash definitions)
    "COMMONAPACHELOG": (
        r'%{IPORHOST:clientip} %{USER:ident} %{USER:auth} '
        r'\[%{HTTPDATE:timestamp}\] '
        r'"%{WORD:verb} %{NOTSPACE:request} %{NOTSPACE:httpversion}" '
        r'(?:%{INT:response}|-) (?:%{INT:bytes}|-)'
    ),
    "COMBINEDAPACHELOG": r'%{COMMONAPACHELOG} "%{DATA:referrer}" "%{DATA:agent}"',
}

_MAX_EXPANSION_DEPTH = 10

_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def _has_capturing_group(body: str) -> bool:
    """True when the regex body opens a capturing group — an unescaped
    "(" not followed by "?". A lookbehind on a single backslash is not
    enough: in r"x\\(\d+)" the first backslash escapes the SECOND, so
    the "(" is live; only a character-walk that consumes escape pairs
    classifies it correctly. "(" inside a character class ("[()]+") is
    a literal, so the walk tracks class state, including the literal-]
    quirk ("[]]" / "[^]]" keep their first "]")."""
    i, n = 0, len(body)
    in_class, class_start = False, -1
    while i < n:
        c = body[i]
        if c == "\\":
            i += 2  # escape consumes the next char, whatever it is
            continue
        if in_class:
            lit = class_start + (2 if body.startswith("^", class_start + 1) else 1)
            if c == "]" and i > lit:
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class, class_start = True, i
            i += 1
            continue
        if c == "(" and (i + 1 >= n or body[i + 1] != "?"):
            return True
        i += 1
    return False


def grok_to_regex(
    pattern: str, extra_patterns: dict[str, str] | None = None
) -> tuple[str, list[str]]:
    """Compile a grok expression to (anchored_regex, field_names).

    `%{NAME:field}` becomes a capturing group, `%{NAME}` a non-capturing
    one; everything else passes through verbatim (callers regex-escape
    their own literals, as in grok). ``extra_patterns`` adds or overrides
    library entries (the Logstash custom-pattern facility); bodies must
    not contain capturing groups — that would shift field indexes — and
    are rejected if they do."""
    lib = GROK_PATTERNS
    if extra_patterns:
        for name, body in extra_patterns.items():
            if _has_capturing_group(body):
                raise ValueError(
                    f"extra pattern {name!r} contains a capturing group — "
                    "use (?:...) so field indexes stay aligned"
                )
        lib = {**GROK_PATTERNS, **extra_patterns}
    fields: list[str] = []

    def expand(p: str, depth: int) -> str:
        # Recursive descent, not iterative passes: re.sub walks the
        # references left-to-right and each callback appends its own
        # field BEFORE recursing into the body, so `fields` ends up in
        # exactly the regex's "(" order — a pass-until-done loop would
        # append a composite's inner fields after its right-hand
        # neighbors and silently misalign every extract index.
        if depth > _MAX_EXPANSION_DEPTH:
            raise ValueError(
                f"grok pattern expansion exceeded depth {_MAX_EXPANSION_DEPTH} "
                "— circular pattern reference?"
            )

        def sub(m: re.Match) -> str:
            name, field = m.group(1), m.group(2)
            if name not in lib:
                raise ValueError(f"unknown grok pattern %{{{name}}}")
            if field:
                fields.append(field)
            body = expand(lib[name], depth + 1)
            return f"({body})" if field else f"(?:{body})"

        return _REF.sub(sub, p)

    compiled = expand(pattern, 0)
    if "%{" in compiled:
        # a reference _REF could not parse (e.g. %{WORD:status-code}) would
        # otherwise pass through verbatim and blow up as an illegal Java
        # regex deep inside an executor — reject it here with the name
        bad = compiled[compiled.index("%{"):].split("}")[0] + "}"
        raise ValueError(
            f"malformed grok reference {bad!r}: use %{{NAME}} or "
            "%{NAME:field} with \\w+ names"
        )
    return "^" + compiled + "$", fields


def grok_extract(
    df: DataFrame,
    pattern: str,
    line_col: str = "line",
    keep: list[str] | None = None,
    extra_patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Project one string column per grok field plus `grok_match`.

    Non-matching lines get grok_match=false and empty-string fields
    (regexp_extract's no-match value — identical in DuckDB), so error
    routing stays a filter, exactly like the main parser's taxonomy."""
    regex, fields = grok_to_regex(pattern, extra_patterns)
    clash = (set(fields) | {"grok_match"}) & set(df.columns)
    if clash:
        raise ValueError(
            f"grok field(s) {sorted(clash)} collide with input columns — "
            "rename the capture (e.g. %{WORD:line2}) or drop the column first"
        )
    if len(set(fields)) != len(fields):
        raise ValueError(f"duplicate grok field names: {fields}")
    line = F.col(line_col)
    cols: list[Column] = [
        F.regexp_extract(line, regex, i + 1).alias(f) for i, f in enumerate(fields)
    ]
    out = df.select("*", *cols, line.rlike(regex).alias("grok_match"))
    if keep is not None:
        out = out.select(*keep, *fields, "grok_match")
    return out
