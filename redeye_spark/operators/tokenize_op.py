"""Line -> token-array operator (inverse of the parse path's detokenize).

Used to materialize the pipeline's input shape (BASELINE.json input_hint)
from any DataFrame that carries raw line strings — e.g. the entry queries
that derive deterministic log lines from the testdata `events` table.
Arrow-batched; byte-level work is vectorized in functions.tokens.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.tokens import tokens_list_array
from ..schema import RAW_SEQUENCES


def tokenize_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """(doc_id, source, <line_col>) -> (doc_id, tokens, n_tok, source).

    The token column is built buffer-level (tokens_list_array carves the
    Arrow StringArray's byte buffer into a list<int32> directly) — no
    per-row Python .tolist() materialization anywhere in the batch.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            toks = tokens_list_array(b[line_col])
            lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False)).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"].reset_index(drop=True),
                    "tokens": toks.to_pandas().reset_index(drop=True),
                    "n_tok": pd.Series(lens),
                    "source": b["source"].reset_index(drop=True),
                }
            )

    return df.mapInPandas(fn, schema=RAW_SEQUENCES)


def text_lines_df(spark, path: str) -> DataFrame:
    """Raw log files -> (doc_id, source, line) — line strings with
    provenance ids, NOT yet tokenized (grok-style consumers extract
    straight from the line and should not pay a tokenize+detokenize
    round trip).

    doc_id is `<full path>#<physical_line_no>`: reproducible across
    runs for a fixed file set (unlike bare monotonically_increasing_id,
    whose values shift with partitioning), unique even when same-named
    files live in different directories, and it points back at the
    exact file line. Numbering counts PHYSICAL lines (blank lines are
    numbered, then dropped), so `sed -n '<n>p' <file>` lands on the
    offending record. source is the file basename. The per-file
    numbering window holds each file's lines on one reducer — fine for
    typical log-file sizes; split multi-GB single files upstream (text
    has no stable ordering column to parallelize the numbering over).
    Blank lines are dropped after numbering (the reference warns-and-
    skips a trimmed empty line; here it carries no tokens at all)."""
    from pyspark.sql import functions as F

    raw = spark.read.text(path).select(
        F.regexp_replace(F.input_file_name(), r"^[a-z0-9+.-]+:(//)?", "").alias("_file"),
        F.col("value").alias("line"),
    )
    return number_text_lines(raw)


def number_text_lines(raw: DataFrame) -> DataFrame:
    """(_file, line) -> (doc_id, source, line) with per-file physical
    line numbering — the id/provenance step shared by the batch text
    reader above and the streaming tail path (each micro-batch is a
    static frame, so the same window applies there inside
    foreachBatch)."""
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
    return (
        raw.withColumn("_line_no", F.row_number().over(w))
        .filter(F.length(F.trim("line")) > 0)
        .select(
            F.concat(F.col("_file"), F.lit("#"), F.col("_line_no").cast("string"))
            .alias("doc_id"),
            F.regexp_extract("_file", r"([^/]+)$", 1).alias("source"),
            "line",
        )
    )


def read_text_lines(spark, path: str) -> DataFrame:
    """Raw log files -> the pipeline's tokenized input shape — the
    direct analog of the reference's stdin mode (redeye.rs:82 reads
    plain text lines), for users whose corpus is .log files rather than
    a pre-tokenized table. See text_lines_df for the id/provenance
    contract."""
    return tokenize_lines(text_lines_df(spark, path))


def detokenize_lines(df: DataFrame, keep: tuple[str, ...] = ("doc_id", "source")) -> DataFrame:
    """(doc_id, tokens, ..., source) -> (<keep...>, line): the standalone
    inverse of tokenize_lines, for consumers that want raw lines WITHOUT
    the fixed-format parser (e.g. the --grok CLI path, which extracts
    fields JVM-side after this single Python exchange). Byte work is the
    same zero-copy Arrow StringArray construction the parse fast path
    uses (functions.tokens.detokenize)."""
    from pyspark.sql import types as T

    from ..functions.tokens import detokenize

    out_schema = T.StructType(
        [df.schema[c] for c in keep] + [T.StructField("line", T.StringType(), False)]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            out = b[list(keep)].reset_index(drop=True)
            out["line"] = detokenize(b["tokens"]).reset_index(drop=True)
            yield out

    return df.select(*keep, "tokens").mapInPandas(fn, schema=out_schema)
