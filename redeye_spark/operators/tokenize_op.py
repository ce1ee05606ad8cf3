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


def read_text_lines(spark, path: str) -> DataFrame:
    """Raw log files -> the pipeline's tokenized input shape — the
    direct analog of the reference's stdin mode (redeye.rs:82 reads
    plain text lines), for users whose corpus is .log files rather than
    a pre-tokenized table.

    doc_id is `<file>#<line_no>`: reproducible across runs for a fixed
    file set (unlike bare monotonically_increasing_id, whose values
    shift with partitioning), unique, and it preserves provenance.
    source is the file name. The per-file line numbering is a window
    per file — each file's lines sit in one split for typical log-file
    sizes; multi-GB single files should be split upstream (text is not
    splittable-with-line-numbers without an ordering column anyway).
    Blank lines are dropped (the reference skips them: a trimmed empty
    line parses to ParseError and is warned away; here they carry no
    tokens at all).
    """
    from pyspark.sql import Window, functions as F

    raw = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("_file"),
            F.col("value").alias("line"),
        )
        .filter(F.length(F.trim("line")) > 0)
    )
    w = Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
    lines = raw.select(
        F.concat(
            F.regexp_extract("_file", r"([^/]+)$", 1),
            F.lit("#"),
            F.row_number().over(w).cast("string"),
        ).alias("doc_id"),
        F.regexp_extract("_file", r"([^/]+)$", 1).alias("source"),
        "line",
    )
    return tokenize_lines(lines)


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
