"""Line -> token-array operator (inverse of the parse path's detokenize).

Used to materialize the pipeline's input shape (BASELINE.json input_hint)
from any DataFrame that carries raw line strings — e.g. the entry queries
that derive deterministic log lines from the testdata `events` table.
Arrow-batched; byte-level work is vectorized in functions.tokens.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.tokens import tokenize
from ..schema import RAW_SEQUENCES


def tokenize_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """(doc_id, source, <line_col>) -> (doc_id, tokens, n_tok, source)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            toks = tokenize(b[line_col])
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"].reset_index(drop=True),
                    "tokens": toks.map(lambda a: a.tolist()).reset_index(drop=True),
                    "n_tok": toks.map(len).astype("int32").reset_index(drop=True),
                    "source": b["source"].reset_index(drop=True),
                }
            )

    return df.mapInPandas(fn, schema=RAW_SEQUENCES)
