"""Tokenize/detokenize between log lines and int32 token arrays.

The reference knows nothing of tokens; BASELINE.json's input_hint defines
the pipeline input as pre-tokenized sequences (doc_id, tokens:array<int32>,
n_tok, source). The tokenizer is repo-defined: one token per UTF-8 byte of
the (pre-trimmed) line. The per-row invariant "token-array equality"
(FIXTURES.md §3.1) is: retokenize(emitted message) == input tokens, which
redeye guarantees because message == trimmed input line (parser.rs:165).

Everything here is buffer-level: token arrays are concatenated into one
contiguous byte buffer and re-carved via Arrow StringArray offsets, so the
per-batch cost is O(bytes) vectorized work plus O(rows) pointer handling —
no per-character Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def tokens_list_array(lines) -> pa.ListArray:
    """str sequence -> Arrow list<int32> token column, zero per-row Python.

    Builds the list array straight from the StringArray's offset/data
    buffers: values = the UTF-8 bytes widened to int32."""
    arr = pa.array(pd.Series(lines).astype(str), type=pa.string())
    n = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[: n + 1]
    data = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        if arr.buffers()[2] is not None
        else np.empty(0, np.uint8)
    )
    values = pa.array(data[: offsets[-1]].astype(np.int32), type=pa.int32())
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64[n+1], bytes uint8) of a StringArray, slice-aware:
    raw buffers are unsliced, so index by the array's offset."""
    o, n = arr.offset, len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[o : o + n + 1].astype(np.int64)
    buf = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        if arr.buffers()[2] is not None
        else np.empty(0, np.uint8)
    )
    return offs, buf


def tokens_list_from_string_array(arr: pa.Array) -> pa.ListArray:
    """pa.StringArray -> list<int32> token column, zero-copy carve of
    the same byte buffer (the arrow-input twin of tokens_list_array;
    identical tokens for identical strings). Nulls fall back to the
    pandas path, which renders them as the literal 'None' exactly like
    tokens_list_array's astype(str)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        return tokens_list_array(arr.to_pandas())
    offs, buf = _string_buffers(arr)
    lo = offs[0]
    values = pa.array((buf[lo : offs[-1]]).astype(np.int32), type=pa.int32())
    return pa.ListArray.from_arrays(
        pa.array((offs - lo).astype(np.int32), type=pa.int32()), values
    )


def detokenize_list_array(arr: pa.Array) -> pa.StringArray:
    """list<int32> arrow column -> StringArray by reinterpreting the
    token values as UTF-8 bytes — the zero-object-materialization twin
    of ``detokenize`` for the mapInArrow parse path (the pandas version
    allocates one ndarray per row just to re-flatten them). Identical
    output: same byte range check, same full UTF-8 validation."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    o, n = arr.offset, len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[o : o + n + 1].astype(np.int64)
    vals = arr.values.to_numpy(zero_copy_only=False)
    flat = vals[offs[0] : offs[-1]]
    if flat.size and (flat.min() < 0 or flat.max() > 255):
        raise ValueError("token out of byte range [0, 255]")
    out = pa.StringArray.from_buffers(
        n,
        pa.py_buffer((offs - offs[0]).astype(np.int32).tobytes()),
        pa.py_buffer(flat.astype(np.uint8).tobytes()),
    )
    out.validate(full=True)  # UTF-8 validation over the whole buffer at once
    return out


def tokens_equal_arrow(lines: pa.Array, tokens: pa.Array) -> np.ndarray:
    """Vectorized per-row check tokenize(lines[i]) == tokens[i] over
    arrow inputs — same reduceat comparison as ``tokens_equal`` without
    per-row object handling."""
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    n = len(lines)
    if n == 0:
        return np.empty(0, dtype=bool)
    if lines.null_count:
        lines = lines.fill_null("")
    line_off, line_buf_all = _string_buffers(lines)
    o = tokens.offset
    tok_off = np.frombuffer(tokens.buffers()[1], dtype=np.int32)[o : o + n + 1].astype(np.int64)
    tok_vals = tokens.values.to_numpy(zero_copy_only=False)

    tok_lens = np.diff(tok_off)
    line_lens = np.diff(line_off)
    len_eq = tok_lens == line_lens
    result = len_eq.copy()

    idx = np.nonzero(len_eq & (tok_lens > 0))[0]
    if idx.size == 0:
        return result
    seg_lens = tok_lens[idx]
    offs = _ranges(seg_lens)
    eq = tok_vals[np.repeat(tok_off[idx], seg_lens) + offs] == line_buf_all[
        np.repeat(line_off[idx], seg_lens) + offs
    ]
    bounds = np.zeros(len(idx), dtype=np.int64)
    np.cumsum(seg_lens[:-1], out=bounds[1:])
    result[idx] = np.logical_and.reduceat(eq, bounds)
    return result


def tokenize(lines: pd.Series) -> pd.Series:
    """UTF-8-byte tokenizer: str -> array<int32>, one int per byte."""
    arr = pa.array(lines.astype(str), type=pa.string())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[: len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] is not None else np.empty(0, np.uint8)
    flat = data.astype(np.int32)
    return pd.Series(
        [flat[offsets[i] : offsets[i + 1]] for i in range(len(arr))],
        index=lines.index,
    )


def _flatten(tokens: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Token-array column -> (int32 offsets, contiguous uint8 buffer)."""
    arrs = [np.asarray(t) for t in tokens]
    lengths = np.fromiter((a.size for a in arrs), dtype=np.int64, count=len(arrs))
    offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    flat = np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
    if flat.size and (flat.min() < 0 or flat.max() > 255):
        raise ValueError("token out of byte range [0, 255]")
    return offsets, flat.astype(np.uint8)


def detokenize(tokens: pd.Series, as_arrow: bool = False):
    """array<int32> -> str by reinterpreting the bytes as UTF-8.

    Zero-copy construction of an Arrow StringArray straight from the
    concatenated byte buffer + offsets; invalid UTF-8 raises.
    as_arrow=True returns the pa.StringArray itself (the parse fast path
    consumes arrow directly — no pandas object round trip).
    """
    if len(tokens) == 0:
        return pa.array([], type=pa.string()) if as_arrow else pd.Series([], dtype=object)
    offsets, buf = _flatten(tokens)
    if offsets[-1] > np.iinfo(np.int32).max:
        raise ValueError("batch too large for int32 string offsets; lower Arrow batch size")
    arr = pa.StringArray.from_buffers(
        len(tokens),
        pa.py_buffer(offsets.astype(np.int32).tobytes()),
        pa.py_buffer(buf.tobytes()),
    )
    arr.validate(full=True)  # UTF-8 validation over the whole buffer at once
    if as_arrow:
        return arr
    out = arr.to_pandas()
    out.index = tokens.index
    return out


def tokens_equal(lines: pd.Series, tokens: pd.Series) -> pd.Series:
    """Vectorized per-row check: tokenize(lines[i]) == tokens[i].

    Compares row lengths, then byte-equality of the two flattened buffers
    reduced per-row segment (np.logical_and.reduceat) — no per-row loops.
    """
    n = len(lines)
    if n == 0:
        return pd.Series([], dtype=bool)
    tok_off, tok_buf = _flatten(tokens)

    arr = pa.array(lines.fillna("").astype(str), type=pa.string())
    line_off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[: n + 1].astype(np.int64)
    line_buf = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        if arr.buffers()[2] is not None
        else np.empty(0, np.uint8)
    )

    tok_lens = np.diff(tok_off)
    line_lens = np.diff(line_off)
    len_eq = tok_lens == line_lens
    result = len_eq.copy()  # equal-length rows assumed equal until refuted

    # Compare bytes only for rows with matching non-zero lengths.
    idx = np.nonzero(len_eq & (tok_lens > 0))[0]
    if idx.size == 0:
        return pd.Series(result, index=lines.index)
    seg_lens = tok_lens[idx]
    # Gather indices for both buffers: ranges [start, start+len) per row.
    offs = _ranges(seg_lens)
    eq = tok_buf[np.repeat(tok_off[idx], seg_lens) + offs] == line_buf[
        np.repeat(line_off[idx], seg_lens) + offs
    ]
    bounds = np.zeros(len(idx), dtype=np.int64)
    np.cumsum(seg_lens[:-1], out=bounds[1:])
    result[idx] = np.logical_and.reduceat(eq, bounds)
    return pd.Series(result, index=lines.index)


def _ranges(lengths: np.ndarray) -> np.ndarray:
    """[3,2] -> [0,1,2,0,1] — vectorized per-segment aranges (lengths > 0)."""
    total = int(lengths.sum())
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    if len(lengths) > 1:
        starts = np.cumsum(lengths)[:-1]
        out[starts] = 1 - lengths[:-1]
    return np.cumsum(out)
