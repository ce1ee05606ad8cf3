"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shape,
partition-friendly operators — and two codecs decode for REAL with pure
numpy: binary PPM (P6) images via `decode_image(fake=False)` and
RIFF/WAVE PCM audio via `decode_audio`. Formats that genuinely need
PIL/opencv/librosa (absent in this container) raise NotImplementedError
inside the executor, exactly as a missing system codec would; the
`fake=True` image path substitutes a deterministic byte-level feature
extractor with the same schema for pipelines on those formats. Swapping
in a library later changes only the inner numpy function, not the
pipeline.

Design for 100 TB of media:
  * binary payloads stay in their own column; metadata extraction is a
    projection, so Parquet column pruning means metadata-only queries
    never read the bytes.
  * decode runs in mapInPandas with a small maxRecordsPerBatch (payloads
    are MBs, not bytes — batch memory = batch_rows x payload size).
  * frame sampling emits (doc_id, frame_idx, frame_bytes) — explode-style
    fan-out partitioned by doc_id hash.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("magic", T.StringType(), True),
        ]), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), False),
    ]
)


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata from the binary column — pure codegen expressions
    (no decode): byte length + magic prefix."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.when(
            p.isNotNull(),
            F.struct(
                F.length(p).cast("long").alias("n_bytes"),
                F.hex(F.substring(p, 1, 4)).alias("magic"),
            ),
        ),
    )


def _fake_image_features(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for a real decoder: 'dimensions' derived
    from payload length, 'features' = 8-bucket byte histogram (L1
    normalized). Purely byte-level, reproducible anywhere."""
    widths, heights, feats = [], [], []
    for p in payloads:
        if p is None:
            widths.append(None); heights.append(None); feats.append(None)
            continue
        b = np.frombuffer(bytes(p), dtype=np.uint8)
        widths.append(int(len(b) % 640 + 16))
        heights.append(int((len(b) * 7) % 480 + 16))
        hist = np.bincount(b >> 5, minlength=8).astype(np.float64)
        total = hist.sum() or 1.0
        feats.append((hist / total).astype(np.float32).tolist())
    return pd.DataFrame({"width": widths, "height": heights, "features": feats})


_PPM_HEADER = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+255\s")


def _decode_ppm(payload: bytes) -> tuple[int, int, list[float]]:
    """Real decode of one binary-PPM (P6) image, pure numpy: parse the
    ASCII header, validate the pixel payload, return (width, height,
    8-bucket L1-normalized intensity histogram). PPM is the one raster
    format decodable without an imaging library, which makes fake=False
    REAL in this container for P6 payloads."""
    m = _PPM_HEADER.match(payload)
    if m is None:
        raise NotImplementedError(
            f"unknown image codec (magic {payload[:4]!r}); only binary PPM "
            "(P6) decodes without PIL/opencv in this environment"
        )
    w, h = int(m.group(1)), int(m.group(2))
    pixels = np.frombuffer(payload, dtype=np.uint8, offset=m.end())
    if pixels.size < w * h * 3:
        raise ValueError(f"truncated PPM: {pixels.size} pixel bytes < {w}x{h}x3")
    pixels = pixels[: w * h * 3]
    hist = np.bincount(pixels >> 5, minlength=8).astype(np.float64)
    return w, h, (hist / (hist.sum() or 1.0)).astype(np.float32).tolist()


def _decode_bmp(payload: bytes) -> tuple[int, int, list[float]]:
    """Real decode of one uncompressed Windows BMP (BITMAPINFOHEADER,
    8-bit palette or 24-bit BI_RGB), pure numpy: parse both headers,
    strip the 4-byte row padding, resolve palette indices to BGR bytes
    for 8-bit images, return (width, height, 8-bucket L1-normalized
    intensity histogram) — the same feature contract as _decode_ppm.
    Bottom-up vs top-down row order is irrelevant to the histogram."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError(
            f"unknown image codec (magic {payload[:2]!r}); expected BMP"
        )
    b = np.frombuffer(payload, dtype=np.uint8)
    u = lambda lo, hi, signed=False: int.from_bytes(  # noqa: E731
        payload[lo:hi], "little", signed=signed)
    data_off = u(10, 14)
    dib_size = u(14, 18)
    if dib_size < 40:
        raise NotImplementedError(f"unsupported BMP DIB header size {dib_size}")
    w = u(18, 22, signed=True)
    h = abs(u(22, 26, signed=True))
    bpp = u(28, 30)
    compression = u(30, 34)
    if compression != 0 or bpp not in (8, 24):
        raise NotImplementedError(
            f"only uncompressed 8/24-bit BMP decodes here (bpp={bpp}, "
            f"compression={compression})"
        )
    row_bytes = (w * bpp) // 8
    stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_off + stride * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} bytes < {need}")
    rows = b[data_off : data_off + stride * h].reshape(h, stride)[:, :row_bytes]
    if bpp == 8:
        n_colors = u(46, 50) or 256
        pal_off = 14 + dib_size
        pal_bytes = b[pal_off : pal_off + n_colors * 4]
        if pal_bytes.size < n_colors * 4:
            raise ValueError(
                f"truncated BMP palette: {pal_bytes.size} bytes < "
                f"{n_colors * 4} for {n_colors} colors"
            )
        palette = pal_bytes.reshape(-1, 4)[:, :3]
        idx = rows.reshape(-1)
        if idx.size and int(idx.max()) >= n_colors:
            # out-of-range index is corrupt data, not a missing codec —
            # classify it like every other malformed-payload case
            raise ValueError(
                f"corrupt BMP: pixel index {int(idx.max())} >= palette "
                f"size {n_colors}"
            )
        px = palette[idx].reshape(-1)  # indices -> BGR bytes
    else:
        px = rows.reshape(-1)
    hist = np.bincount(px >> 5, minlength=8).astype(np.float64)
    return w, h, (hist / (hist.sum() or 1.0)).astype(np.float32).tolist()


def _decode_raster(payload: bytes) -> tuple[int, int, list[float]]:
    """Magic-dispatched real raster decode: P6 -> PPM, BM -> BMP."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        f"unknown image codec (magic {payload[:4]!r}); only binary PPM "
        "(P6) and uncompressed BMP decode without PIL/opencv here"
    )


def decode_image(df: DataFrame, payload_col: str = "payload", fake: bool = False) -> DataFrame:
    """Image decode + feature extraction over mapInPandas.

    fake=False is the REAL path: binary-PPM (P6) and uncompressed BMP
    payloads are decoded with the pure-numpy parsers above (header ->
    dimensions, pixels -> histogram features); any other codec raises
    NotImplementedError INSIDE the executor, exactly as a missing
    system codec would. The fake=True stand-in (deterministic
    byte-level features for ANY payload) remains for pipelines whose
    formats need PIL/opencv."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            if fake:
                out = _fake_image_features(b[payload_col])
            else:
                widths, heights, feats = [], [], []
                for p in b[payload_col]:  # MB-scale payloads: the per-row
                    # header parse is noise next to the numpy pixel pass
                    if p is None:
                        widths.append(None); heights.append(None); feats.append(None)
                        continue
                    w, h, f = _decode_raster(bytes(p))
                    widths.append(w); heights.append(h); feats.append(f)
                out = pd.DataFrame({"width": widths, "height": heights, "features": feats})
            out.insert(0, "doc_id", b["doc_id"].reset_index(drop=True))
            yield out

    return df.select("doc_id", payload_col).mapInPandas(fn, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_wav(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Real decode of one RIFF/WAVE PCM payload, pure numpy: chunk-walk
    the container, parse the fmt subchunk, locate the data subchunk,
    return (sample_rate, n_channels, n_samples, 8-bucket L1-normalized
    byte histogram of the PCM data). PCM WAV is the audio analog of
    binary PPM — decodable without librosa/soundfile, which makes the
    audio path REAL in this container for 8/16-bit PCM."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            f"unknown audio codec (magic {payload[:4]!r}); only RIFF/WAVE "
            "PCM decodes without audio libraries in this environment"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            if len(body) < size:
                # the chunk header promised more PCM than the payload
                # holds — fail like _decode_ppm does, instead of letting
                # a cut-off transfer flow downstream with a wrong
                # n_samples and a partial-data histogram
                raise ValueError(
                    f"truncated WAV: data chunk declares {size} bytes, "
                    f"only {len(body)} present"
                )
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16) or n_channels not in (1, 2):
        raise NotImplementedError(
            f"unsupported WAV variant (format={audio_format}, bits={bits}, "
            f"channels={n_channels}); only 8/16-bit mono/stereo PCM"
        )
    bytes_per_frame = (bits // 8) * n_channels
    n_samples = len(data) // bytes_per_frame
    b = np.frombuffer(data, dtype=np.uint8)
    hist = np.bincount(b >> 5, minlength=8).astype(np.float64)
    feats = (hist / (hist.sum() or 1.0)).astype(np.float32).tolist()
    return sample_rate, n_channels, n_samples, feats


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Audio decode + feature extraction over mapInPandas — the audio
    twin of decode_image's real path: RIFF/WAVE PCM parses with the
    pure-numpy decoder above; any other codec raises
    NotImplementedError inside the executor, exactly as a missing
    system codec would."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            rates, chans, counts, feats = [], [], [], []
            for p in b[payload_col]:
                if p is None:
                    rates.append(None); chans.append(None)
                    counts.append(None); feats.append(None)
                    continue
                sr, nc, ns, f = _decode_wav(bytes(p))
                rates.append(sr); chans.append(nc); counts.append(ns); feats.append(f)
            out = pd.DataFrame({
                "sample_rate": rates, "n_channels": chans,
                "n_samples": counts, "features": feats,
            })
            out.insert(0, "doc_id", b["doc_id"].reset_index(drop=True))
            yield out

    return df.select("doc_id", payload_col).mapInPandas(fn, schema=AUDIO_FEATURES_SCHEMA)


VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("fps_num", T.IntegerType(), True),
        T.StructField("fps_den", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

_Y4M_HEADER = re.compile(rb"^YUV4MPEG2((?: [^ \n]+)*)\n")

# plane-size multipliers: bytes per frame = w*h * num / den
_Y4M_CHROMA = {"420": (3, 2), "422": (2, 1), "444": (3, 1), "mono": (1, 1)}


def _decode_y4m(payload: bytes, with_features: bool = True):
    """Real decode of one YUV4MPEG2 (Y4M) stream, pure numpy: parse the
    stream header (W/H/F/C params), then walk the FRAME markers,
    validating each frame's fixed-size planar payload and accumulating
    an 8-bucket byte histogram over the raw YUV data (markers and
    headers excluded). Y4M is the video analog of binary PPM /
    PCM WAV — a raw uncompressed container decodable without
    ffmpeg/opencv, which makes the video path REAL here. Returns
    (width, height, fps_num, fps_den, n_frames, features) —
    features is None when with_features=False (validation/geometry-only
    walk: the per-byte histogram pass is the dominant cost and callers
    like the frame sampler don't need it)."""
    m = _Y4M_HEADER.match(payload)
    if m is None:
        raise NotImplementedError(
            f"unknown video codec (magic {payload[:4]!r}); only YUV4MPEG2 "
            "(Y4M) decodes without ffmpeg/opencv in this environment"
        )
    w = h = None
    fps_num, fps_den, chroma = 25, 1, "420"
    for tok in m.group(1).split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            num, den = t[1:].split(":")
            fps_num, fps_den = int(num), int(den)
        elif t[0] == "C":
            chroma = next(
                (k for k in _Y4M_CHROMA if t[1:].startswith(k)), t[1:]
            )
    if w is None or h is None or w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if chroma not in _Y4M_CHROMA:
        raise NotImplementedError(f"unsupported Y4M colorspace C{chroma}")
    num, den = _Y4M_CHROMA[chroma]
    if (w * h * num) % den:
        raise ValueError(f"C{chroma} needs even dimensions, got {w}x{h}")
    frame_bytes = w * h * num // den
    pos, n_frames = m.end(), 0
    hist = np.zeros(8, dtype=np.float64)
    data = np.frombuffer(payload, dtype=np.uint8)
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        nl = payload.find(b"\n", pos + 5)
        if nl < 0:
            raise ValueError("unterminated FRAME header")
        body_start = nl + 1
        if body_start + frame_bytes > len(payload):
            raise ValueError(
                f"truncated Y4M: frame {n_frames} needs {frame_bytes} bytes, "
                f"only {len(payload) - body_start} present"
            )
        if with_features:
            hist += np.bincount(
                data[body_start : body_start + frame_bytes] >> 5, minlength=8
            )
        n_frames += 1
        pos = body_start + frame_bytes
    feats = (
        (hist / (hist.sum() or 1.0)).astype(np.float32).tolist()
        if with_features
        else None
    )
    return w, h, fps_num, fps_den, n_frames, feats


def decode_video(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Video decode + feature extraction over mapInPandas — the video
    member of the real-decoder family (PPM image, WAV audio): YUV4MPEG2
    containers are frame-walked by the pure-numpy parser above; any
    other codec raises NotImplementedError inside the executor, exactly
    as a missing system codec would."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            cols = {k: [] for k in
                    ("width", "height", "fps_num", "fps_den", "n_frames", "features")}
            for p in b[payload_col]:
                if p is None:
                    for v in cols.values():
                        v.append(None)
                    continue
                w, h, fn_, fd, nf, ft = _decode_y4m(bytes(p))
                for v, x in zip(cols.values(), (w, h, fn_, fd, nf, ft)):
                    v.append(x)
            out = pd.DataFrame(cols)
            out.insert(0, "doc_id", b["doc_id"].reset_index(drop=True))
            yield out

    return df.select("doc_id", payload_col).mapInPandas(fn, schema=VIDEO_FEATURES_SCHEMA)


def sample_video_frames(
    df: DataFrame, stride: int = 1, max_frames: int = 8, payload_col: str = "payload"
) -> DataFrame:
    """REAL frame sampling: walk each YUV4MPEG2 container and emit every
    ``stride``-th frame's raw planar bytes as (doc_id, frame_idx,
    frame_bytes) — the container-aware upgrade of the byte-slicing
    sample_frames stand-in (same fan-out schema, so downstream plumbing
    is unchanged). frame_idx is the frame's index IN THE CONTAINER, not
    the sample number, so sampled output remains joinable to full
    decode. NULL payloads emit no frames; non-Y4M payloads raise like
    decode_video."""
    s = int(stride)
    if s < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(b["doc_id"], b[payload_col]):
                if p is None:
                    continue
                payload = bytes(p)
                m = _Y4M_HEADER.match(payload)
                if m is None:
                    raise NotImplementedError(
                        f"unknown video codec (magic {payload[:4]!r}); only "
                        "YUV4MPEG2 (Y4M) decodes in this environment"
                    )
                # geometry/validation-only walk (no histogram pass),
                # then re-walk emitting the sampled bodies
                w, h, _, _, n_frames, _ = _decode_y4m(payload, with_features=False)
                chroma = "420"
                for tok in m.group(1).split():
                    if tok[:1] == b"C":
                        t = tok[1:].decode("ascii", "replace")
                        chroma = next(
                            (k for k in _Y4M_CHROMA if t.startswith(k)), chroma
                        )
                num, den = _Y4M_CHROMA[chroma]
                frame_bytes = w * h * num // den
                pos, fi, kept = m.end(), 0, 0
                while pos < len(payload) and kept < max_frames:
                    nl = payload.find(b"\n", pos + 5)
                    body = nl + 1
                    if fi % s == 0:
                        ids.append(doc_id)
                        idxs.append(fi)
                        frames.append(payload[body : body + frame_bytes])
                        kept += 1
                    fi += 1
                    pos = body + frame_bytes
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "frame_idx": pd.Series(idxs, dtype="int32"),
                     "frame_bytes": frames}
                )

    return df.select("doc_id", payload_col).mapInPandas(fn, schema=FRAME_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8, payload_col: str = "payload"
) -> DataFrame:
    """'Video' frame sampling stand-in: slice the payload into fixed-size
    frames, keep every frame up to max_frames. Real frame decode would
    replace the slicing, not the fan-out shape.

    Offset-vectorized over mapInArrow (the same flat-buffer technique as
    functions/tokens.py): frame boundaries are pure arithmetic on the
    Arrow binary offsets, the kept byte ranges are copied with O(rows)
    numpy slice assignments, and the output binary column is built
    directly from (offsets, data) buffers — zero per-frame Python, no
    per-frame bytes objects. Null payloads emit no frames."""
    import pyarrow as pa

    e = int(every_n_bytes)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            if rb.num_rows == 0:
                continue
            ids = rb.column(rb.schema.get_field_index("doc_id"))
            arr = rb.column(rb.schema.get_field_index(payload_col))
            if not pa.types.is_binary(arr.type):
                arr = arr.cast(pa.binary())
            n = len(arr)
            offs = np.frombuffer(arr.buffers()[1], np.int32)[
                arr.offset : arr.offset + n + 1
            ].astype(np.int64)
            data = (
                np.frombuffer(arr.buffers()[2], np.uint8)
                if arr.buffers()[2] is not None
                else np.empty(0, np.uint8)
            )
            lens = np.diff(offs)
            if arr.null_count:
                valid = ~pa.compute.is_null(arr).to_numpy(zero_copy_only=False)
            else:
                valid = np.ones(n, dtype=bool)
            n_frames = np.where(
                valid, np.minimum(max_frames, np.maximum(1, lens // e)), 0
            ).astype(np.int64)
            kept = np.minimum(n_frames * e, lens)  # bytes kept per row
            total = int(n_frames.sum())
            if total == 0:
                continue

            # gather kept prefixes into one contiguous output buffer
            base = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(kept, out=base[1:])
            if base[-1] > np.iinfo(np.int32).max:
                # Arrow binary arrays carry int32 offsets; silent wraparound
                # here would corrupt frame boundaries, so refuse loudly
                raise ValueError(
                    f"frame batch keeps {int(base[-1])} bytes > int32 offset "
                    "range; lower spark.sql.execution.arrow.maxRecordsPerBatch"
                )
            out_data = np.empty(int(base[-1]), dtype=np.uint8)
            for i in range(n):  # O(rows); per-byte work is the slice copy
                if kept[i]:
                    out_data[base[i] : base[i + 1]] = data[offs[i] : offs[i] + kept[i]]

            # per-frame offsets: within a row, frame j ends at min((j+1)e, kept)
            row_of = np.repeat(np.arange(n), n_frames)
            starts = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(n_frames, out=starts[1:])
            fi = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], n_frames)
            ends = base[row_of] + np.minimum((fi + 1) * e, kept[row_of])
            out_offs = np.empty(total + 1, dtype=np.int32)
            out_offs[0] = 0
            out_offs[1:] = ends
            frames = pa.Array.from_buffers(
                pa.binary(), total,
                [None, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(out_data.tobytes())],
            )
            yield pa.RecordBatch.from_arrays(
                [ids.take(pa.array(row_of)), pa.array(fi.astype(np.int32)), frames],
                names=["doc_id", "frame_idx", "frame_bytes"],
            )

    return df.select("doc_id", payload_col).mapInArrow(fn, schema=FRAME_SCHEMA)
