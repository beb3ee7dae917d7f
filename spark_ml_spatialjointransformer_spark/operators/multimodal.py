"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata.

The container ships no decode libraries (no PIL/ffmpeg/librosa), so the
decode kernels are split in two layers:

- the **Spark-side plumbing is real and tested**: schemas (binary + typed
  metadata struct), Arrow batch shapes, mapInPandas signatures, one-to-many
  frame explosion, partition-preserving execution;
- the **codec layer** ships real pure-numpy decoders for the uncompressed
  formats (PPM P6 and 24-bit BMP — `decode_image`/`encode_ppm`/`resize_nn`
  need no external library), with Pillow as an optional escape hatch for
  compressed formats through the same `decode_image` contract;
  `extract_features` and `sample_frames` use deterministic fakes
  (byte-hash-seeded LCG features, fixed-stride byte chunks as "frames") so
  embedding/keyframe pipelines are testable end-to-end without model
  weights or ffmpeg and swap to real kernels by replacing one function.

At 100TB the pattern is: binaries stay in parquet/iceberg blobs, only
metadata and features shuffle; every op below is mapInPandas over the
scan — no shuffle is introduced by decode/feature steps.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_ml_spatialjointransformer_spark.functions._serde import (
    ensure_udf_portability,
)
from spark_ml_spatialjointransformer_spark.functions.hashing import (
    h60_binary_col,
    h60_py,
)

#: metadata struct carried alongside every binary payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def with_media_meta(df: DataFrame, binary_col: str, mime: str) -> DataFrame:
    """Attach the typed metadata struct — pure JVM expressions (length +
    md5-h60), no Python.  The checksum is h60 (functions/hashing.py) so the
    DuckDB oracle reproduces it exactly."""
    b = F.col(binary_col)
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(b).cast("int").alias("n_bytes"),
            h60_binary_col(b).alias("checksum"),
        ),
    )


def _fake_feature(data: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for an image/audio embedding model: h60 of
    the payload seeds an LCG feature vector in [-1, 1).  Replace with a real
    model call (ONNX/torch) in production — the batch plumbing is identical.
    (The md5-based seed + pure-integer LCG keep the whole kernel expressible
    as a recursive CTE in the DuckDB oracle — queries.py m1.)"""
    state = h60_py(data) or 1
    out = np.empty(dim, dtype=np.float32)
    for i in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out[i] = (state >> 11) / float(1 << 53) * 2.0 - 1.0
    return out


def extract_features(
    df: DataFrame, binary_col: str, dim: int = 16, out_col: str = "features"
) -> DataFrame:
    """Per-row feature vector from the binary payload via mapInPandas
    (Arrow batches of bytes in, array<float> out).  Deterministic fake
    kernel — see module docstring."""
    ensure_udf_portability()
    fields = df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature(b if isinstance(b, bytes) else bytes(b or b""), dim)
                for b in pdf[binary_col]
            ]
            yield pdf.assign(**{out_col: feats})

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str,
    frame_bytes: int = 1024,
    stride: int = 2,
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One-to-many "video" frame sampling: split the payload into
    ``frame_bytes`` chunks, keep every ``stride``-th chunk.  Real decoders
    swap the chunker for an ffmpeg keyframe reader; the row-explosion
    plumbing (mapInPandas emitting more rows than it receives) is the part
    that matters for the pipeline."""
    ensure_udf_portability()
    keep = list(id_cols) or [c for c in df.columns if c != binary_col]
    out_schema = T.StructType(
        [df.schema[c] for c in keep]
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [
                b if isinstance(b, bytes) else bytes(b or b"")
                for b in pdf[binary_col]
            ]
            # frames per row, then one np.repeat for ALL keep-columns —
            # iterrows would walk python objects row-at-a-time in the hot
            # one-to-many explosion
            counts = np.array(
                [
                    len(range(0, max(1, (len(d) + frame_bytes - 1) // frame_bytes), stride))
                    for d in payloads
                ],
                dtype=np.int64,
            )
            rep = np.repeat(np.arange(len(pdf)), counts)
            idxs = np.concatenate(
                [
                    np.arange(0, max(1, (len(d) + frame_bytes - 1) // frame_bytes), stride)
                    for d in payloads
                ]
            ) if len(pdf) else np.array([], dtype=np.int64)
            frames = [
                payloads[ri][fi * frame_bytes : (fi + 1) * frame_bytes]
                for ri, fi in zip(rep, idxs)
            ]
            out = {c: pdf[c].to_numpy()[rep] for c in keep}
            out["frame_idx"] = idxs.astype(np.int32)
            out["frame"] = frames
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# real codec layer: pure-numpy PPM (P6) and BMP (24-bit BI_RGB) — the two
# uncompressed formats decodable without external libraries.  Pillow, when
# importable, extends coverage to compressed formats through the same seam.
# ---------------------------------------------------------------------------


def _decode_ppm(data: bytes):
    """Binary PPM (P6) → (H, W, 3) uint8 array, or None if malformed.
    Parses the whitespace/comment-tolerant header per the netpbm spec."""
    return _decode_ppm_ex(data)[0]


def _decode_ppm_ex(data: bytes):
    """Like ``_decode_ppm`` but also returns the exact byte length this
    frame occupied: ``(img | None, consumed)``.  Concatenated-frame
    walkers MUST use the returned length rather than re-deriving the
    header ``encode_ppm`` would have written — any netpbm-legal
    whitespace/comment variation in the header would otherwise desync
    the cursor and silently corrupt every later frame."""
    if not data.startswith(b"P6"):
        return None, 0
    # header: magic, width, height, maxval — tokens separated by whitespace,
    # '#' comments run to end of line; ONE whitespace byte after maxval,
    # then raw RGB
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(data):
        c = data[pos : pos + 1]
        if c == b"#":
            nl = data.find(b"\n", pos)
            if nl == -1:
                return None, 0
            pos = nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(data) and not data[end : end + 1].isspace():
                end += 1
            tokens.append(data[pos:end])
            pos = end
    if len(tokens) < 3:
        return None, 0
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None, 0
    if w <= 0 or h <= 0 or maxval != 255:
        return None, 0
    pos += 1  # the single whitespace byte after maxval
    need = w * h * 3
    raw = data[pos : pos + need]
    if len(raw) < need:
        return None, 0
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3), pos + need


def _decode_bmp(data: bytes):
    """Uncompressed 24-bit BI_RGB BMP → (H, W, 3) uint8 RGB array, or None.
    Handles 4-byte row padding and bottom-up (positive height) row order."""
    if len(data) < 54 or not data.startswith(b"BM"):
        return None
    import struct

    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        return None
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if w <= 0 or h_raw == 0 or planes != 1 or bpp != 24 or compression != 0:
        return None
    h = abs(h_raw)
    row_bytes = (w * 3 + 3) & ~3
    need = row_bytes * h
    raw = data[off : off + need]
    if len(raw) < need:
        return None
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, row_bytes)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if h_raw > 0:  # bottom-up storage
        img = img[::-1]
    return np.ascontiguousarray(img)


def decode_image(data) -> "np.ndarray | None":
    """bytes → (H, W, 3) uint8 RGB, or None if no codec matches.  Built-in:
    PPM P6 and 24-bit BMP (pure numpy); Pillow, if importable, handles the
    rest through the same return contract."""
    if data is None:
        return None
    b = data if isinstance(data, bytes) else bytes(data)
    img = _decode_ppm(b) if b[:2] == b"P6" else None
    if img is None and b[:2] == b"BM":
        img = _decode_bmp(b)
    if img is None:
        try:  # optional-dependency escape hatch for compressed formats
            import io

            import PIL.Image

            img = np.asarray(PIL.Image.open(io.BytesIO(b)).convert("RGB"))
        except Exception:
            return None
    return img


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6) bytes — the deterministic output
    container (no compression, no encoder version drift)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def resize_nn(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize with the floor index map
    ``src = (dst * src_dim) // dst_dim`` — pure integer arithmetic, so any
    independent implementation (the m3 DuckDB oracle) reproduces the pixel
    selection exactly."""
    h0, w0 = img.shape[:2]
    ys = (np.arange(height, dtype=np.int64) * h0) // height
    xs = (np.arange(width, dtype=np.int64) * w0) // width
    return img[ys][:, xs]


def resize_images(
    df: DataFrame,
    binary_col: str,
    width: int,
    height: int,
    out_col: str = "resized",
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (PPM P6) per row via
    mapInPandas.  Rows whose payload no codec recognizes get NULL (kept,
    not dropped — the caller decides).  Scale shape: one Arrow pass over
    the scan, partition-preserving, no shuffle."""
    ensure_udf_portability()
    fields = df.schema.fields + [T.StructField(out_col, T.BinaryType())]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[binary_col]:
                img = decode_image(b)
                out.append(
                    encode_ppm(resize_nn(img, width, height))
                    if img is not None
                    else None
                )
            yield pdf.assign(**{out_col: out})

    return df.mapInPandas(run, schema=out_schema)


def image_stats(
    df: DataFrame, binary_col: str, prefix: str = "img_"
) -> DataFrame:
    """Decode each payload and emit typed stats columns: width, height, and
    the integer sum of all RGB values (NULLs for undecodable payloads).
    The pixel sum is the oracle-checkable scalar that proves the decode
    actually read the pixels."""
    ensure_udf_portability()
    fields = df.schema.fields + [
        T.StructField(f"{prefix}width", T.IntegerType()),
        T.StructField(f"{prefix}height", T.IntegerType()),
        T.StructField(f"{prefix}pix_sum", T.LongType()),
    ]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, sums = [], [], []
            for b in pdf[binary_col]:
                img = decode_image(b)
                if img is None:
                    ws.append(None)
                    hs.append(None)
                    sums.append(None)
                else:
                    ws.append(img.shape[1])
                    hs.append(img.shape[0])
                    sums.append(int(img.astype(np.int64).sum()))
            yield pdf.assign(
                **{
                    f"{prefix}width": pd.array(ws, dtype="Int32"),
                    f"{prefix}height": pd.array(hs, dtype="Int32"),
                    f"{prefix}pix_sum": pd.array(sums, dtype="Int64"),
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def image_sharpness(
    df: DataFrame, binary_col: str, prefix: str = "img_"
) -> DataFrame:
    """Blur/quality metric: decode each payload and emit the integer sum of
    |horizontal second differences| of the per-pixel luma (R+G+B) — the
    1-D Laplacian-energy proxy every image-curation pipeline thresholds to
    drop blurry/flat frames (a blurred image has small second differences;
    all-integer, so a SQL oracle replays it exactly).  mapInPandas over the
    scan, partition-preserving; undecodable payloads yield NULL."""
    ensure_udf_portability()
    fields = df.schema.fields + [
        T.StructField(f"{prefix}sharpness", T.LongType()),
        T.StructField(f"{prefix}n_px", T.IntegerType()),
    ]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sharps, npx = [], []
            for b in pdf[binary_col]:
                img = decode_image(b)
                if img is None:
                    sharps.append(None)
                    npx.append(None)
                    continue
                luma = img.astype(np.int64).sum(axis=2)
                d2 = luma[:, :-2] - 2 * luma[:, 1:-1] + luma[:, 2:]
                sharps.append(int(np.abs(d2).sum()))
                npx.append(int(luma.size))
            yield pdf.assign(
                **{
                    f"{prefix}sharpness": pd.array(sharps, dtype="Int64"),
                    f"{prefix}n_px": pd.array(npx, dtype="Int32"),
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def image_ahash(
    df: DataFrame, binary_col: str, out_col: str = "ahash", strict: bool = True
) -> DataFrame:
    """Average-hash perceptual fingerprint of a (small) decoded image: one
    bit per pixel, set iff the pixel's integer luminance (R+G+B) is ≥ the
    image mean — the mean test done as the exact cross-multiplication
    ``L·n ≥ ΣL`` so no float ever enters (bit-replayable in SQL).  Bits
    pack row-major into an int64, so the image must have ≤ 63 pixels —
    callers resize first (ahash is DEFINED on a thumbnail; the resize IS
    the algorithm's low-pass filter).  NULL for undecodable payloads.

    An OVERSIZED payload is a pipeline bug (the caller forgot the
    resize), not a poison row, so ``strict=True`` (default) fails loud.
    For large curation runs where one malformed row must not abort the
    job, pass ``strict=False``: oversized images hash to NULL exactly
    like undecodable ones, and the caller counts/quarantines NULLs
    downstream (the usual dead-letter pattern).

    Scale shape: one Arrow pass, partition-preserving, no shuffle; the
    64-bit hash is what downstream dedup shuffles, never pixels."""
    ensure_udf_portability()
    fields = df.schema.fields + [T.StructField(out_col, T.LongType())]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs = []
            for b in pdf[binary_col]:
                img = decode_image(b)
                if img is None:
                    hs.append(None)
                    continue
                lum = img.astype(np.int64).sum(axis=-1)
                n = lum.size
                if n > 63:
                    if strict:
                        raise ValueError(
                            f"image_ahash: {n} pixels > 63 — resize to a "
                            "thumbnail first (the hash is one bit per "
                            "pixel of an int64), or pass strict=False to "
                            "hash oversized rows to NULL"
                        )
                    hs.append(None)
                    continue
                tot = int(lum.sum())
                bits = lum.reshape(-1) * n >= tot
                h = 0
                for k in np.nonzero(bits)[0]:
                    h |= 1 << int(k)
                hs.append(h)
            yield pdf.assign(**{out_col: pd.array(hs, dtype="Int64")})

    return df.mapInPandas(run, schema=out_schema)


def tile_images(
    df: DataFrame,
    binary_col: str,
    nx: int,
    ny: int,
    out_col: str = "tile",
) -> DataFrame:
    """Split each decoded image into an ``nx × ny`` grid of equal tiles and
    emit one ROW PER TILE (original columns + ``tx``/``ty`` grid position +
    the tile re-encoded as PPM) — the patch extraction step behind
    region-level dedup, boilerplate/watermark detection, and ViT-style
    patch pipelines.  Images whose dimensions don't divide evenly (or that
    fail to decode) are dropped, like every undecodable row in this module.
    Scale shape: one Arrow pass, partition-preserving (a row fans out to
    nx·ny rows in place, no shuffle); downstream ops hash tiles to small
    ints before anything moves."""
    ensure_udf_portability()
    fields = [f for f in df.schema.fields] + [
        T.StructField("tx", T.IntegerType()),
        T.StructField("ty", T.IntegerType()),
        T.StructField(out_col, T.BinaryType()),
    ]
    out_schema = T.StructType(fields)
    base_cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = decode_image(r[binary_col])
                if img is None:
                    continue
                h, w = img.shape[:2]
                if w % nx or h % ny:
                    continue
                tw, th = w // nx, h // ny
                for ty in range(ny):
                    for tx in range(nx):
                        tile = img[
                            ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw
                        ]
                        rows.append(
                            tuple(r[c] for c in base_cols)
                            + (tx, ty, encode_ppm(tile))
                        )
            yield pd.DataFrame(rows, columns=base_cols + ["tx", "ty", out_col])

    return df.mapInPandas(run, schema=out_schema)


def synth_ppm_images(
    df: DataFrame, id_col: str, width: int, height: int, out_col: str = "img"
) -> DataFrame:
    """Deterministic test-image synthesis: pixel (x, y) of row ``id`` is
    R=(3x+5y+id)%256, G=(x+2y)%256, B=(id+x·y)%256, encoded as PPM P6 —
    integer formulas a SQL oracle replays exactly (queries.py m3).  This is
    the binary-column GENERATOR for codec tests, not a production op."""
    ensure_udf_portability()
    fields = df.schema.fields + [T.StructField(out_col, T.BinaryType())]
    out_schema = T.StructType(fields)
    xs, ys = np.meshgrid(np.arange(width), np.arange(height))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = []
            for i in pdf[id_col]:
                i = int(i)
                img = np.stack(
                    [
                        (3 * xs + 5 * ys + i) % 256,
                        (xs + 2 * ys) % 256,
                        (i + xs * ys) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                imgs.append(encode_ppm(img))
            yield pdf.assign(**{out_col: imgs})

    return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# real codec layer, audio: RIFF/WAVE PCM16 — encoder + chunk-walking decoder
# in pure struct/numpy, the audio twin of the PPM/BMP image codecs above.
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono 16-bit PCM WAV (RIFF) encoder.  ``samples`` is any integer
    array; values are truncated to little-endian int16."""
    import struct

    pcm = samples.astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm


def decode_wav(data):
    """RIFF/WAVE PCM16 bytes → ``(samples int16 (n, channels), sample_rate)``
    or None if malformed/unsupported.  Walks the RIFF chunk list (so extra
    chunks — LIST, fact, cue — are skipped, with word alignment), accepts
    any channel count, requires audio format 1 (PCM) at 16 bits."""
    import struct

    if data is None:
        return None
    b = data if isinstance(data, bytes) else bytes(data)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if len(body) < size:
            return None
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or pcm is None:
        return None
    audio_fmt, channels, sr, _byte_rate, _block, bits = fmt
    if audio_fmt != 1 or bits != 16 or channels < 1:
        return None
    n = len(pcm) // (2 * channels)
    arr = np.frombuffer(pcm[: n * 2 * channels], dtype="<i2").reshape(n, channels)
    return arr, sr


def audio_stats(
    df: DataFrame, binary_col: str, prefix: str = ""
) -> DataFrame:
    """Decode WAV payloads and emit integer waveform stats (sample rate,
    sample count, peak |amplitude|, Σ|amplitude|, Σ amplitude² energy) via
    mapInPandas — partition-preserving, binaries never shuffle.  Undecodable
    payloads yield null stats (poison rows must not kill the 100 TB job)."""
    ensure_udf_portability()
    fields = df.schema.fields + [
        T.StructField(f"{prefix}sample_rate", T.IntegerType()),
        T.StructField(f"{prefix}n_samples", T.IntegerType()),
        T.StructField(f"{prefix}peak", T.LongType()),
        T.StructField(f"{prefix}sum_abs", T.LongType()),
        T.StructField(f"{prefix}energy", T.LongType()),
    ]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srs, ns, peaks, sums, energies = [], [], [], [], []
            for b in pdf[binary_col]:
                dec = decode_wav(b)
                if dec is None:
                    srs.append(None), ns.append(None), peaks.append(None)
                    sums.append(None), energies.append(None)
                    continue
                arr, sr = dec
                a = arr.astype(np.int64)
                srs.append(sr)
                ns.append(arr.shape[0])
                peaks.append(int(np.abs(a).max()) if a.size else 0)
                sums.append(int(np.abs(a).sum()))
                energies.append(int((a * a).sum()))
            yield pdf.assign(
                **{
                    f"{prefix}sample_rate": pd.array(srs, dtype="Int32"),
                    f"{prefix}n_samples": pd.array(ns, dtype="Int32"),
                    f"{prefix}peak": pd.array(peaks, dtype="Int64"),
                    f"{prefix}sum_abs": pd.array(sums, dtype="Int64"),
                    f"{prefix}energy": pd.array(energies, dtype="Int64"),
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def audio_frame_energy(
    df: DataFrame,
    binary_col: str,
    frame_len: int = 64,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Audio framing: decode WAV payloads and explode each into fixed-length
    frames with integer Σ amplitude² energy — the front half of every
    VAD / diarization / audio-event pipeline (frame, then classify frames).
    One-to-many mapInPandas over the scan, partition-preserving: the audio
    bytes never shuffle, only (id, frame_idx, energy int64) rows continue
    downstream.  Multi-channel audio sums energy across channels; a trailing
    partial frame is kept (its energy is just a shorter sum); undecodable
    payloads are dropped (poison rows must not kill the 100 TB job)."""
    ensure_udf_portability()
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in id_cols]
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_energy", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in id_cols}
            idxs, energies = [], []
            for row in pdf.itertuples(index=False):
                dec = decode_wav(getattr(row, binary_col))
                if dec is None:
                    continue
                arr, _sr = dec
                sq = (arr.astype(np.int64) ** 2).sum(axis=1)
                n_frames = (len(sq) + frame_len - 1) // frame_len
                for k in range(n_frames):
                    for c in id_cols:
                        out[c].append(getattr(row, c))
                    idxs.append(k)
                    energies.append(
                        int(sq[k * frame_len : (k + 1) * frame_len].sum())
                    )
            yield pd.DataFrame(
                {
                    **out,
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "frame_energy": pd.array(energies, dtype="Int64"),
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def audio_fingerprint(
    df: DataFrame,
    binary_col: str,
    n_windows: int = 8,
    out_col: str = "afp",
    strict: bool = True,
) -> DataFrame:
    """Energy-profile perceptual fingerprint of a decoded waveform: the
    samples split into ``n_windows`` equal windows (sample count must
    divide evenly — a loud error otherwise, never silent truncation), one
    bit per window set iff the window's Σ|amplitude| is ≥ the per-window
    mean — the mean test as the exact cross-multiplication
    ``e_w·n_windows ≥ Σe`` so no float enters and a SQL oracle replays
    the bits.  Multi-channel audio fingerprints the channel-summed |a|.
    The audio twin of ``image_ahash``: a coarse, alignment-tolerant
    loudness envelope whose collisions are the dedup buckets.  NULL for
    undecodable payloads.  A non-divisible sample count is a pipeline
    bug under ``strict=True`` (default, loud); ``strict=False`` sends
    such rows to NULL instead so one malformed payload can't abort a
    large curation run (count/quarantine NULLs downstream).  Scale
    shape: one Arrow pass over the scan, partition-preserving, no
    shuffle; downstream dedup shuffles the int64, never audio."""
    ensure_udf_portability()
    fields = df.schema.fields + [T.StructField(out_col, T.LongType())]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for b in pdf[binary_col]:
                dec = decode_wav(b)
                if dec is None:
                    fps.append(None)
                    continue
                arr, _ = dec
                a = np.abs(arr.astype(np.int64)).sum(axis=1)
                if a.size == 0 or a.size % n_windows:
                    if strict:
                        raise ValueError(
                            f"audio_fingerprint: {a.size} samples do not "
                            f"split into {n_windows} equal windows — pad/"
                            "trim upstream, or pass strict=False to send "
                            "such rows to NULL"
                        )
                    fps.append(None)
                    continue
                e = a.reshape(n_windows, -1).sum(axis=1)
                tot = int(e.sum())
                bits = e * n_windows >= tot
                fp = 0
                for w in np.nonzero(bits)[0]:
                    fp |= 1 << int(w)
                fps.append(fp)
            yield pdf.assign(**{out_col: pd.array(fps, dtype="Int64")})

    return df.mapInPandas(run, schema=out_schema)


def synth_wav(
    df: DataFrame,
    id_col: str,
    n_samples: int = 256,
    sample_rate: int = 16000,
    out_col: str = "wav",
) -> DataFrame:
    """Deterministic test-waveform synthesis: sample t of row ``id`` is
    ``((id·7919 + t·2654435761) mod 65536) − 32768`` — pure integer, so a
    SQL oracle replays the decoded waveform exactly (queries.py m4).  The
    binary-column GENERATOR for audio codec tests, not a production op."""
    ensure_udf_portability()
    fields = df.schema.fields + [T.StructField(out_col, T.BinaryType())]
    out_schema = T.StructType(fields)
    t = np.arange(n_samples, dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            wavs = []
            for i in pdf[id_col]:
                samples = (int(i) * 7919 + t * 2654435761) % 65536 - 32768
                wavs.append(encode_wav(samples, sample_rate))
            yield pdf.assign(**{out_col: wavs})

    return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# "video" layer: a video file here is a CONCATENATION of PPM frames (the
# analogue of MJPEG — each frame self-delimiting via its own header), which
# keeps the container walkable without external codecs while exercising the
# real pipeline shape: one opaque blob per row in, per-frame rows out.
# ---------------------------------------------------------------------------


def synth_video(
    df: DataFrame,
    id_col: str,
    n_frames: int = 12,
    width: int = 8,
    height: int = 6,
    scene_len: int = 4,
    out_col: str = "video",
) -> DataFrame:
    """Deterministic test-video synthesis: frame ``f`` of row ``id`` is a
    ``width×height`` PPM with R=(id%16)·3+(f//scene_len)·53+x+y,
    G=(id%8)+2f+x, B=x·y — every term bounded below 256 so no modular
    wrap, and the (f//scene_len) term makes the frame brightness JUMP at
    every scene boundary, which is what m7's scene detector looks for.
    Pure integers → a SQL oracle replays per-frame byte sums exactly."""
    ensure_udf_portability()
    fields = df.schema.fields + [T.StructField(out_col, T.BinaryType())]
    out_schema = T.StructType(fields)
    xs, ys = np.meshgrid(np.arange(width), np.arange(height))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = []
            for i in pdf[id_col]:
                i = int(i)
                frames = []
                for f in range(n_frames):
                    img = np.stack(
                        [
                            (i % 16) * 3 + (f // scene_len) * 53 + xs + ys,
                            (i % 8) + 2 * f + xs,
                            xs * ys,
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    frames.append(encode_ppm(img))
                vids.append(b"".join(frames))
            yield pdf.assign(**{out_col: vids})

    return df.mapInPandas(run, schema=out_schema)


def frame_byte_sums(
    df: DataFrame, binary_col: str, id_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Walk a concatenated-PPM video blob and emit one row per frame with
    the frame's pixel-byte sum (the luma proxy scene detection thresholds
    on).  The walker parses each frame's own header — no frame count or
    size is trusted from outside the payload — so a truncated or corrupt
    tail simply stops the walk (partial frames are dropped, never
    half-read).  Partition-preserving mapInPandas: blobs never shuffle;
    downstream sees only (ids, frame_idx, luma int64) rows."""
    ensure_udf_portability()
    keep = list(id_cols) or [c for c in df.columns if c != binary_col]
    out_schema = T.StructType(
        [df.schema[c] for c in keep]
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("luma", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rep, idxs, lumas = [], [], []
            for ri, blob in enumerate(pdf[binary_col]):
                data = blob if isinstance(blob, bytes) else bytes(blob or b"")
                pos, f = 0, 0
                while pos < len(data):
                    # the decoder reports the exact bytes it consumed —
                    # never re-derive the header from (w, h): any
                    # netpbm-legal whitespace/comment variant would desync
                    # the cursor and silently corrupt every later frame
                    img, used = _decode_ppm_ex(data[pos:])
                    if img is None or used == 0:
                        break
                    pos += used
                    rep.append(ri)
                    idxs.append(f)
                    lumas.append(int(img.astype(np.int64).sum()))
                    f += 1
            out = {c: pdf[c].to_numpy()[np.array(rep, dtype=np.int64)] for c in keep}
            out["frame_idx"] = np.array(idxs, dtype=np.int32)
            out["luma"] = np.array(lumas, dtype=np.int64)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=out_schema)


def encode_bmp(img: np.ndarray) -> bytes:
    """Uncompressed 24-bit BI_RGB BMP encoder (bottom-up rows, 4-byte row
    padding) — the inverse of ``_decode_bmp``, so the same pixels can round
    -trip through BOTH containers the decoder understands."""
    import struct

    h, w = img.shape[0], img.shape[1]
    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    bgr = img[:, :, ::-1]
    data = b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def transcode_images(
    df: DataFrame, binary_col: str, to_fmt: str, out_col: str
) -> DataFrame:
    """Decode each image and re-encode it in ``to_fmt`` ('ppm' or 'bmp') —
    the container-normalization step cross-format dedup needs (same pixels
    arrive as different byte strings; content identity only exists after
    decode).  Partition-preserving Arrow pass; undecodable → NULL."""
    ensure_udf_portability()
    enc = {"ppm": encode_ppm, "bmp": encode_bmp}[to_fmt]
    fields = df.schema.fields + [T.StructField(out_col, T.BinaryType())]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[binary_col]:
                img = decode_image(b if isinstance(b, bytes) else bytes(b or b""))
                out.append(enc(img) if img is not None else None)
            yield pdf.assign(**{out_col: out})

    return df.mapInPandas(run, schema=out_schema)


def image_channel_stats(
    df: DataFrame, binary_col: str, prefix: str = "ch_"
) -> DataFrame:
    """Per-image per-channel moment accumulators — the map side of the
    dataset normalization-constant computation every vision training
    pipeline runs (channel means/stds for the input-normalization
    transform).  Each decoded image emits ONE ROW PER CHANNEL carrying
    exact integer Σv and Σv² plus the pixel count; the caller reduces
    them to global means/variances with a plain aggregate (sums of
    int64s — associative, engine-exact), so the float division happens
    exactly once at the very end.  Undecodable rows are dropped.
    Scale shape: one Arrow pass, partition-preserving; what shuffles is
    3 rows of 3 int64s per image, never pixels."""
    ensure_udf_portability()
    fields = [f for f in df.schema.fields] + [
        T.StructField(f"{prefix}channel", T.IntegerType()),
        T.StructField(f"{prefix}n", T.LongType()),
        T.StructField(f"{prefix}sum", T.LongType()),
        T.StructField(f"{prefix}sumsq", T.LongType()),
    ]
    out_schema = T.StructType(fields)
    base_cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = decode_image(r[binary_col])
                if img is None:
                    continue
                v = img.astype(np.int64)
                for c in range(v.shape[-1]):
                    ch = v[..., c]
                    rows.append(
                        tuple(r[b] for b in base_cols)
                        + (c, int(ch.size), int(ch.sum()),
                           int((ch * ch).sum()))
                    )
            yield pd.DataFrame(
                rows,
                columns=base_cols
                + [f"{prefix}channel", f"{prefix}n", f"{prefix}sum",
                   f"{prefix}sumsq"],
            )

    return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# real container layer: POSIX ustar archives — stdlib-encoder +
# hand-rolled 512-byte-block walking decoder.  Crawl dumps and document
# warehouses arrive as member-bearing containers (WARC/tar/zip); the
# scale-relevant operator is MEMBER EXPLOSION: one archive row in, one
# row per member out, binaries never shuffling.
# ---------------------------------------------------------------------------


def synth_tar_archives(
    df: DataFrame, id_col: str, out_col: str = "tar"
) -> DataFrame:
    """Deterministic archive synthesis: row ``id`` becomes a POSIX tar
    with ``id % 3 + 1`` members; member ``i`` (0-based) is named
    ``m{id}_{i}.bin``, has size ``(id*7 + i*13) % 200 + 10`` and content
    byte ``j`` = ``(id + (i+1)*j) % 256`` — integer formulas a SQL
    oracle replays exactly (queries.py m14).  Encoding uses the stdlib
    ``tarfile`` writer (a real, spec-conforming encoder) so the
    hand-rolled decoder below is tested against an independent
    implementation, not its own mirror."""
    import io
    import tarfile

    ensure_udf_portability()
    fields = df.schema.fields + [T.StructField(out_col, T.BinaryType())]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for raw in pdf[id_col]:
                i = int(raw)
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
                    for m in range(i % 3 + 1):
                        size = (i * 7 + m * 13) % 200 + 10
                        body = bytes(
                            (i + (m + 1) * j) % 256 for j in range(size)
                        )
                        info = tarfile.TarInfo(name=f"m{i}_{m}.bin")
                        info.size = size
                        info.mtime = 0
                        tf.addfile(info, io.BytesIO(body))
                blobs.append(buf.getvalue())
            yield pdf.assign(**{out_col: blobs})

    return df.mapInPandas(run, schema=out_schema)


def parse_tar_members(
    df: DataFrame, id_col: str, tar_col: str
) -> DataFrame:
    """Member explosion: walk each archive's 512-byte blocks by hand
    (name from bytes 0:100, size from the octal field 124:136, header
    checksum 148:156 verified against the sum-with-spaced-checksum
    rule, data padded to the next block, two zero blocks terminate),
    yielding ONE ROW PER MEMBER with the integer facts downstream
    dedup/routing needs: index, name hash (h60 — the cross-engine
    form, functions/hashing.py), size, byte sum.  A corrupt header
    (bad checksum / non-octal size) poisons only that archive (emits
    nothing), the m-family's poison-row convention.

    Scale shape: one ``mapInPandas`` pass, partition-preserving — the
    archive binary is opened and DROPPED inside the executor; only
    (id, idx, name-hash, two ints) leave, so member explosion never
    shuffles payload bytes.  Output: (id, member_idx, name_h60, size,
    byte_sum)."""
    from spark_ml_spatialjointransformer_spark.functions.hashing import h60_py

    ensure_udf_portability()
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("member_idx", T.IntegerType()),
            T.StructField("name_h60", T.LongType()),
            T.StructField("size", T.LongType()),
            T.StructField("byte_sum", T.LongType()),
        ]
    )

    def members(blob: bytes):
        out = []
        pos = 0
        idx = 0
        n = len(blob)
        while pos + 512 <= n:
            hdr = blob[pos : pos + 512]
            if hdr == b"\0" * 512:
                break
            # checksum: header with the chksum field replaced by spaces
            try:
                stored = int(hdr[148:156].split(b"\0")[0].strip() or b"0", 8)
            except ValueError:
                return None
            calc = sum(hdr[:148]) + 8 * 32 + sum(hdr[156:])
            if stored != calc:
                return None
            try:
                size = int(hdr[124:136].split(b"\0")[0].strip() or b"0", 8)
            except ValueError:
                return None
            name = hdr[0:100].split(b"\0")[0].decode("utf-8", "replace")
            body = blob[pos + 512 : pos + 512 + size]
            if len(body) != size:
                return None
            h = h60_py(name)
            out.append((idx, h, size, int(np.frombuffer(body, np.uint8).astype(np.int64).sum())))
            idx += 1
            pos += 512 + ((size + 511) // 512) * 512
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[tar_col]):
                got = members(bytes(blob)) if blob is not None else None
                if got is None:
                    continue
                for idx, h, size, bsum in got:
                    rows.append((int(rid), idx, h, size, bsum))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "member_idx", "name_h60", "size", "byte_sum"],
            )

    return df.mapInPandas(run, schema=out_schema)
