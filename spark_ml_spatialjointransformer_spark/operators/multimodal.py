"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata.

The container ships no decode libraries (no PIL/ffmpeg/librosa), so the
decode kernels are split in two layers:

- the **Spark-side plumbing is real and tested**: schemas (binary + typed
  metadata struct), Arrow batch shapes, mapInPandas signatures, one-to-many
  frame explosion, partition-preserving execution;
- the **codec layer is pluggable**: `resize_images` raises a clearly-marked
  NotImplementedError unless PIL is importable; `extract_features` and
  `sample_frames` use deterministic fakes (byte-hash-seeded LCG features,
  fixed-stride byte chunks as "frames") so pipelines are testable
  end-to-end without the codecs and swap to real decoders by replacing one
  function.

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


def resize_images(
    df: DataFrame, binary_col: str, width: int, height: int
) -> DataFrame:
    """Real image decode+resize — requires PIL, which this container does
    not ship.  The Spark plumbing (mapInPandas over binary, binary out) is
    the same as extract_features; only the kernel differs."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "resize_images requires Pillow, which is not available in this "
            "environment; plug in any codec via the extract_features-style "
            "mapInPandas pattern"
        ) from e
    raise NotImplementedError("codec integration intentionally stubbed")  # pragma: no cover
