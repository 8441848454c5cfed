"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference treats every record as opaque bytes and never inspects content
(Ors2BlockBuffer.scala:32-40 — writeKey/writeValue of serialized blobs); the
engine-level generalization is a typed *media* column family: an opaque
``binary`` payload plus a ``struct`` of declared metadata, processed by
Arrow-batched ``mapInPandas`` stages.

Spark-side plumbing here is REAL and tested: schemas, partitioning behavior,
UDF signatures, Arrow batch shapes, and the pipeline composition are exactly
what a production decode would use.  Only the innermost codec call is a
deterministic fake (this container ships no PIL/ffmpeg/librosa); swap
``_decode_bytes_fake`` for a real decoder and nothing else changes.  Real
libraries are probed with an import-try at call time, never at import time.

Scale notes (100 TB of media):

* Payloads ride the scan — decode/feature stages are ``mapInPandas`` with NO
  shuffle; partitioning of the input parquet is preserved end-to-end.
* ``spark.sql.files.maxPartitionBytes`` (set in session.py) bounds how many
  payload bytes one task holds; Arrow streams batches, so peak memory is
  one batch, not one partition.
* Feature vectors (small, fixed-width) should be written to a separate table
  keyed by media_id — never re-shuffle the raw bytes after extraction.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Media schema: binary payload + typed metadata struct
# ---------------------------------------------------------------------------

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png | wav | mp4 | ...
        T.StructField("width", T.IntegerType()),  # images/video
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio
        T.StructField("n_frames", T.IntegerType()),  # video/audio frames
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _decoder_available() -> bool:
    """Probe for a real image decoder (import-try gate)."""
    try:  # pragma: no cover - not installed in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_payload(key: bytes, n: int) -> bytes:
    """Deterministic pseudo-random bytes from a key (sha256 CTR stream)."""
    out = bytearray()
    ctr = 0
    while len(out) < n:
        out += hashlib.sha256(key + ctr.to_bytes(8, "little")).digest()
        ctr += 1
    return bytes(out[:n])


def synthesize_media(
    df: DataFrame,
    id_col: str = "doc_id",
    kind: str = "image",
    width: int = 64,
    height: int = 64,
) -> DataFrame:
    """Derive a deterministic fake media table from any keyed table: one
    binary payload + metadata struct per row.  Stands in for `spark.read
    .format("binaryFile")` over an object store, with identical downstream
    schema."""
    n_bytes = width * height * 3

    @F.pandas_udf(T.BinaryType())
    def gen_payload(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: _fake_payload(int(i).to_bytes(8, "little"), n_bytes))

    return df.select(
        F.col(id_col).alias("media_id"),
        gen_payload(F.col(id_col)).alias("content"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit("raw-rgb" if kind == "image" else "raw-pcm").alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(16000 if kind == "audio" else None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
            F.lit(n_bytes).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Decode -> pixel/sample tensor (stubbed codec, real plumbing)
# ---------------------------------------------------------------------------

def _decode_bytes_fake(content: bytes, width: int, height: int) -> np.ndarray:
    """STUB DECODER (deterministic fake): interpret the payload as raw RGB.

    A real implementation calls ``PIL.Image.open(io.BytesIO(content))``; the
    tensor shape, dtype and downstream contract are identical.
    """
    arr = np.frombuffer(content, dtype=np.uint8, count=width * height * 3)
    return arr.reshape(height, width, 3)


def _decode_bytes_real(content: bytes, width: int, height: int) -> np.ndarray:
    """Real codec path: PIL decode to an RGB uint8 tensor of the declared
    shape — the exact same (height, width, 3) contract as the fake, so
    every downstream stage is codec-agnostic.  Only reachable where PIL is
    installed (``_decoder_available``); tests/test_multimodal.py carries an
    importorskip-gated structural-parity test for this branch."""
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(content)).convert("RGB")
    if img.size != (width, height):
        img = img.resize((width, height))
    return np.asarray(img, dtype=np.uint8).reshape(height, width, 3)


def decode_bytes(
    content: bytes, width: int, height: int, fmt: str = "raw-rgb"
) -> np.ndarray:
    """Codec dispatch: ``raw-rgb`` payloads decode structurally (the
    deterministic fake — no codec involved); any real container format
    (png/jpeg/...) requires PIL and fails fast with a clear error where it
    is absent.  Both paths return the identical (height, width, 3) uint8
    tensor, which is what makes the swap a one-line concern."""
    if fmt == "raw-rgb":
        return _decode_bytes_fake(content, width, height)
    if not _decoder_available():
        raise ImportError(
            f"decoding format {fmt!r} requires PIL, which is not installed;"
            " raw-rgb payloads decode without any codec"
        )
    return _decode_bytes_real(content, width, height)


def decode_stats(df: DataFrame) -> DataFrame:
    """Decode each image payload and emit per-channel mean/std — the
    canonical "is the corpus healthy" scan.  ``mapInPandas``: zero shuffle,
    Arrow-batched, output schema declared."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
            T.StructField("std_rgb", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                img = decode_bytes(
                    r["content"],
                    r["meta"]["width"],
                    r["meta"]["height"],
                    r["meta"]["format"],
                )
                px = img.reshape(-1, 3).astype(np.float64)
                rows.append(
                    (
                        int(r["media_id"]),
                        px.mean(axis=0).round(6).tolist(),
                        px.std(axis=0).round(6).tolist(),
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "mean_rgb", "std_rgb"])

    return df.select("media_id", "content", "meta").mapInPandas(batches, out_schema)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of raw-RGB payloads (numpy strided sampling —
    a real pipeline swaps in PIL's Lanczos; same shape contract).  Output is
    a new media table with updated payloads and metadata."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                w, h = r["meta"]["width"], r["meta"]["height"]
                img = decode_bytes(r["content"], w, h, r["meta"]["format"])
                ys = (np.arange(out_h) * h // out_h).astype(int)
                xs = (np.arange(out_w) * w // out_w).astype(int)
                resized = img[np.ix_(ys, xs)]
                meta = dict(r["meta"])
                # the payload is now RAW RGB whatever the input container
                # was — leaving format='png' would route the raw bytes
                # back into the PIL codec on the next decode_bytes call
                meta.update(
                    width=out_w,
                    height=out_h,
                    n_bytes=out_w * out_h * 3,
                    format="raw-rgb",
                )
                rows.append((int(r["media_id"]), resized.tobytes(), meta))
            yield pd.DataFrame(rows, columns=["media_id", "content", "meta"])

    return df.mapInPandas(batches, df.schema)


def extract_features(df: DataFrame, dim: int = 64) -> DataFrame:
    """Media -> embedding column (``array<float>``), the bridge into the
    similarity/ANN operators (operators/similarity.py).  Fake featurizer =
    channel-binned histogram, L2-normalized; a real one runs a vision model
    over the same Arrow batches."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    bins_per_ch = dim // 3 + (dim % 3 > 0)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                img = decode_bytes(
                    r["content"],
                    r["meta"]["width"],
                    r["meta"]["height"],
                    r["meta"]["format"],
                )
                feats = []
                for c in range(3):
                    hist, _ = np.histogram(
                        img[:, :, c], bins=bins_per_ch, range=(0, 256)
                    )
                    feats.extend(hist.tolist())
                v = np.asarray(feats[:dim], dtype=np.float64)
                v = v / (np.linalg.norm(v) or 1.0)
                rows.append((int(r["media_id"]), v.astype(np.float32).tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "embedding"])

    return df.select("media_id", "content", "meta").mapInPandas(batches, out_schema)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video payloads: one output row per kept frame.

    The fake treats the payload as ``n_frames`` stacked raw-RGB frames; a real
    pipeline seeks with ffmpeg.  Demonstrates the 1->N row expansion shape
    (``mapInPandas`` may change cardinality — no explode needed)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                m = r["meta"]
                frame_bytes = m["width"] * m["height"] * 3
                # the PAYLOAD is authoritative for how many frames exist
                # (stale n_bytes metadata must not fabricate or drop
                # frames); a declared meta.n_frames CAPS it, so trailing
                # padding bytes never become garbage frames
                n_avail = max(len(r["content"]) // frame_bytes, 1)
                declared = m["n_frames"] if "n_frames" in m else None
                # `is not None`, not truthiness: a DECLARED zero-frame
                # clip must emit zero frames, not fabricate one from
                # padding bytes
                n = (
                    min(int(declared), n_avail)
                    if declared is not None
                    else n_avail
                )
                for i in range(0, n, every_n):
                    rows.append(
                        (
                            int(r["media_id"]),
                            i,
                            bytes(r["content"][i * frame_bytes : (i + 1) * frame_bytes]),
                        )
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return df.mapInPandas(batches, out_schema)
