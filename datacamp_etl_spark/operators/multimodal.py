"""Multimodal (image/audio/video) column operators [EXT].

Media are **opaque binary columns with typed metadata structs**; all
Spark-side plumbing — schemas, partitioning, Pandas-UDF signatures,
Arrow batch shapes — is real and tested. The actual codec work
(image decode, audio resample, frame extraction) needs libraries not
present in this container, so the codec kernels are STUBBED: clearly
marked deterministic fakes behind ``_decode_stub``; swapping in
Pillow/librosa/pyav is a one-function change that does not alter any
plan shape.

Design for 100 TB of media:

- media rows are (metadata..., ``content binary``); Parquet stores the
  bytes inline — fine up to a few MB per object. Larger objects should
  use a ``content_path`` pointer column + object-store reads inside
  the same mapInPandas kernels (signature unchanged).
- all kernels are ``mapInPandas`` / Arrow-batched: bytes never pass
  through row-at-a-time Python, and batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
  stays flat.
- feature extraction emits fixed-width vectors -> downstream dedup /
  similarity search reuse the embedding operators unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "decode_images",
    "extract_features",
    "sample_frames",
]

#: Canonical media-row schema: opaque bytes + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def media_table(spark, rows) -> DataFrame:
    """Build a media DataFrame with the canonical schema."""
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(content: bytes, mime: str | None) -> tuple[int, int, bytes]:
    """STUB codec: deterministic fake decode.

    Real implementation would be ``PIL.Image.open(BytesIO(content))``;
    this container has no imaging libraries, so the stub derives a
    deterministic (width, height, pixels) from the content hash. The
    Spark-side contract (bytes in -> fixed tuple out) is the real one.
    """
    if content is None:
        raise ValueError("no content to decode")
    h = hashlib.md5(content).digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    # fake "pixel" payload: content hash repeated — deterministic
    pixels = (h * ((width * height) // len(h) + 1))[: width * height]
    return width, height, pixels


DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_bytes int, "
    "content_sha string"
)


def decode_images(df: DataFrame) -> DataFrame:
    """Decode image bytes -> dimensions + content digest via
    ``mapInPandas`` (Arrow batches; bytes stay columnar end-to-end).

    Only the codec call is a stub; batching, schema, and the
    partition-preserving plan shape are production-real.
    """
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "image" or row.content is None:
                    continue
                content = bytes(row.content)
                w, h, _ = _decode_stub(content, row.mime)
                out.append(
                    {
                        "media_id": row.media_id,
                        "kind": row.kind,
                        "width": w,
                        "height": h,
                        "n_bytes": len(content),
                        "content_sha": hashlib.sha256(content).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "width", "height", "n_bytes", "content_sha",
                ],
            )

    return df.mapInPandas(kernel, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = "media_id long, embedding array<float>"


def extract_features(df: DataFrame, *, dim: int = 16) -> DataFrame:
    """Feature extraction: bytes -> fixed-width float vector.

    STUB kernel (deterministic hash-derived vector); real models slot
    into the same mapInPandas signature (e.g. ONNX batch inference per
    Arrow batch). Output feeds the similarity/dedup operators directly.
    """
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, vecs = [], []
            for row in pdf.itertuples(index=False):
                if row.content is None:
                    continue
                content = bytes(row.content)
                h = hashlib.sha256(content).digest()
                raw = (h * (dim * 4 // len(h) + 1))[: dim * 4]
                vec = (
                    np.frombuffer(raw, dtype=np.uint32, count=dim).astype(np.float64)
                    / np.iinfo(np.uint32).max
                ).astype(np.float32)
                ids.append(row.media_id)
                vecs.append(vec.tolist())
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return df.mapInPandas(kernel, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = "media_id long, frame_no int, ts_ms int, frame_sha string"


def sample_frames(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    STUB: frame count derived from meta.duration_ms; a real kernel
    (pyav) would decode at the same cadence. Demonstrates the 1->N
    mapInPandas fan-out shape (explode on the Python side, schema
    fixed)."""
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "video" or row.content is None:
                    continue
                duration = (row.meta or {}).get("duration_ms") or 0
                content = bytes(row.content)
                for i, ts in enumerate(range(0, int(duration), every_ms)):
                    # ASCII timestamp suffix (not raw bytes) so the
                    # digest is replayable by SQL oracles whose sha256
                    # operates on strings
                    sha = hashlib.sha256(content + str(ts).encode()).hexdigest()
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_no": i,
                            "ts_ms": ts,
                            "frame_sha": sha,
                        }
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_no", "ts_ms", "frame_sha"]
            )

    # Select only needed columns first: content + meta; column pruning
    # keeps unrelated payloads out of the Arrow transfer.
    return df.select("media_id", "kind", "content", "meta").mapInPandas(
        kernel, schema=FRAMES_SCHEMA
    )
