"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The column contract and Spark-side plumbing (schemas, Arrow batching,
partitioning) are real and tested; the actual media decoding is stubbed —
the container ships no image/audio libraries — behind import-tries that
raise ``NotImplementedError`` from the real path and fall back to a
deterministic fake so the distributed machinery is exercised end-to-end.

Design for 100 TB of media:
- content stays a ``binary`` column read lazily (binaryFile source or
  pointer-only frames with (uri, byte_range)); never shuffled — all
  per-item ops are mapInPandas (no wide stage touches bytes).
- metadata is a typed struct column so filters (width ≥ x, codec = y)
  prune on parquet statistics without touching content.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, channels int, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_png binary"


def _decode_image_real(content: bytes):  # pragma: no cover
    try:
        from PIL import Image  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow; not present in this container"
        ) from e
    import io

    return Image.open(io.BytesIO(content))


def _fake_dims(content: bytes) -> tuple[int, int]:
    """Deterministic pseudo-dimensions from the content hash (test fake)."""
    h = hashlib.md5(content or b"").digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def decode_and_featurize_images(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas image decode + tiny feature vector.

    Real path: Pillow decode → resize → channel-mean features
    (NotImplementedError without the lib). Fake path: md5-derived dims and
    a deterministic feature vector — identical schema, batching, and
    partition behavior, so the pipeline is fully testable here and only
    the kernel swaps on a real cluster image.
    """
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                content = r.content or b""
                try:
                    img = _decode_image_real(content)
                    w, h = img.size
                    arr = np.asarray(img.convert("RGB"), dtype=np.float32)
                    feat = arr.mean(axis=(0, 1)).repeat(dim // 3 + 1)[:dim]
                    channels = 3
                except NotImplementedError:
                    w, h = _fake_dims(content)
                    digest = hashlib.md5(content).digest()
                    feat = np.frombuffer(digest[:dim], dtype=np.uint8).astype(
                        np.float32
                    ) / 255.0
                    channels = 3
                out.append(
                    {
                        "media_id": r.media_id,
                        "width": int(w),
                        "height": int(h),
                        "channels": channels,
                        "feature": feat.tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame.

    Real decode requires ffmpeg/pyav (NotImplementedError); the fake emits
    one deterministic pseudo-frame per second of reported duration so the
    fan-out shape (1 row in → N rows out) is exercised.
    """
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                duration = (r.meta or {}).get("duration_ms") or 0
                n = max(1, int(duration // every_ms))
                for i in range(min(n, 100)):
                    seed = hashlib.md5(
                        (str(r.media_id) + ":" + str(i)).encode()
                    ).digest()
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            "frame_png": seed,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, FRAME_SAMPLE_SCHEMA
    )


AUDIO_CHUNK_SCHEMA = (
    "media_id long, chunk_idx int, start_ms long, end_ms long,"
    " chunk_bytes binary"
)


def chunk_audio(
    media: DataFrame,
    window_ms: int = 1000,
    hop_ms: int = 500,
    ms_per_byte: int = 10,
) -> DataFrame:
    """Overlapping-window audio chunking — the pre-step every audio
    featurizer (fbank/wav2vec/whisper-style) runs before inference: one
    output row per (window_ms) chunk advanced by hop_ms, with the raw
    chunk bytes carried through Arrow.

    Real path: soundfile/librosa decode → sample-accurate windows
    (NotImplementedError in this container). Fake path (deterministic,
    oracle-replayable): duration_ms = len(content) * ``ms_per_byte`` and
    a chunk's bytes are the proportional byte range
    [start_ms/ms_per_byte, ceil(end_ms/ms_per_byte)) of the content —
    so the mapInPandas batch shape, fan-out (1 row -> N chunks), binary
    slicing, and schema are all exercised with SQL-checkable values.

    Parameters are validated HERE, on the driver: the ``start += hop_ms``
    loop below runs inside an executor task, where hop_ms <= 0 would spin
    forever (and ms_per_byte <= 0 makes the byte math nonsense) with no
    error surfacing until the task is killed.
    """
    if window_ms <= 0:
        raise ValueError(f"window_ms must be > 0, got {window_ms}")
    if hop_ms <= 0:
        raise ValueError(f"hop_ms must be > 0, got {hop_ms}")
    if ms_per_byte <= 0:
        raise ValueError(f"ms_per_byte must be > 0, got {ms_per_byte}")
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                content = bytes(r.content or b"")
                dur = len(content) * ms_per_byte
                i, start = 0, 0
                while start < dur:
                    end = min(start + window_ms, dur)
                    b0 = start // ms_per_byte
                    b1 = -(-end // ms_per_byte)  # ceil
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "chunk_idx": i,
                            "start_ms": start,
                            "end_ms": end,
                            "chunk_bytes": content[b0:b1],
                        }
                    )
                    i += 1
                    start += hop_ms
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "chunk_idx", "start_ms", "end_ms",
                    "chunk_bytes",
                ],
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, AUDIO_CHUNK_SCHEMA
    )


def synth_media(spark, n: int = 20) -> DataFrame:
    """Deterministic synthetic media frame for tests/demos."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        content = hashlib.md5(str(i).encode()).digest() * 4
        rows.append(
            (
                i,
                kind,
                bytearray(content),
                {
                    "mime": {"image": "image/png", "audio": "audio/flac", "video": "video/mp4"}[kind],
                    "width": None,
                    "height": None,
                    "duration_ms": 5000 + i * 1000 if kind == "video" else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, width int, height int, target_w int, target_h int,"
    " resized binary"
)


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """mapInPandas image resize — the training-pipeline normalization
    step before feature extraction.

    Real path: Pillow decode → LANCZOS resize → PNG re-encode
    (NotImplementedError without the lib). Fake path: deterministic
    source dims from the content hash and a synthetic payload of
    md5(content ∥ target) so downstream schema/size checks and
    exactly-once semantics are testable without codecs; partitioning and
    Arrow batch shape are identical to the real kernel.
    """
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                content = r.content or b""
                try:
                    img = _decode_image_real(content)
                    w, h = img.size
                    import io

                    resized = img.resize((target_w, target_h))
                    buf = io.BytesIO()
                    resized.save(buf, format="PNG")
                    payload = buf.getvalue()
                except NotImplementedError:
                    w, h = _fake_dims(content)
                    payload = hashlib.md5(
                        content + f"{target_w}x{target_h}".encode()
                    ).digest()
                out.append(
                    {
                        "media_id": r.media_id,
                        "width": int(w),
                        "height": int(h),
                        "target_w": target_w,
                        "target_h": target_h,
                        "resized": payload,
                    }
                )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(run, RESIZED_SCHEMA)
