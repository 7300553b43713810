"""Multimodal (image/audio/video) column operators.

Media rides in opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` UDFs — the pattern a 100 TB training-data
pipeline needs: the binary payload never round-trips through the driver, the
UDF sees pandas batches (spark.sql.execution.arrow.maxRecordsPerBatch
controls the batch/memory tradeoff), and partitioning stays by file/row-group
so decode parallelism is the scan parallelism.

The actual codec work (image decode/resize, audio resample, video frame
sampling) requires libraries not present in this container, so the codec core
is STUBBED: ``decode_stub=True`` (default) derives deterministic pseudo
features from the payload bytes; ``decode_stub=False`` raises
NotImplementedError at the decode site. Everything Spark-side — schemas, UDF
signatures, batch shapes, partition behavior — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents corpus (the
    driver testdata ships no binary columns): payload = UTF-8 bytes of the
    text; kind = video for doc_id % 4 == 0, audio for % 4 == 1, else image.
    Pure column arithmetic, so a DuckDB oracle can reproduce every
    downstream feature."""
    kind = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("video"))
        .when(F.col("doc_id") % 4 == 1, F.lit("audio"))
        .otherwise(F.lit("image"))
    )
    mime = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("video/mp4"))
        .when(F.col("doc_id") % 4 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("image/png"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def _stub_decode_image(payload: bytes) -> tuple[int, int, float, list[float]]:
    """Deterministic fake decode: dims/luma/feature derived from a sha256 of
    the payload. Replace with a real codec (PIL/cv2) in production."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    mean_luma = digest[2] / 255.0
    feature = [b / 255.0 for b in digest[:16]]
    return width, height, mean_luma, feature


def image_features(
    media: DataFrame, decode_stub: bool = True, batch_size_hint: int | None = None
) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                if not decode_stub:
                    raise NotImplementedError(
                        "real image decode requires PIL/cv2 (not in container); "
                        "use decode_stub=True"
                    )
                w, h, luma, feat = _stub_decode_image(payload)
                rows.append(
                    {
                        "media_id": r.media_id,
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "width": w,
                        "height": h,
                        "mean_luma": luma,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    imgs = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def _stub_decode_audio(payload: bytes) -> tuple[int, float, float]:
    """Deterministic fake decode: rate/duration/loudness from a sha256 of
    the payload. Replace with a real codec (soundfile/librosa) in prod."""
    digest = hashlib.sha256(payload).digest()
    sample_rate = 8000 + digest[0] * 100
    duration_s = round(1.0 + digest[1] / 16.0, 6)
    rms = round(digest[2] / 255.0, 6)
    return sample_rate, duration_s, rms


def audio_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract audio clips via mapInPandas (Arrow
    batches) — same plumbing contract as image_features."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                if not decode_stub:
                    raise NotImplementedError(
                        "real audio decode requires soundfile/librosa "
                        "(not in container); use decode_stub=True"
                    )
                sr, dur, rms = _stub_decode_audio(payload)
                rows.append(
                    {
                        "media_id": r.media_id,
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "sample_rate": sr,
                        "duration_s": dur,
                        "rms": rms,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    clips = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return clips.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_n: int = 10, max_frames: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (fan-out UDF).
    Stub slices the payload deterministically in lieu of real demuxing."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                if not decode_stub:
                    raise NotImplementedError(
                        "real video demux requires ffmpeg/av (not in container)"
                    )
                n_fake_frames = max(len(payload) // max(every_n, 1), 1)
                for idx in range(min(n_fake_frames, max_frames)):
                    lo = idx * every_n
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": idx,
                            "frame_payload": payload[lo : lo + every_n],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    vids = media.filter(F.col("kind") == "video").select("media_id", "payload")
    return vids.mapInPandas(sample, schema=FRAME_SCHEMA)


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Aspect-preserving (letterbox-fit) image resize plan over the
    binary media column — the missing member of the decode /
    feature-extract / RESIZE / frame-sample quartet. The source dims are
    the stub decode's sha256-derived values (`_stub_decode_image`), and
    because those are hex-digit arithmetic they are computed here as
    PURE CATALYST COLUMN EXPRESSIONS — no Python at all: this op is
    map-only, zero-shuffle, whole-stage-codegen'd, demonstrating that
    multimodal METADATA transforms (dims, scale factors, crop/resize
    geometry) belong JVM-side even when pixel work is Arrow-side.

    scale = min(target_w/w, target_h/h); out dims floor(side * scale)
    (each a single correctly-rounded IEEE op, oracle-identical). The
    "resized payload" is represented by its deterministic identity
    sha256(payload || ':WxH') — a real deployment swaps that column for
    the actual resampled bytes inside the same plan shape.
    """
    imgs = media.filter(F.col("kind") == "image")
    hhex = F.sha2(F.col("payload"), 256)

    def hb(p1: int):
        return F.conv(F.substring(hhex, p1, 2), 16, 10).cast("long")

    w = (F.lit(64) + hb(1) % 192).cast("long")
    h = (F.lit(64) + hb(3) % 192).cast("long")
    scale = F.least(
        F.lit(float(target_w)) / w.cast("double"),
        F.lit(float(target_h)) / h.cast("double"),
    )
    tag = F.lit(f":{target_w}x{target_h}".encode())
    return imgs.select(
        "media_id",
        w.alias("src_w"),
        h.alias("src_h"),
        scale.alias("scale"),
        F.floor(w.cast("double") * scale).cast("long").alias("out_w"),
        F.floor(h.cast("double") * scale).cast("long").alias("out_h"),
        F.sha2(F.concat(F.col("payload"), tag), 256).alias("resized_sha"),
    )


AUDIO_CHUNK_US = 4_000_000  # 4-second training segments


def audio_chunks(
    media: DataFrame, chunk_us: int = AUDIO_CHUNK_US
) -> DataFrame:
    """Fixed-duration audio segmentation plan — the audio twin of video
    frame sampling: split every clip into ⌈duration/chunk⌉ contiguous
    training segments with exact microsecond boundaries (the last chunk
    is clipped to the clip end). ASR/TTS corpus prep runs this fan-out
    before feature extraction so each downstream Arrow batch holds
    uniform-length work items.

    The stub duration is `_stub_decode_audio`'s sha256-derived value
    (duration_s = 1 + byte1/16), restated here in EXACT integer
    microseconds (1_000_000 + byte1 * 62_500) as pure Catalyst column
    expressions — like resize_images, the segmentation GEOMETRY is
    map-only, zero-shuffle, whole-stage-codegen'd JVM work; only real
    sample decode would be Arrow-side. A real deployment swaps the
    sha-identity `chunk_sha` for the sliced waveform bytes inside the
    same plan shape.

    Output: (media_id, chunk_idx, start_us, end_us, duration_us,
    chunk_sha), one row per segment.
    """
    clips = media.filter(F.col("kind") == "audio")
    hhex = F.sha2(F.col("payload"), 256)
    b1 = F.conv(F.substring(hhex, 3, 2), 16, 10).cast("long")
    duration_us = (F.lit(1_000_000) + b1 * 62_500).alias("duration_us")
    # stub durations are >= 1s so n_chunks >= 1, but guard anyway:
    # sequence(0, -1) would DESCEND, not return empty
    n_chunks = F.greatest(
        ((F.col("duration_us") + F.lit(chunk_us - 1)) / F.lit(chunk_us))
        .cast("long"),
        F.lit(1),
    )
    chunked = clips.select(
        "media_id", "payload", duration_us
    ).select(
        "media_id",
        "payload",
        "duration_us",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
            "chunk_idx", "_i"
        ),
    )
    start = F.col("chunk_idx").cast("long") * chunk_us
    return chunked.select(
        "media_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.alias("start_us"),
        F.least(start + chunk_us, F.col("duration_us")).alias("end_us"),
        "duration_us",
        F.sha2(
            F.concat(
                F.col("payload"),
                F.encode(
                    F.concat(F.lit(":"), F.col("chunk_idx").cast("string")),
                    "UTF-8",
                ),
            ),
            256,
        ).alias("chunk_sha"),
    )
