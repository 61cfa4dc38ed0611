"""Multimodal binary columns (SURVEY.md §2.11 L5).

Media payloads are opaque ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over mapInPandas so Python touches whole record
batches, never rows.

No image libraries ship in this container, so the REAL decode path uses
the pure-numpy codecs in operators/imagecodec.py + jpegcodec.py (PNG
all-filters, BMP, PPM/PGM, baseline-sequential JPEG incl. subsampling
and restart markers — stdlib zlib + numpy only). Progressive JPEG ->
UnsupportedImage. ``fake=True`` keeps the deterministic stub (shape
metadata + checksum) for plumbing-only tests.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def read_binary_files(spark: SparkSession, path: str) -> DataFrame:
    """Ingest media files as binary rows: (path, modificationTime,
    length, content) via Spark's binaryFile source."""
    return spark.read.format("binaryFile").load(path)


DECODE_RESULT_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum string, "
    "width int, height int, gray_mean double"
)


def decode_image_batches(
    batches: Iterator[pd.DataFrame], *, fake: bool
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: decode image payloads per Arrow batch.

    Real path (fake=False): operators/imagecodec.py decodes
    PNG/BMP/PPM/baseline-JPEG payload bytes to (h, w, c) rasters —
    width/height/gray_mean come from the DECODED pixels, not metadata.
    Progressive-JPEG/unknown payloads raise UnsupportedImage
    (pre-filter with imagecodec.sniff_format when a corpus mixes
    formats). The fake path is deterministic: dimensions
    from metadata, gray_mean from a crc32 of the payload — exercising
    the same batch plumbing with no codec in the loop.
    """
    if not fake:
        from laser_hadoop_spark.operators.imagecodec import decode_image

        for pdf in batches:
            recs = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                buf = bytes(payload or b"")
                img = decode_image(buf)
                recs.append(
                    (
                        media_id,
                        kind,
                        len(buf),
                        hashlib.md5(buf).hexdigest(),
                        img.shape[1],
                        img.shape[0],
                        float(img.mean()) / 255.0,
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id",
                    "kind",
                    "n_bytes",
                    "checksum",
                    "width",
                    "height",
                    "gray_mean",
                ],
            )
        return
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                "checksum": payloads.map(
                    lambda b: hashlib.md5(bytes(b or b"")).hexdigest()
                ),
                "width": pdf["meta"].map(lambda m: m["width"]),
                "height": pdf["meta"].map(lambda m: m["height"]),
                "gray_mean": payloads.map(
                    lambda b: (zlib.crc32(bytes(b or b"")) % 256) / 255.0
                ),
            }
        )


def decode_media(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode/feature-extract media rows (Arrow-batched).

    Partitioning note: media blobs are large — repartition upstream by
    size (``df.repartitionByRange('media_id')`` or file-size binning) so
    one Arrow batch stays under spark.sql.execution.arrow.maxRecordsPerBatch
    times the mean blob size.
    """
    return df.mapInPandas(
        lambda it: decode_image_batches(it, fake=fake), DECODE_RESULT_SCHEMA
    )


RESIZE_RESULT_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "src_width int, src_height int"
)


def resize_images(
    df: DataFrame, *, target_w: int, target_h: int, fake: bool = False
) -> DataFrame:
    """Resize image payloads to (target_w, target_h), Arrow-batched.

    Real path (fake=False): decode via operators/imagecodec.py, nearest-
    neighbor resample, re-encode as PNG — payload out is a real image.
    The fake path is deterministic — payload truncated/cycled to
    target_w*target_h bytes standing in for the resized raster — so
    schema, batch shape, and partitioning behavior are exercised with no
    codec in the loop. Source dimensions are carried through for audit
    (src_width/src_height).
    """
    import itertools

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from laser_hadoop_spark.operators.imagecodec import (
                decode_image,
                encode_png,
                resize_nearest,
            )

            for pdf in batches:
                recs = []
                for media_id, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]
                ):
                    img = decode_image(bytes(payload or b""))
                    resized = resize_nearest(img, target_w, target_h)
                    recs.append(
                        (
                            media_id,
                            kind,
                            encode_png(resized),
                            target_w,
                            target_h,
                            img.shape[1],
                            img.shape[0],
                        )
                    )
                yield pd.DataFrame(
                    recs,
                    columns=[
                        "media_id",
                        "kind",
                        "payload",
                        "width",
                        "height",
                        "src_width",
                        "src_height",
                    ],
                )
            return
        n_out = target_w * target_h
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": pdf["payload"].map(
                        lambda b: bytes(
                            itertools.islice(itertools.cycle(bytes(b or b"\0")), n_out)
                        )
                    ),
                    "width": target_w,
                    "height": target_h,
                    "src_width": pdf["meta"].map(lambda m: m["width"]),
                    "src_height": pdf["meta"].map(lambda m: m["height"]),
                }
            )

    return df.where(F.col("kind") == "image").mapInPandas(
        kernel, RESIZE_RESULT_SCHEMA
    )


AUDIO_RESULT_SCHEMA = (
    "media_id long, n_bytes long, duration_ms long, sample_rate int, "
    "n_channels int, rms double, zero_crossing_rate double, "
    "spectral_centroid_hz double"
)


def audio_feature_batches(
    batches: Iterator[pd.DataFrame], *, fake: bool
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: WAV decode + feature extraction per batch.

    Real path: operators/audiocodec.py decodes RIFF PCM payloads and
    computes RMS / zero-crossing rate / spectral centroid from the
    DECODED samples (FFT bounded to a fixed sample budget per clip).
    Compressed audio (MP3/OGG/FLAC) raises UnsupportedAudio — honest,
    like progressive JPEG on the image side. Fake path: deterministic
    stats from metadata + payload crc, same plumbing, no codec.
    """
    cols = [
        "media_id", "n_bytes", "duration_ms", "sample_rate", "n_channels",
        "rms", "zero_crossing_rate", "spectral_centroid_hz",
    ]
    if not fake:
        from laser_hadoop_spark.operators.audiocodec import (
            audio_features,
            decode_wav,
        )

        for pdf in batches:
            recs = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload or b"")
                x, rate = decode_wav(buf)
                f = audio_features(x, rate)
                recs.append(
                    (
                        media_id, len(buf), f["duration_ms"], f["sample_rate"],
                        f["n_channels"], f["rms"], f["zero_crossing_rate"],
                        f["spectral_centroid_hz"],
                    )
                )
            yield pd.DataFrame(recs, columns=cols)
        return
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                "duration_ms": pdf["meta"].map(lambda m: m["duration_ms"] or 0),
                "sample_rate": 16000,
                "n_channels": 1,
                "rms": payloads.map(
                    lambda b: (zlib.crc32(bytes(b or b"")) % 1000) / 1000.0
                ),
                "zero_crossing_rate": 0.0,
                "spectral_centroid_hz": 0.0,
            }
        )


def extract_audio_features(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Audio rows -> per-clip acoustic features (Arrow-batched; same
    large-blob partitioning note as decode_media)."""
    return df.where(F.col("kind") == "audio").mapInPandas(
        lambda it: audio_feature_batches(it, fake=fake), AUDIO_RESULT_SCHEMA
    )


def sample_frames(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (metadata-driven; see decode_video_frames for the real
    pixel path). Pure plan: the frame timestamps come from metadata
    duration, exploded JVM-side."""
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


FRAME_RESULT_SCHEMA = (
    "media_id long, frame_index int, width int, height int, gray_mean double"
)


def video_frame_batches(
    batches: Iterator[pd.DataFrame], *, every_n: int, max_frames: int | None
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: REAL frame extraction from MJPEG-AVI payloads
    (operators/videocodec.py walks the RIFF container; jpegcodec decodes
    the sampled frames). Skipped frames cost a chunk-walk step only —
    sparse sampling of long clips never pays their IDCTs. Inter-frame
    codecs raise UnsupportedVideo."""
    from laser_hadoop_spark.operators.videocodec import decode_frames

    cols = ["media_id", "frame_index", "width", "height", "gray_mean"]
    for pdf in batches:
        recs = []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            for idx, img in decode_frames(
                bytes(payload or b""), every_n=every_n, max_frames=max_frames
            ):
                recs.append(
                    (media_id, idx, img.shape[1], img.shape[0],
                     float(img.mean()) / 255.0)
                )
        yield pd.DataFrame(recs, columns=cols)


def decode_video_frames(
    df: DataFrame, *, every_n: int = 1, max_frames: int | None = None
) -> DataFrame:
    """Video rows -> one row per sampled decoded frame (Arrow-batched;
    same large-blob partitioning note as decode_media)."""
    return df.where(F.col("kind") == "video").mapInPandas(
        lambda it: video_frame_batches(it, every_n=every_n, max_frames=max_frames),
        FRAME_RESULT_SCHEMA,
    )
