"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns next to typed metadata
(the lakehouse-native layout: content-addressed blobs or inline bytes,
schema'd sidecar fields).  The Spark-side plumbing here is real and
tested — schemas, Arrow batch shapes, mapInPandas signatures,
partitioning — while the actual codec step is stubbed: the container
has no image/audio libraries, so decoders raise NotImplementedError
unless ``fake=True`` selects the deterministic stand-in (hash-derived
pseudo-metadata), which keeps every seam exercisable end-to-end.

MEDIA_SCHEMA is the canonical layout:
    media_id BIGINT, kind STRING ('image'|'audio'|...), payload BINARY,
    meta STRUCT<mime STRING, n_bytes BIGINT, sha256 STRING>
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("sha256", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, kind string, width int, height int, n_channels int, "
    "mean_luma double"
)


def as_media(
    df: DataFrame, id_col: str, payload: F.Column, kind: str, mime: str
) -> DataFrame:
    """Wrap a binary expression into the canonical media layout.

    Metadata (size, content hash) is computed engine-side from the
    payload — built-in, no Python.
    """
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """image payload → (width, height, n_channels, mean_luma).

    Runs as ``mapInPandas`` so the decoder sees Arrow record batches
    (bytes columns arrive as zero-copy buffers) and can stream
    batch-by-batch without materializing a partition.  The decode step
    itself is STUBBED: with ``fake=True`` it derives deterministic
    pseudo-dimensions from the payload bytes (plumbing tests); with
    ``fake=False`` it raises NotImplementedError where a PIL/libvips
    call would decode for real.
    """

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                # Real implementation: PIL.Image.open(io.BytesIO(b)) per
                # payload — image libs are not in this container.
                raise NotImplementedError(
                    "real image decode requires an imaging library; "
                    "run with fake=True for the deterministic stand-in"
                )
            widths, heights, chans, lumas = [], [], [], []
            for b in pdf["payload"]:
                h = hashlib.sha256(bytes(b or b"")).digest()
                widths.append(16 + h[0] % 64)
                heights.append(16 + h[1] % 64)
                chans.append(1 + h[2] % 4)
                lumas.append(h[3] / 255.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": widths,
                    "height": heights,
                    "n_channels": chans,
                    "mean_luma": lumas,
                }
            )

    return df.mapInPandas(op, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """'Video' payload → one row per sampled frame offset.

    Frame sampling without decoding: pure built-in expressions generate
    the offset lattice (sequence + explode); a real pipeline would feed
    the (payload, frame_offset) pairs to a decoder UDF downstream.
    """
    n = F.coalesce(F.length("payload"), F.lit(0))
    offsets = F.slice(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)),
        1,
        max_frames,
    )
    return df.select(
        "media_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, kind string, sample_rate int, n_samples bigint, "
    "duration_s double, rms double"
)


def decode_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """audio payload → (sample_rate, n_samples, duration_s, rms).

    Same Arrow-batch mapInPandas plumbing as the image path; the codec
    is STUBBED (no audio libraries in this container): ``fake=True``
    derives deterministic pseudo-features from the payload hash,
    ``fake=False`` raises where a soundfile/librosa decode would run.
    """

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decode requires an audio library; "
                    "run with fake=True for the deterministic stand-in"
                )
            rates, counts, durs, rms = [], [], [], []
            for b in pdf["payload"]:
                h = hashlib.sha256(bytes(b or b"")).digest()
                rate = (8000, 16000, 44100, 48000)[h[0] % 4]
                n = 1000 + int.from_bytes(h[1:4], "big") % 100000
                rates.append(rate)
                counts.append(n)
                durs.append(n / rate)
                rms.append(h[4] / 255.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "sample_rate": rates,
                    "n_samples": counts,
                    "duration_s": durs,
                    "rms": rms,
                }
            )

    return df.mapInPandas(op, schema=AUDIO_FEATURES_SCHEMA)
