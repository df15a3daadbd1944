"""Multimodal column plumbing (SURVEY.md §7.5).

Media items are opaque ``binary`` columns + a typed metadata struct —
the pattern for image/audio/video at 100 TB: the engine never interprets
bytes with built-ins; decode/feature-extract runs in Arrow-batched
``mapInPandas`` stages so bytes stream through Python in columnar
batches without per-row serde.

The decode step itself is STUBBED (no image/audio libs in this
container): ``decode_image_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake decode
(dimensions + channel means derived from the byte content) so the
Spark-side plumbing — schema, batch shape, partitioning — is fully
exercised by tests.

Scale notes: binary payloads dominate row width — keep them OUT of
shuffles: extract features first (map-side ``mapInPandas``), then
aggregate/join on the small feature output. ``media_table`` carries
payload + metadata in one row; a production layout splits payload into
its own content-addressed table to keep metadata scans cheap.
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
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, mean_r double, mean_g double, mean_b double"
)


def binary_metadata(docs: DataFrame) -> DataFrame:
    """Typed-metadata extraction over a binary column, built-ins only
    (no Python in the plan): byte length + content hash. Uses the
    documents table's text encoded to bytes as the stand-in payload.

    -> doc_id, n_bytes, content_hash, lang, source
    """
    return docs.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        F.md5("text").alias("content_hash"),
        "lang",
        "source",
    )


def decode_image_stub(payload: bytes, fake: bool = False):
    """Placeholder for a real image decoder (PIL/libvips not in this
    container). ``fake=True`` derives deterministic pseudo-properties
    from the bytes so plumbing tests have stable expectations."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in "
            "this environment; pass fake=True for the deterministic stub"
        )
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    means = tuple(float(h[i]) for i in (2, 3, 4))
    return width, height, means


def decode_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode/feature-extract stage: ``mapInPandas`` so each
    Python worker sees columnar batches of (id, payload) — the real-decode
    integration point. Deterministic fake decode by default (see module
    docstring).

    -> DECODED_SCHEMA rows, payloads dropped (features only leave the stage)
    """
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                w, h, (mr, mg, mb) = decode_image_stub(payload, fake=fake)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "width": w,
                        "height": h,
                        "mean_r": mr,
                        "mean_g": mg,
                        "mean_b": mb,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "payload").mapInPandas(
        extract, schema=DECODED_SCHEMA
    )


AUDIO_SCHEMA = (
    "media_id long, n_bytes long, est_sample_rate int, est_duration_ms long, "
    "rms double"
)


def audio_features_stub(payload: bytes, fake: bool = False):
    """Placeholder for a real audio decoder (soundfile/librosa not in
    this container). ``fake=True`` derives deterministic pseudo-features
    from the bytes (byte-level RMS as the stand-in signal statistic)."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires an audio library not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    rate = 8000 + (hashlib.sha256(payload).digest()[0] % 5) * 8000
    duration_ms = max(1, len(payload) * 1000 // (rate * 2))
    rms = (sum(b * b for b in payload) / max(1, len(payload))) ** 0.5
    return rate, duration_ms, rms


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched audio feature extraction (same plumbing pattern as
    :func:`decode_features`): features only leave the stage.

    -> AUDIO_SCHEMA rows
    """
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                rate, dur, rms = audio_features_stub(payload, fake=fake)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_bytes": len(payload),
                        "est_sample_rate": rate,
                        "est_duration_ms": dur,
                        "rms": rms,
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(extract, schema=AUDIO_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, target_w int, target_h int, "
    "out_bytes binary, out_sha256 string"
)


def resize_stub(payload: bytes, target_w: int, target_h: int, fake: bool = False):
    """Placeholder for a real resize kernel. ``fake=True`` produces a
    deterministic pseudo-thumbnail: sha256(payload||dims) repeated to
    target_w*target_h bytes — stable content whose SIZE scales with the
    target geometry, so batch-shape and byte-budget tests are real."""
    if not fake:
        raise NotImplementedError(
            "image resizing requires an imaging library not present in "
            "this environment; pass fake=True for the deterministic stub"
        )
    seed = hashlib.sha256(payload + f"{target_w}x{target_h}".encode()).digest()
    n = target_w * target_h
    return (seed * (n // len(seed) + 1))[:n]


def resize_images(
    media: DataFrame, target_w: int = 32, target_h: int = 32, fake: bool = True
) -> DataFrame:
    """Arrow-batched resize stage (binary in -> binary out). Unlike
    ``decode_features`` this RETURNS payload-sized data, so at scale the
    stage must run map-side and write straight to the sink — never feed
    resized bytes into a shuffle (module docstring).

    -> RESIZED_SCHEMA rows
    """
    import pandas as pd

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                out = resize_stub(bytes(r["payload"]), target_w, target_h, fake=fake)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "target_w": target_w,
                        "target_h": target_h,
                        "out_bytes": out,
                        "out_sha256": hashlib.sha256(out).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").select(
        "media_id", "kind", "payload"
    ).mapInPandas(do_resize, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into one row
    per target frame timestamp (sequence + explode, JVM-side); the
    actual frame grab would join this plan into a ``mapInPandas`` decode
    keyed by (media_id, frame_ts).

    -> media_id, frame_ts_ms
    """
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
