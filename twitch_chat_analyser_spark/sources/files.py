"""File-based message sources/sinks beyond parquet: JSON-lines and CSV,
batch and streaming, all normalizing to the canonical message schema.

The reference's only wire format is the Kafka JSON envelope
(``Message.java:26-43`` — ``{"timestamp": ms, "channel": ..,
"username": .., "message": ..}``). These readers accept exactly that
envelope from files (the standard replay/backfill path: a dumped topic
is a directory of JSON-lines), plus CSV for spreadsheet-ish exports.
Every reader returns the same columns as ``ingest.messages``, so the
whole operator surface runs unchanged on any source.

Scale notes: both formats are splittable line-oriented text (gzip'd
files are not — use zstd/bzip2 or uncompressed at 100 TB); schema is
explicit everywhere (no inference pass over the data); malformed rows
are dropped, not failed, matching the Kafka decoder's behavior
(sources/kafka.py::decode_messages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the Kafka JSON envelope fields (Message.java:26-33): epoch-ms long
WIRE_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("channel", T.StringType(), False),
        T.StructField("username", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
    ]
)


def _normalize(raw: DataFrame) -> DataFrame:
    """wire columns -> canonical message relation (adds event-time ts,
    drops rows missing any required field — decoder-parity)."""
    return (
        raw.filter(
            F.col("timestamp").isNotNull()
            & F.col("channel").isNotNull()
            & F.col("username").isNotNull()
            & F.col("message").isNotNull()
        )
        .select(
            F.timestamp_millis("timestamp").alias("ts"),
            "timestamp",
            "channel",
            "username",
            "message",
        )
    )


def read_messages_json(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """JSON-lines messages (the dumped-Kafka-topic replay format).
    Explicit schema — no inference scan; corrupt lines become all-null
    rows (PERMISSIVE) and are dropped by the normalizer."""
    reader = spark.readStream if streaming else spark.read
    return _normalize(reader.schema(WIRE_SCHEMA).json(path))


def read_messages_csv(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """CSV caveat (review r10): a message containing an embedded
    NEWLINE is written quoted, but the default (splittable,
    line-oriented) reader splits it mid-record and the halves drop as
    malformed — pass ``.option("multiLine", "true")`` to recover them
    at the cost of whole-file (non-splittable) reads, or use the
    JSON-lines format, which escapes newlines and round-trips exactly.
    IRC chat messages cannot contain newlines, so the default is safe
    for the reference's domain."""
    reader = spark.readStream if streaming else spark.read
    return _normalize(
        reader.schema(WIRE_SCHEMA).option("header", "true").csv(path)
    )


def read_messages_orc(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """ORC messages (columnar alternative to parquet — vectorized reader,
    predicate pushdown, splittable stripes; same wire columns)."""
    reader = spark.readStream if streaming else spark.read
    return _normalize(reader.schema(WIRE_SCHEMA).orc(path))


def write_messages_orc(messages: DataFrame, path: str) -> None:
    messages.select("timestamp", "channel", "username", "message").write.mode(
        "overwrite"
    ).orc(path)


def write_messages_json(messages: DataFrame, path: str) -> None:
    """Dump the canonical relation back to the wire format (replay
    round-trip: write_messages_json -> read_messages_json is identity
    on the wire columns)."""
    messages.select("timestamp", "channel", "username", "message").write.mode(
        "overwrite"
    ).json(path)


def write_messages_csv(messages: DataFrame, path: str) -> None:
    messages.select("timestamp", "channel", "username", "message").write.mode(
        "overwrite"
    ).option("header", "true").csv(path)


# MIME by extension for the binaryFile ingest below.
_MIME = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "bmp": "image/bmp",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "flac": "audio/flac",
    "mp4": "video/mp4",
    "webm": "video/webm",
    "mkv": "video/x-matroska",
    # animated container parsed by the REAL stdlib block walker
    # (multimodal.decode_gif) — routed to the video stage
    "gif": "video/gif",
}


def read_binary_media(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw media files -> the multimodal ``media_table`` relation via
    Spark's built-in ``binaryFile`` source (one row per file: path,
    modificationTime, length, content — payload bytes never pass through
    Python). media_id is the trailing integer in the file stem; kind is
    the extension's MIME class; intrinsic dims stay null until the
    (stubbed) decode stage fills them (operators/multimodal.py).

    -> media_id long, kind string, payload binary,
       meta struct<mime,width,height,duration_ms>

    Scale notes: ``pathGlobFilter`` prunes non-media files before any
    byte is read; per-file size is capped by
    ``spark.sql.sources.binaryFile.maxLength``. As everywhere in the
    multimodal path: extract features BEFORE any shuffle —
    payload-bearing rows are never join/agg inputs.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return _project_media(reader.load(path))


# binaryFile's fixed schema — file stream sources require it explicitly
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_binary_media_stream(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`read_binary_media`: the same
    ``binaryFile`` format as a file STREAM source (new files become
    micro-batch rows), projected to the identical media_table relation —
    batch-mode duality for the media ingest pipelines."""
    reader = spark.readStream.format("binaryFile").schema(_BINARY_FILE_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _project_media(reader.load(path))


def _project_media(raw: DataFrame) -> DataFrame:
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.(\w+)$", 1))
    mime = F.create_map(*[F.lit(x) for kv in _MIME.items() for x in kv])[ext]
    return raw.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.\w+$", 1)
        .cast("long")
        .alias("media_id"),
        F.split(mime, "/")[0].alias("kind"),
        F.col("content").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    ).filter(F.col("media_id").isNotNull() & mime.isNotNull())
