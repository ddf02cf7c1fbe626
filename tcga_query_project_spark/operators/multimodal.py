"""Multimodal (image/audio/video) column operators (north-star;
SURVEY.md §2.10).

Media payloads are opaque ``BinaryType`` columns plus a typed metadata
struct — the parquet-native pattern for multimodal training data: the
payload bytes never parse on the JVM, scans prune to metadata unless a
stage explicitly needs pixels/samples.

Decode / feature-extract run as Arrow-batched ``mapInPandas`` — one
Python worker per partition, batch-at-a-time iterator, bounded memory
regardless of corpus size.

Codec strategy (rounds 5-6): payloads whose magic bytes identify a
format decodable without native libraries — BMP / PPM / PGM / PNG /
baseline JPEG images, PCM WAV audio (operators/codecs.py +
operators/jpeg.py, pure python + numpy) — are REALLY decoded: features
come from pixels/samples, resize is an actual nearest-neighbor
resample re-encoded in the same container. Every other payload (MP3,
MP4 — full AV stacks absent from this container) falls back to the
original deterministic byte-level stand-ins, so the kernels stay total
and exact-value-testable. Plugging PIL/librosa/av in extends
``codecs.decode_image`` / ``codecs.decode_wav`` — the Spark-side
dataflow does not change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from tcga_query_project_spark.operators import codecs

#: media table schema: payload + typed metadata (width/height for
#: images, sample_rate/duration for audio; unused fields null).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_s", DoubleType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _hist16(values: np.ndarray, dim: int) -> np.ndarray:
    """Normalized 16-bucket histogram tiled to ``dim`` floats — the
    shared featurizer head: exact, deterministic, and dimension-stable
    for any input domain pre-mapped to 0..15."""
    hist = np.bincount(values, minlength=16).astype(np.float64)
    total = hist.sum()
    if total > 0:
        hist /= total
    reps = int(np.ceil(dim / 16))
    return np.tile(hist, reps)[:dim].astype(np.float32)


def _decode_features(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """Decode + featurize one payload.

    Decodable payloads get REAL content features:
    - BMP / PPM / PGM → 16-bin luminance histogram of the decoded
      pixels (ITU-R 601 integer luma), so the feature reflects the
      image, not its container bytes;
    - PCM WAV → 16-bin amplitude histogram of the decoded mono samples.

    Undecodable payloads (PNG/JPEG/MP3/MP4/arbitrary bytes) fall back
    to the 16-bucket byte histogram — deterministic and exact, keeping
    the kernel total. Real model featurization (an embedding) slots in
    here without changing the dataflow: bytes → fixed-dim float vector.
    """
    img = codecs.decode_image(payload)
    if img is not None:
        r, g, b = (img[:, :, i].astype(np.uint32) for i in range(3))
        luma = (77 * r + 150 * g + 29 * b) >> 8  # ITU-R 601, integer
        return _hist16((luma >> 4).ravel().astype(np.int64), dim)
    wav = codecs.decode_wav(payload)
    if wav is not None:
        _, samples = wav
        bins = np.clip(
            ((samples + 1.0) * 8.0).astype(np.int64), 0, 15
        )
        return _hist16(bins, dim)
    arr = np.frombuffer(payload, dtype=np.uint8)
    return _hist16((arr >> 4).astype(np.int64), dim)


def extract_features(media: DataFrame, dim: int = 32) -> DataFrame:
    """Per-item feature extraction over the payload column via
    ``mapInPandas``: Arrow streams partition batches into Python; each
    batch maps payload bytes → a ``dim``-float feature vector.

    Scale shape: linear scan, no shuffle, output is (id, small vector)
    — write it bucketed by id for the downstream ANN join. Batch size is
    bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so
    executor memory stays flat at any corpus size.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_features(p, k, dim)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, FEATURES_SCHEMA
    )


def resize_images(
    media: DataFrame, width: int, height: int
) -> DataFrame:
    """Image resize over the payload column via ``mapInPandas`` — same
    Arrow-batched shape as :func:`extract_features`, but payload → new
    payload (bytes in, bytes out), with the metadata struct updated to
    the target dimensions.

    Kernel: decodable images (BMP / PPM / PGM / PNG) are REALLY
    resized — decode → nearest-neighbor resample
    (operators/codecs.resize_nearest) → re-encode in the same container
    family (BMP→BMP, PPM/PGM→PPM, PNG→PNG) — so the output payload is
    a valid image of the target dimensions.
    Undecodable payloads keep the deterministic byte-level stand-in
    (truncate/tile to ``w*h`` bytes), keeping the kernel total; PIL
    extends the decodable set without changing the dataflow.

    Contract: the input must carry the full :data:`MEDIA_SCHEMA` column
    set (payload AND all metadata columns) — the full schema passes
    through so mixed-modality rows keep mime/sample_rate/duration_s.
    """

    def _resize_one(payload: bytes, w: int, h: int) -> bytes:
        img = codecs.decode_image(payload)
        if img is not None:
            resized = codecs.resize_nearest(img, w, h)
            if payload[:2] == b"BM":
                return codecs.encode_bmp(resized)
            if payload[:8] == codecs._PNG_MAGIC:
                return codecs.encode_png(resized)
            if payload[:2] == b"\xff\xd8":
                from tcga_query_project_spark.operators import jpeg

                return jpeg.encode_jpeg(resized)
            return codecs.encode_ppm(resized)
        target = w * h
        if len(payload) == 0:
            return b"\x00" * target
        reps = -(-target // len(payload))  # ceil
        return (payload * reps)[:target]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            is_img = pdf["kind"] == "image"
            out["payload"] = [
                _resize_one(p, width, height) if img else p
                for p, img in zip(pdf["payload"], is_img)
            ]
            out["width"] = np.where(is_img, width, pdf["width"]).astype("object")
            out["height"] = np.where(is_img, height, pdf["height"]).astype(
                "object"
            )
            yield out

    # full MEDIA_SCHEMA in and out: non-image rows (and the audio/video
    # metadata columns mime/sample_rate/duration_s) pass through intact
    return media.select([f.name for f in MEDIA_SCHEMA.fields]).mapInPandas(
        fn, MEDIA_SCHEMA
    )


def frame_sample_plan(
    media: DataFrame, every_s: float = 1.0
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) at
    ``every_s`` intervals across the clip duration — pure expression
    work (sequence + explode), no decode. The decode of the planned
    frames is a second ``mapInPandas`` pass shaped like
    :func:`extract_features`; planning stays JVM-side so the expensive
    Python stage receives exactly the frames it must touch.
    """
    n_frames = F.greatest(
        F.lit(1), F.floor(F.col("duration_s") / F.lit(every_s)).cast("int")
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: i.cast("double") * F.lit(every_s),
                )
            ).alias("frame_ts"),
        )
    )


FRAME_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_ts", DoubleType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_frames(
    plan: DataFrame, media: DataFrame, dim: int = 16
) -> DataFrame:
    """Second pass of the video path: decode exactly the frames that
    :func:`frame_sample_plan` planned, one feature vector per
    (media_id, frame_ts).

    The plan (tiny: ids + timestamps) joins back to the payload table
    so each Python task sees one Arrow batch of (payload, frame_ts)
    pairs — payload bytes cross into Python once per planned frame
    group, never for unplanned frames. Frame decode remains the one
    deliberate stand-in kernel: no video codec is implementable without
    a native AV stack, so the frame "pixels" are a deterministic
    function of (payload, frame_ts) — the byte histogram of a
    ts-dependent rotation of the payload — keeping exact-value tests
    while the join→mapInPandas dataflow is the real shape (a real
    pipeline seeks the container to ``frame_ts`` here).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, ts in zip(pdf["payload"], pdf["frame_ts"]):
                off = int(ts) % max(len(payload), 1)
                rotated = payload[off:] + payload[:off]
                feats.append(_decode_features(rotated, "video", dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts": pdf["frame_ts"],
                    "feature": feats,
                }
            )

    joined = plan.join(
        media.select("media_id", "payload"), "media_id"
    ).select("media_id", "frame_ts", "payload")
    return joined.mapInPandas(fn, FRAME_FEATURES_SCHEMA)


#: (hex-prefix, offset, mime) magic-number table — matched in order.
#: Offsets are 1-based substring positions into the payload; the mp4
#: signature ("ftyp") sits at byte 5 after the box-size word.
_MAGIC_TABLE: list[tuple[str, int, str]] = [
    ("89504E47", 1, "image/png"),
    ("FFD8FF", 1, "image/jpeg"),
    ("47494638", 1, "image/gif"),
    ("424D", 1, "image/bmp"),
    ("52494646", 1, "riff"),  # container: WAVE or WEBP, resolved below
    ("494433", 1, "audio/mpeg"),
    ("FFFB", 1, "audio/mpeg"),
    ("664C6143", 1, "audio/flac"),
    ("4F676753", 1, "audio/ogg"),
    ("66747970", 5, "video/mp4"),
    ("1A45DFA3", 1, "video/webm"),
]


def sniff_mime(payload) -> "F.Column":
    """Content-type from payload magic bytes — a REAL (non-stub)
    multimodal operator: pure codegen'd expression work on the
    ``BinaryType`` column (binary substring → hex → prefix match), no
    Python, no codecs. RIFF containers disambiguate on the format tag
    at byte 9 (WAVE vs WEBP). Unknown signatures map to
    'application/octet-stream'.

    The production use is mime VALIDATION: crawled corpora routinely
    carry mislabeled payloads, and a declared-vs-sniffed mismatch filter
    (:func:`validate_media`) is a standard ingest gate.
    """
    hex16 = F.hex(F.substring(payload, 1, 16))

    def prefix_at(sig: str, pos: int):
        # substring positions are bytes; hex doubles them
        start = (pos - 1) * 2
        return F.substring(hex16, start + 1, len(sig)) == sig

    riff_fmt = F.substring(hex16, 17, 8)  # bytes 9-12
    out = F.lit("application/octet-stream")
    for sig, pos, mime in reversed(_MAGIC_TABLE):
        if mime == "riff":
            resolved = (
                F.when(riff_fmt == "57415645", "audio/wav")  # "WAVE"
                .when(riff_fmt == "57454250", "image/webp")  # "WEBP"
                .otherwise("application/octet-stream")
            )
            out = F.when(prefix_at(sig, pos), resolved).otherwise(out)
        else:
            out = F.when(prefix_at(sig, pos), F.lit(mime)).otherwise(out)
    return out


def validate_media(media: DataFrame) -> DataFrame:
    """Declared-vs-sniffed mime validation: each row gains
    ``sniffed_mime`` and ``mime_ok`` (declared mime equals the sniffed
    one; null declared mime is never ok). Narrow map over the scan —
    the ingest gate runs at full scan speed with no Python."""
    sniffed = sniff_mime(F.col("payload"))
    return media.withColumn("sniffed_mime", sniffed).withColumn(
        "mime_ok", F.col("mime").isNotNull() & (F.col("mime") == sniffed)
    )


CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_chunks", IntegerType()),
        StructField("chunk_idx", IntegerType()),
        StructField("chunk", BinaryType()),
    ]
)


def chunk_payloads(media: DataFrame, chunk_bytes: int = 1 << 20) -> DataFrame:
    """Split payloads into bounded chunk rows
    ``(media_id, n_chunks, chunk_idx, chunk)`` — the storage pattern for
    oversized media: parquet pages, shuffle blocks, and Arrow batches
    all see rows of at most ``chunk_bytes``, never a whole 4 GB video
    (Spark rows and Arrow buffers both degrade badly past ~100s of MB).
    Pure expression work (binary substring over an exploded index
    sequence); empty payloads produce one empty chunk so reassembly
    round-trips them.
    """
    n = F.greatest(
        F.lit(1),
        F.ceil(F.length("payload") / F.lit(chunk_bytes)).cast("int"),
    )
    return media.select(
        "media_id",
        n.alias("n_chunks"),
        F.explode(F.sequence(F.lit(0), n - 1)).alias("chunk_idx"),
        "payload",
    ).select(
        "media_id",
        "n_chunks",
        "chunk_idx",
        F.substring(
            F.col("payload"), F.col("chunk_idx") * chunk_bytes + 1, chunk_bytes
        ).alias("chunk"),
    )


def reassemble_payloads(chunks: DataFrame) -> DataFrame:
    """Inverse of :func:`chunk_payloads`: group chunk rows back into
    ``(media_id, payload)``. Chunks order by index inside a collected
    array (shuffle carries chunk rows, never whole payloads); the final
    byte concatenation is one Arrow-batched Python pass — joining a
    list of byte strings is what Python does at memory bandwidth, and
    the per-row payload exists only at the very end, in the consumer's
    hands.

    Completeness gate: a group reassembles only when its DISTINCT chunk
    indexes are exactly ``{0..n_chunks-1}`` (distinct count == n_chunks
    with min 0 and max n_chunks-1 — which over integers pins the full
    range). A plain row count would be fooled by at-least-once upstream
    delivery, where a duplicated chunk row masks a missing one. Exact
    duplicate indexes are tolerated (redelivery semantics: same index →
    same bytes, the first kept); incomplete groups are dropped —
    :func:`incomplete_chunk_groups` reports them for quarantine, never
    a corrupt payload here.
    """
    gathered = (
        chunks.groupBy("media_id")
        .agg(
            F.max("n_chunks").alias("_expect"),
            F.countDistinct("chunk_idx").cast("int").alias("_n_distinct"),
            F.min("chunk_idx").alias("_min_idx"),
            F.max("chunk_idx").alias("_max_idx"),
            F.array_sort(
                F.collect_list(F.struct("chunk_idx", "chunk"))
            ).alias("_parts"),
        )
        .filter(
            (F.col("_n_distinct") == F.col("_expect"))
            & (F.col("_min_idx") == F.lit(0))
            & (F.col("_max_idx") == F.col("_expect") - 1)
        )
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for parts in pdf["_parts"]:
                pieces = []
                prev_idx = -1
                for part in parts:  # sorted by idx; skip redelivered dups
                    if part["chunk_idx"] != prev_idx:
                        pieces.append(part["chunk"])
                        prev_idx = part["chunk_idx"]
                payloads.append(b"".join(pieces))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    return gathered.select("media_id", "_parts").mapInPandas(
        fn,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def incomplete_chunk_groups(chunks: DataFrame) -> DataFrame:
    """Diagnostic companion to :func:`reassemble_payloads`: one row per
    chunk group that would NOT reassemble — ``(media_id, n_expected,
    n_distinct, n_rows)`` — the quarantine feed for an ingest pipeline
    (at-least-once sources: alert when n_rows > n_distinct; data loss:
    n_distinct < n_expected). Same single-shuffle shape as reassembly,
    but carries only counters, never chunk bytes."""
    return (
        chunks.groupBy("media_id")
        .agg(
            F.max("n_chunks").cast("int").alias("n_expected"),
            F.countDistinct("chunk_idx").cast("int").alias("n_distinct"),
            F.count(F.lit(1)).cast("int").alias("n_rows"),
            F.min("chunk_idx").alias("_min_idx"),
            F.max("chunk_idx").alias("_max_idx"),
        )
        .filter(
            (F.col("n_distinct") != F.col("n_expected"))
            | (F.col("_min_idx") != F.lit(0))
            | (F.col("_max_idx") != F.col("n_expected") - 1)
        )
        .select("media_id", "n_expected", "n_distinct", "n_rows")
    )


def metadata_profile(media: DataFrame) -> DataFrame:
    """Metadata-only profile — proves payload pruning: aggregates read
    just the typed metadata columns, so the parquet scan never touches
    the (huge) payload pages."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.round(F.avg(F.col("width") * F.col("height")), 2).alias("mean_pixels"),
        F.round(F.avg("duration_s"), 4).alias("mean_duration_s"),
    )
