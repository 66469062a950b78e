"""Multimodal (image/audio/video) column plumbing (SURVEY §2.12 #75).

Design: media payloads are opaque ``binary`` columns + a typed metadata
struct, exactly as a 100 TB training pipeline carries them (payload bytes
co-located with row metadata in parquet; heavy decode work happens in
Arrow-batched Python, not the JVM).

The decode kernels themselves (JPEG decode, resampling, frame sampling)
require media libraries that are NOT in this container — they are STUBBED
behind ``decode_stub``: a clearly-marked deterministic fake that preserves
every real aspect of the Spark plumbing (schema, batch iteration, partition
behavior, UDF signature). Swap ``_decode_payload`` for a real PIL/ffmpeg
call and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature extractor — fixed contract for downstream.
FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "checksum long, width int, height int, feat array<float>"
)


def attach_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Materialize a binary payload + metadata struct from the documents
    table (the testdata carries no real media, so payload bytes are the
    UTF-8 text — byte-for-byte deterministic and size-realistic plumbing).

    Real ingestion path for actual media is ``spark.read.format
    ("binaryFile")`` which yields (path, modificationTime, length, content).
    """
    return docs.select(
        id_col,
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.col(text_col)).cast("long").alias("n_bytes"),
            (F.crc32(F.encode(F.col(text_col), "UTF-8")) % 1920).cast("int").alias("width"),
            (F.crc32(F.encode(F.col(text_col), "UTF-8")) % 1080).cast("int").alias("height"),
        ).alias("media_meta"),
    )


def _decode_payload(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decode kernel — deterministic fake standing in for a real
    image/audio decoder (PIL/libav are not installed in this container).

    Returns (width, height, feature_vector). The fake derives 8 'features'
    from byte statistics so tests get stable, content-sensitive values.
    Replace the body with e.g. ``PIL.Image.open(io.BytesIO(payload))`` for
    real media; the Spark-side contract (FEATURE_SCHEMA) does not change.
    """
    n = len(payload)
    if n == 0:
        raise NotImplementedError(
            "empty payload: real decoder behavior undefined in stub"
        )
    checksum = 0
    for i in range(0, n, max(1, n // 64)):  # bounded sample of the bytes
        checksum = (checksum * 131 + payload[i]) % (1 << 31)
    feats = [float((checksum >> (4 * k)) & 0xFF) / 255.0 for k in range(8)]
    return checksum % 1920, checksum % 1080, feats


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Each Python worker receives whole Arrow batches (payload bytes +
    metadata), decodes, and emits fixed-schema feature rows — the standard
    shape for distributed media preprocessing: partition count controls
    decode parallelism; no driver involvement; spill-free streaming per
    batch.
    """
    import pandas as pd

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"]
            ):
                payload = bytes(payload)
                checksum_w, checksum_h, feats = _decode_payload(payload)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": meta["mime"],
                        "n_bytes": len(payload),
                        "checksum": checksum_w,
                        "width": int(meta["width"]),
                        "height": int(meta["height"]),
                        "feat": feats,
                    }
                )
            if rows:  # empty Arrow batch/partition: yield nothing
                yield pd.DataFrame(rows)

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


#: Output schema of resize — binary stays binary (payload-out plumbing).
RESIZED_SCHEMA = (
    "doc_id long, payload binary, width int, height int, n_bytes long"
)


def resize_media(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize kernel over binary payloads (mapInPandas, binary in → binary
    out). The STUB 'resize' deterministically re-scales the byte length by
    the pixel ratio (so size-dependent downstream behavior is realistic);
    a real deployment replaces the kernel with PIL ``Image.resize`` /
    ``thumbnail`` and the Spark contract (RESIZED_SCHEMA) is unchanged.

    Plumbing notes that DO carry to 100 TB: payload-out schemas keep the
    data columnar end-to-end (no driver round-trip), and resize parallelism
    is partition count — repartition upstream if decode-bound.
    """
    import pandas as pd

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"]
            ):
                payload = bytes(payload)
                src_px = max(int(meta["width"]) * int(meta["height"]), 1)
                ratio = min((target_w * target_h) / src_px, 1.0)
                new_len = max(int(len(payload) * ratio), 1)
                out = (payload * (new_len // max(len(payload), 1) + 1))[:new_len]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "payload": out,
                        "width": target_w,
                        "height": target_h,
                        "n_bytes": len(out),
                    }
                )
            if rows:  # empty Arrow batch/partition: yield nothing
                yield pd.DataFrame(rows)

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


#: Frame sampling: one input row → k frame rows (one-to-many mapInPandas).
FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, frame_bytes long"


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling over 'video' payloads: each input row yields
    ``n_frames`` evenly-spaced frame rows. STUB kernel slices the payload
    into deterministic chunks; a real deployment replaces it with ffmpeg
    keyframe extraction. The one-to-many Arrow-batch shape (a single
    ``mapInPandas`` emitting more rows than it reads) is the real contract —
    the fan-out happens executor-side with no explode of pre-materialized
    arrays and no driver involvement.
    """
    import pandas as pd

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                if not payload:
                    raise NotImplementedError("empty payload: stub undefined")
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    frame = payload[i * step : i * step + step]
                    if not frame:
                        frame = payload[-step:]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "frame": frame,
                            "frame_bytes": len(frame),
                        }
                    )
            if rows:  # empty Arrow batch/partition: yield nothing
                yield pd.DataFrame(rows)

    return media.mapInPandas(frame_batches, schema=FRAME_SCHEMA)
