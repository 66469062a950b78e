"""Multimodal (image/audio/video) column plumbing (SURVEY §2.12 #75).

Design: media payloads are opaque ``binary`` columns + a typed metadata
struct, exactly as a 100 TB training pipeline carries them (payload bytes
co-located with row metadata in parquet; heavy decode work happens in
Arrow-batched Python, not the JVM).

The decode kernels themselves (JPEG decode, resampling, frame sampling)
require media libraries that are NOT in this container. Kernel dispatch is
optional-import (round-3): when PIL is importable and the payload parses as
a real image, ``_decode_payload`` / the resize kernel run the REAL
PIL-backed path; otherwise they fall back to a clearly-marked deterministic
stub that preserves every real aspect of the Spark plumbing (schema, batch
iteration, partition behavior, UDF signature). In this container PIL is
absent and the synthetic fixtures are UTF-8 text bytes, so execution always
lands on the stub — but an environment with PIL + real media runs real
kernels with zero code changes (dispatch is tested by module injection in
tests/test_llm_ops.py). Frame sampling's real path needs an ffmpeg binding
(``av``), gated the same way.
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _optional(name: str):
    """Import ``name`` if present, else None — kernel dispatch helper.

    Resolved at call time (inside the Arrow-batch functions, i.e. on the
    EXECUTOR) so a cluster where workers have PIL but the driver doesn't —
    or vice versa — behaves per-process, and tests can inject fakes."""
    try:
        return importlib.import_module(name)
    except ImportError:
        return None

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


def _decode_payload_real(payload: bytes, pil_image) -> tuple[int, int, list[float]]:
    """REAL decode kernel (used when PIL is importable and the bytes parse):
    decodes the image, downsamples to an 8-value grayscale intensity
    signature — same (width, height, feat[8]) contract as the stub."""
    import io

    img = pil_image.open(io.BytesIO(payload))
    img.load()
    w, h = img.size
    gray = img.convert("L").resize((8, 1))
    feats = [float(v) / 255.0 for v in list(gray.getdata())]
    return w, h, feats


def _decode_payload_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decode kernel — deterministic fake standing in for a real
    image/audio decoder when PIL is absent (this container) or the payload
    is not real media (the synthetic text-byte fixtures).

    Returns (width, height, feature_vector). The fake derives 8 'features'
    from byte statistics so tests get stable, content-sensitive values.
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


def _decode_payload(payload: bytes) -> tuple[int, int, list[float]]:
    """Kernel dispatch: real PIL decode when available and the bytes are a
    parseable image, deterministic stub otherwise (absent lib, or synthetic
    non-image fixtures — the fallback keeps CI/container runs green while a
    production cluster with PIL + real media takes the real path)."""
    pil = _optional("PIL.Image")
    if pil is not None and payload:
        try:
            return _decode_payload_real(payload, pil)
        except Exception:  # not parseable media → stub
            pass
    return _decode_payload_stub(payload)


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
                if payload is None or meta is None:
                    # No payload/metadata (failed upstream fetch): nothing
                    # to decode — skip the row, never crash the batch.
                    continue
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

    def _resize_real(payload: bytes, pil) -> bytes | None:
        """PIL path: decode → resize → re-encode PNG; None if not media."""
        import io

        try:
            img = pil.open(io.BytesIO(payload))
            img.load()
        except Exception:
            return None
        buf = io.BytesIO()
        img.resize((target_w, target_h)).save(buf, format="PNG")
        return buf.getvalue()

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = _optional("PIL.Image")
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"]
            ):
                if payload is None or meta is None:
                    # No payload/metadata (failed upstream fetch): nothing
                    # to decode — skip the row, never crash the batch.
                    continue
                payload = bytes(payload)
                out = _resize_real(payload, pil) if (pil and payload) else None
                if out is None:  # stub: re-scale byte length by pixel ratio
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

    def _frames_real(payload: bytes, av) -> list[bytes] | None:
        """PyAV path: demux, take ``n_frames`` evenly-spaced video frames,
        emit raw RGB bytes; None when the payload is not a real container."""
        import io

        try:
            with av.open(io.BytesIO(payload)) as container:
                decoded = [f for f in container.decode(video=0)]
        except Exception:
            return None
        if not decoded:
            return None
        step = max(len(decoded) // n_frames, 1)
        picked = [decoded[min(i * step, len(decoded) - 1)] for i in range(n_frames)]
        return [f.to_ndarray(format="rgb24").tobytes() for f in picked]

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        av = _optional("av")
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # nothing to sample from (see decode_batches)
                payload = bytes(payload)
                if not payload:
                    raise NotImplementedError("empty payload: stub undefined")
                frames = _frames_real(payload, av) if av else None
                if frames is None:  # stub: deterministic payload slices
                    step = max(len(payload) // n_frames, 1)
                    frames = [
                        payload[i * step : i * step + step] or payload[-step:]
                        for i in range(n_frames)
                    ]
                for i, frame in enumerate(frames):
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
