"""Regenerate the committed multimodal expected-output fixtures.

Usage:  python scripts/regen_multimodal_expected.py [--check-only]

Produces ``fixtures/multimodal_expected_{features,resize,frames}.ndjson``:
the golden rows the q_multimodal / q_multimodal_resize / q_multimodal_frames
DuckDB oracles read (r06 verdict item 1 — the last rows-only keys gain full
SQL-hash checks).

Every fixture row is the AGREED output of two implementations:

1. :func:`expected_rows` below — a pure-Python replay of the deterministic
   text → PNG-encode → decode → luma/resize/slice pipeline, driven directly
   off the parquet bytes with no Spark involved;
2. the registered Spark queries themselves (mapInPandas over Arrow batches).

The script runs BOTH for every sf dir and refuses to write on any
disagreement, so a committed fixture can never encode a Spark-plumbing bug
as "expected". Rows are keyed by ``(doc_id, md5(text))`` and generated for
all three testdata scales, so the oracles work at whichever sf_dir a sweep
points at (the external gate uses sf0.01).

Run this after any testdata regeneration (tests/test_multimodal_oracle.py
fails loudly when the committed fixtures no longer match the parquet), and
after any intentional kernel change.
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_asana_spark.operators import png_codec  # noqa: E402

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)
FIXTURES = Path(__file__).resolve().parents[1] / "fixtures"


def _fixed_point(values: list[float], scale: int = 1_000_000) -> str:
    """Pure-Python twin of functions.parity.fixed_point_join on a FLOAT
    column: the engine's array<float> schema quantizes each value to
    float32 before the floor(x*scale + 0.5) boundary rounding."""
    out = []
    for v in values:
        f32 = float(np.float32(v))
        out.append(str(int(math.floor(f32 * scale + 0.5))))
    return "|".join(out)


def expected_rows(doc_id: int, text: str) -> tuple[dict, dict, list[dict]]:
    """Pure-Python replay of the three multimodal kernels for one document:
    (features row, resize row, frame rows). Mirrors
    operators.multimodal.attach_png_payload / _decode_payload /
    resize_media / sample_frames byte-for-byte."""
    raw = text.encode("utf-8") or b"\x00"
    md5 = hashlib.md5(text.encode("utf-8")).hexdigest()
    w = 4 + (len(raw) % 13)
    h = 3 + (len(raw) % 7)
    need = w * h * 3
    pix = (raw * (need // len(raw) + 1))[:need]
    payload = png_codec.encode_png(w, h, pix, color_type=2, filter_type=doc_id % 5)

    # features: decode (round-trips to the same pixels) → luma signature
    dw, dh, bpp, dpix = png_codec.decode_png(payload)
    assert (dw, dh, bpp, bytes(dpix)) == (w, h, 3, bytes(pix)), doc_id
    feat = png_codec.luma_signature(w, h, 3, pix)
    features = {
        "doc_id": doc_id,
        "media_type": "image/png",
        "n_bytes": len(payload),
        "checksum": w,
        "width": w,
        "height": h,
        "feat": _fixed_point(feat),
        "text_md5": md5,
    }

    # resize: nearest-neighbor resample → re-encode (filter 0, RGB)
    rp = png_codec.encode_png(
        224, 224, png_codec.resize_nearest(w, h, 3, pix, 224, 224), color_type=2
    )
    resize = {
        "doc_id": doc_id,
        "width": 224,
        "height": 224,
        "n_bytes": len(rp),
        "payload_sha": hashlib.sha256(rp).hexdigest(),
        "text_md5": md5,
    }

    # frames: 4 deterministic payload slices (the stub tier — no ffmpeg)
    step = max(len(payload) // 4, 1)
    frames = []
    for i in range(4):
        frame = payload[i * step : i * step + step] or payload[-step:]
        frames.append(
            {
                "doc_id": doc_id,
                "frame_idx": i,
                "frame_bytes": len(frame),
                "frame_sha": hashlib.sha256(frame).hexdigest(),
                "text_md5": md5,
            }
        )
    return features, resize, frames


def expected_audio_row(doc_id: int, text: str) -> dict:
    """Pure-Python replay of the r07 audio kernel for one document: WAV
    synthesis → stdlib decode round-trip → integer signature. Mirrors
    operators.multimodal.attach_wav_payload / extract_audio_features
    byte-for-byte (and asserts the container round-trips)."""
    from etl_asana_spark.operators import wav_codec

    raw = text.encode("utf-8") or b"\x00"
    md5 = hashlib.md5(text.encode("utf-8")).hexdigest()
    n_samples, rate = wav_codec.synth_params(len(raw), doc_id)
    samples = wav_codec.pcm16_from_bytes(raw, n_samples)
    payload = wav_codec.encode_wav(rate, samples)
    drate, dsamples = wav_codec.decode_wav(payload)
    assert (drate, dsamples) == (rate, samples), doc_id
    energy, zc, peak = wav_codec.audio_signature(dsamples)
    return {
        "doc_id": doc_id,
        "media_type": "audio/wav",
        "n_bytes": len(payload),
        "sample_rate": rate,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // rate,
        "energy": energy,
        "zero_crossings": zc,
        "peak": peak,
        "text_md5": md5,
    }


def pure_python_expected(
    sf_dir: str,
) -> tuple[list[dict], list[dict], list[dict], list[dict]]:
    """Replay the kernels over one sf dir's documents parquet (via DuckDB —
    no Spark)."""
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "WHERE text IS NOT NULL ORDER BY doc_id"
    ).fetchall()
    feats, resizes, frames, audios = [], [], [], []
    for doc_id, text in rows:
        f, r, fr = expected_rows(int(doc_id), text)
        feats.append(f)
        resizes.append(r)
        frames.extend(fr)
        audios.append(expected_audio_row(int(doc_id), text))
    return feats, resizes, frames, audios


def _spark_rows(spark, key: str, sf_dir: str) -> list[dict]:
    from etl_asana_spark import catalog

    pdf = catalog.queries()[key](spark, sf_dir).toPandas()
    return [
        {k: (int(v) if hasattr(v, "item") and not isinstance(v, str) else v)
         for k, v in rec.items()}
        for rec in pdf.to_dict(orient="records")
    ]


def cross_check(spark, sf_dir: str, feats, resizes, frames, audios) -> None:
    """Assert the Spark pipeline output equals the pure-Python replay
    (ignoring the text_md5 fixture key, which the queries don't emit)."""
    def strip(rows, sort_key):
        return sorted(
            ({k: v for k, v in r.items() if k != "text_md5"} for r in rows),
            key=sort_key,
        )

    by_doc = lambda r: (r["doc_id"],)
    by_frame = lambda r: (r["doc_id"], r["frame_idx"])
    checks = (
        ("q_multimodal", feats, by_doc),
        ("q_multimodal_resize", resizes, by_doc),
        ("q_multimodal_frames", frames, by_frame),
        ("q_multimodal_audio", audios, by_doc),
    )
    for key, pure, sort_key in checks:
        got = strip(_spark_rows(spark, key, sf_dir), sort_key)
        want = strip(pure, sort_key)
        if got != want:
            diffs = [(g, w) for g, w in zip(got, want) if g != w][:3]
            raise SystemExit(
                f"DISAGREEMENT {key} at {sf_dir}: {len(diffs)}+ rows differ; "
                f"first: {diffs}"
            )
        print(f"  {key}: Spark == pure-Python ({len(want)} rows)")


def main() -> int:
    check_only = "--check-only" in sys.argv

    all_feats: dict[tuple, dict] = {}
    all_resizes: dict[tuple, dict] = {}
    all_frames: dict[tuple, dict] = {}
    all_audios: dict[tuple, dict] = {}
    per_sf = {}
    for sf_dir in SF_DIRS:
        feats, resizes, frames, audios = pure_python_expected(sf_dir)
        per_sf[sf_dir] = (feats, resizes, frames, audios)
        for f in feats:
            all_feats[(f["doc_id"], f["text_md5"])] = f
        for r in resizes:
            all_resizes[(r["doc_id"], r["text_md5"])] = r
        for fr in frames:
            all_frames[(fr["doc_id"], fr["text_md5"], fr["frame_idx"])] = fr
        for a in audios:
            all_audios[(a["doc_id"], a["text_md5"])] = a
        print(f"{sf_dir}: {len(feats)} docs replayed")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in SF_DIRS:
        print(f"cross-checking Spark pipeline at {sf_dir} ...")
        cross_check(spark, sf_dir, *per_sf[sf_dir])

    if check_only:
        print("check-only: fixtures not rewritten")
        return 0

    outputs = (
        ("multimodal_expected_features.ndjson", all_feats),
        ("multimodal_expected_resize.ndjson", all_resizes),
        ("multimodal_expected_frames.ndjson", all_frames),
        ("multimodal_expected_audio.ndjson", all_audios),
    )
    for name, rows in outputs:
        path = FIXTURES / name
        with open(path, "w") as fh:
            for key in sorted(rows):
                fh.write(json.dumps(rows[key], sort_keys=True) + "\n")
        print(f"wrote {path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
