"""Pure-stdlib WAV (RIFF/WAVE PCM) encode/decode + integer audio features.

The audio analogue of :mod:`.png_codec` (SURVEY §2.12 #75 "multimodal"):
WAV/PCM is the one first-class training-audio container that decodes from
the Python standard library (``wave`` + ``struct``), so — unlike video,
where no stdlib decode exists and the stub tier is honest — the audio
decode path can be REAL in this dependency-less container. Payloads are
genuine RIFF/WAVE files (44-byte header, PCM16 mono frames) that any
external tool parses.

Feature math is ALL-INTEGER by design: energy = Σ s², zero crossings,
peak = max|s|, duration_ms = ⌊n·1000/rate⌋ are exact integers, so the
fixture-derived DuckDB oracle (scripts/regen_multimodal_expected.py)
compares them with zero float-drift surface — stronger than the PNG keys'
fixed-point floats.

No reference file to cite: /root/reference is an empty snapshot (SURVEY
§0); the binding spec is SURVEY §2.12 and the driver contract.
"""

from __future__ import annotations

import io
import struct
import wave

#: Synthesis constants shared by the payload generator, the pure-Python
#: fixture replay, and the SQL oracle's re-derivation (change together!).
N_SAMPLES_BASE = 128
N_SAMPLES_MOD = 241
RATES = (8000, 12000, 16000)


def is_wav(payload: bytes) -> bool:
    """RIFF container with a WAVE form type — the dispatch signature."""
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def pcm16_from_bytes(raw: bytes, n_samples: int) -> list[int]:
    """Deterministic int16 waveform from content bytes: cycle the bytes to
    length and mix each through ``(b·997 mod 65536) − 32768`` — a pure
    per-byte map (trivially replayable in SQL or numpy) whose sign varies
    across printable ASCII. A plain ``(b−128)·256`` centering would leave
    every all-ASCII document entirely negative (bytes 32–126 < 128),
    collapsing zero_crossings to 0 corpus-wide; the odd multiplier spreads
    bytes over the full int16 range so energy AND crossing counts both
    discriminate documents."""
    if not raw:
        raw = b"\x00"
    cycled = (raw * (n_samples // len(raw) + 1))[:n_samples]
    return [(b * 997) % 65536 - 32768 for b in cycled]


def synth_params(raw_len: int, doc_id: int) -> tuple[int, int]:
    """(n_samples, sample_rate) for one document — pure functions of the
    byte length and id, mirrored in SQL by the q_multimodal_audio oracle's
    join (a drifted fixture therefore drops rows and fails loudly).

    Domain note: ``doc_id`` must be ≥ 0 for the SQL mirror to hold —
    DuckDB's ``%`` keeps the dividend's sign while Python's is always
    non-negative. True of every id domain in the testdata (min doc_id = 0
    at all three scales, probed r07); assert rather than silently diverge.
    """
    if doc_id < 0:
        raise ValueError(f"doc_id must be non-negative, got {doc_id}")
    n_samples = N_SAMPLES_BASE + (max(raw_len, 1) % N_SAMPLES_MOD)
    return n_samples, RATES[doc_id % len(RATES)]


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """PCM16 mono RIFF/WAVE bytes via the stdlib ``wave`` writer."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """(sample_rate, samples) from RIFF/WAVE bytes — a REAL parse: the
    stdlib reader walks the chunk structure; struct unpacks the PCM frames.
    Raises ``wave.Error``/``ValueError`` on non-WAV or non-PCM16 input
    (callers dispatch to the raw-PCM fallback)."""
    with wave.open(io.BytesIO(payload), "rb") as r:
        if r.getsampwidth() != 2 or r.getnchannels() != 1:
            raise ValueError(
                f"unsupported WAV layout: width={r.getsampwidth()} "
                f"channels={r.getnchannels()} (PCM16 mono only)"
            )
        rate = r.getframerate()
        if rate <= 0:
            # A parseable container with fmt rate 0 would put a zero
            # divisor into every duration formula downstream; reject it
            # here so callers' never-crash dispatch falls back to the
            # raw-PCM reading (r07 review finding).
            raise ValueError(f"non-positive WAV sample rate: {rate}")
        n = r.getnframes()
        frames = r.readframes(n)
    return rate, list(struct.unpack(f"<{len(frames) // 2}h", frames))


def audio_signature(samples: list[int]) -> tuple[int, int, int]:
    """(energy, zero_crossings, peak) — exact integers.

    energy = Σ s² (≤ n·2¹⁵·2¹⁵ ≈ 4e11 for the synthesis bounds: BIGINT);
    zero_crossings counts strict sign changes with 0 counted non-negative;
    peak = max|s| (0 for an empty stream)."""
    energy = sum(s * s for s in samples)
    zc = sum(
        1
        for i in range(1, len(samples))
        if (samples[i - 1] < 0) != (samples[i] < 0)
    )
    peak = max((abs(s) for s in samples), default=0)
    return energy, zc, peak
