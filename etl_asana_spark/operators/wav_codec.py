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

import functools
import io
import os
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
    IMA-ADPCM containers (wFormatTag 0x11 — a real compressed-audio codec
    the stdlib reader rejects) take the from-scratch decoder below (r08:
    widens the real audio tier the same way MJPEG-AVI widened video).
    Raises ``wave.Error``/``ValueError`` on non-WAV or otherwise
    unsupported input (callers dispatch to the raw-PCM fallback)."""
    try:
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
    except wave.Error:
        # The stdlib reader only speaks PCM; a well-formed RIFF/WAVE whose
        # fmt tag is IMA-ADPCM is still REAL audio — decode it here. Any
        # other wave.Error (truncated/garbage container, other codecs)
        # re-raises for the callers' fallback dispatch.
        if is_wav(payload) and _fmt_tag(payload) == WAVE_FORMAT_IMA_ADPCM:
            return decode_ima_adpcm(payload)
        raise
    except RuntimeError as exc:
        # stdlib chunk.py raises a BARE RuntimeError on out-of-range seeks
        # inside truncated/mutated containers (chunk.Chunk.seek) — a
        # malformed-container condition, not a programming error. Translate
        # it into the decode contract's ValueError so the callers' narrowed
        # dispatch (r07 advice) keeps real bugs loud while mutated payloads
        # still fall to the raw-PCM tier (found by the r08 ADPCM fuzz
        # extension, which routes every mutated container through
        # _audio_read). ONLY the stdlib Chunk.seek condition translates:
        # RecursionError (a RuntimeError subclass) and any RuntimeError
        # raised outside the stdlib container parser are genuine bugs and
        # stay loud (r08 advice — verified by walking the traceback's
        # origin frame; on 3.11 the Chunk class is vendored into wave.py,
        # so both wave.py and the legacy chunk.py count as parser frames).
        if isinstance(exc, RecursionError) or not _raised_from_chunk(exc):
            raise
        raise ValueError(f"malformed RIFF chunk structure: {exc!r}") from exc


@functools.lru_cache(maxsize=1)
def _stdlib_parser_files() -> tuple[str, ...]:
    """Absolute paths of the ACTUAL imported stdlib RIFF-parser modules:
    ``wave.__file__`` always (3.11+ vendors the Chunk class there), plus
    ``chunk.__file__`` where the legacy module still exists (removed in
    3.13). Resolved from the live modules — not basenames — so a
    third-party module that happens to be called wave.py can never match
    (r09 advice: the basename check kept a bug-masking filename axis
    open). Each module contributes BOTH its ``__file__`` and the matching
    source/bytecode twin (importlib cache mapping): in a sourceless or
    frozen deployment ``__file__`` is the ``.pyc`` while a frame's
    ``co_filename`` is the compile-time ``.py`` path — without the twin
    the check would silently stop translating (r10 review). lru_cached:
    the module set is invariant for the process lifetime and the fuzz path
    routes every mutated container through this classification."""
    mods = [wave]
    try:
        import chunk as _chunk  # removed from the stdlib in 3.13

        mods.append(_chunk)
    except ImportError:
        pass
    files: list[str] = []
    for mod in mods:
        mod_file = getattr(mod, "__file__", None)
        if not mod_file:
            continue
        files.append(os.path.realpath(mod_file))
        try:
            import importlib.util as _ilu

            twin = (
                _ilu.source_from_cache(mod_file)
                if mod_file.endswith((".pyc", ".pyo"))
                else _ilu.cache_from_source(mod_file)
            )
            files.append(os.path.realpath(twin))
        except (ValueError, ImportError):
            pass
    return tuple(files)


def _raised_from_chunk(exc: BaseException) -> bool:
    """True iff the exception is the stdlib RIFF parser's out-of-range-seek
    signal: a BARE (no-args) RuntimeError whose innermost frame is the
    ``seek`` method defined in the imported ``wave`` module's file (or the
    legacy ``chunk`` module's, pre-3.13). The frame's ``co_filename`` is
    compared against those modules' resolved ``__file__`` paths — never a
    basename — so a seek in any OTHER module, whatever its filename, stays
    loud; requiring the empty args additionally keeps argumented
    RuntimeErrors raised inside the parser itself loud (r09 advice)."""
    if exc.args:
        return False
    tb = exc.__traceback__
    while tb is not None and tb.tb_next is not None:
        tb = tb.tb_next
    if tb is None:
        return False
    code = tb.tb_frame.f_code
    return (
        code.co_name == "seek"
        and os.path.realpath(code.co_filename) in _stdlib_parser_files()
    )


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


# ---------------------------------------------------------------------------
# IMA ADPCM (WAVE_FORMAT_IMA_ADPCM = 0x0011) — from-scratch decode/encode
# (r08). Implemented from the public specifications: the IMA "Recommended
# Practices for Enhancing Digital Audio Compatibility" 4:1 ADPCM algorithm
# (step/index tables and the nibble→difference reconstruction, also
# reproduced in RFC 3551 §4.5.1 for DVI4) and Microsoft's multimedia
# registration of the WAV container layout (block header = int16 predictor
# + uint8 step index + reserved byte; low nibble first; the header
# predictor IS output sample 0 of the block). No reference repo to cite:
# /root/reference is an empty snapshot (SURVEY §0).
#
# Scope (deliberate, same contract shape as the PCM16 path): mono only,
# 4-bit, any block size. Encode exists as the fixture generator (standard
# quantizer: same tables, nibble chosen by successive step halving, so
# decode∘encode error is bounded by the final step size — asserted in
# tests against the per-sample step bound, not a vague SNR).
# ---------------------------------------------------------------------------

WAVE_FORMAT_IMA_ADPCM = 0x0011

#: IMA step-size table (89 entries) and index-adjust table — public
#: constants from the IMA recommended practices.
IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _walk_riff_chunks(payload: bytes):
    """Yield (fourcc, body) for each top-level RIFF subchunk — the manual
    walk the ADPCM path needs because the stdlib reader refuses the file
    before exposing its chunks. Tolerates a truncated final chunk the way
    the stdlib reader does (yields the bytes present)."""
    pos = 12  # past RIFF<size>WAVE
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        yield fourcc, body
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _fmt_tag(payload: bytes) -> int | None:
    """The fmt chunk's wFormatTag, or None when no fmt chunk parses."""
    for fourcc, body in _walk_riff_chunks(payload):
        if fourcc == b"fmt " and len(body) >= 2:
            return struct.unpack("<H", body[:2])[0]
    return None


def _ima_step(predictor: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA reconstruction step: (new_predictor, new_index)."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    predictor = predictor - diff if nibble & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + IMA_INDEX_TABLE[nibble & 7]))
    return predictor, index


def decode_ima_adpcm(payload: bytes) -> tuple[int, list[int]]:
    """(sample_rate, samples) from a mono IMA-ADPCM RIFF/WAVE payload — a
    REAL decompression: per block, seed (predictor, index) from the 4-byte
    header (the predictor is sample 0), then reconstruct one sample per
    nibble, low nibble first. Honors the 'fact' chunk's total sample count
    when present (the container's way of marking padding nibbles in the
    final block). Raises ValueError on anything outside the mono/4-bit
    scope or on a malformed layout."""
    fmt = data = None
    fact_samples = None
    for fourcc, body in _walk_riff_chunks(payload):
        if fourcc == b"fmt " and fmt is None:
            fmt = body
        elif fourcc == b"data" and data is None:
            data = body
        elif fourcc == b"fact" and len(body) >= 4:
            (fact_samples,) = struct.unpack("<I", body[:4])
    if fmt is None or data is None:
        raise ValueError("IMA-ADPCM WAV missing fmt or data chunk")
    if len(fmt) < 16:
        raise ValueError("fmt chunk too short")
    tag, channels, rate, _brate, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if tag != WAVE_FORMAT_IMA_ADPCM:
        raise ValueError(f"not IMA-ADPCM: wFormatTag=0x{tag:04X}")
    if channels != 1 or bits != 4:
        raise ValueError(
            f"unsupported IMA-ADPCM layout: channels={channels} bits={bits} "
            "(mono 4-bit only)"
        )
    if rate <= 0:
        raise ValueError(f"non-positive WAV sample rate: {rate}")
    if block_align < 4:
        raise ValueError(f"IMA-ADPCM block_align too small: {block_align}")
    # fmt extension: cbSize (uint16 at 16) then wSamplesPerBlock (uint16 at
    # 18). A conformant encoder may emit blocks carrying FEWER samples than
    # the block's nibble capacity; without honoring it, padding nibbles
    # decode as interior garbage samples (r08 advice). Cap per-block output
    # to it when present; full-block decode otherwise.
    capacity = (block_align - 4) * 2 + 1
    spb = capacity
    if len(fmt) >= 18:
        (cb,) = struct.unpack("<H", fmt[16:18])
        if cb >= 2:
            if len(fmt) < 20:
                # cbSize PROMISES an extension the chunk doesn't carry —
                # decoding full blocks anyway would emit the padding-nibble
                # garbage this field exists to prevent (r09 review).
                raise ValueError(
                    "IMA-ADPCM fmt declares a "
                    f"{cb}-byte extension but the chunk is {len(fmt)} bytes"
                )
            (spb,) = struct.unpack("<H", fmt[18:20])
            if spb < 1 or spb > capacity:
                raise ValueError(
                    f"IMA-ADPCM wSamplesPerBlock={spb} outside [1, "
                    f"{capacity}] for block_align={block_align}"
                )

    samples: list[int] = []
    for start in range(0, len(data), block_align):
        block = data[start : start + block_align]
        if len(block) < 4:
            raise ValueError("truncated IMA-ADPCM block header")
        predictor, index = struct.unpack("<hB", block[:3])
        if index > 88:
            raise ValueError(f"IMA-ADPCM step index out of range: {index}")
        samples.append(predictor)
        emitted = 1
        for byte in block[4:]:
            if emitted >= spb:
                break
            for nibble in (byte & 0x0F, byte >> 4):  # LOW nibble first
                predictor, index = _ima_step(predictor, index, nibble)
                if emitted < spb:
                    samples.append(predictor)
                    emitted += 1
    if fact_samples is not None:
        if fact_samples > len(samples):
            raise ValueError(
                f"fact chunk claims {fact_samples} samples, "
                f"blocks decode to {len(samples)}"
            )
        samples = samples[:fact_samples]
    return rate, samples


def encode_ima_adpcm(
    sample_rate: int, samples: list[int], block_frames: int = 505
) -> bytes:
    """Mono IMA-ADPCM RIFF/WAVE bytes — the fixture generator (standard
    quantizer: pick each nibble by successive step halving, then run the
    DECODER's reconstruction to keep encoder state bit-identical to what
    the decoder will rebuild). ``block_frames`` = samples per block
    including the header sample; 505 gives the canonical 256-byte block."""
    if not samples:
        raise ValueError("cannot encode an empty sample stream")
    if sample_rate <= 0:
        raise ValueError(f"non-positive sample rate: {sample_rate}")
    if block_frames < 2:
        raise ValueError("block_frames must be >= 2")
    if (block_frames - 1) % 2:
        raise ValueError("block_frames - 1 must be even (whole bytes)")

    block_align = 4 + (block_frames - 1) // 2
    index = 0
    blocks = []
    for start in range(0, len(samples), block_frames):
        chunk = samples[start : start + block_frames]
        predictor = max(-32768, min(32767, int(chunk[0])))
        block = bytearray(struct.pack("<hBB", predictor, index, 0))
        nibbles = []
        for s in chunk[1:]:
            target = max(-32768, min(32767, int(s)))
            step = IMA_STEP_TABLE[index]
            diff = target - predictor
            nibble = 0
            if diff < 0:
                nibble = 8
                diff = -diff
            if diff >= step:
                nibble |= 4
                diff -= step
            if diff >= step >> 1:
                nibble |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nibble |= 1
            predictor, index = _ima_step(predictor, index, nibble)
            nibbles.append(nibble)
        nibbles += [0] * ((block_frames - 1) - len(nibbles))  # pad last block
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            block.append(lo | (hi << 4))
        blocks.append(bytes(block))

    data = b"".join(blocks)
    byte_rate = (sample_rate * block_align + block_frames - 1) // block_frames
    fmt = struct.pack(
        "<HHIIHHHH", WAVE_FORMAT_IMA_ADPCM, 1, sample_rate, byte_rate,
        block_align, 4, 2, block_frames,
    )
    fact = struct.pack("<I", len(samples))
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
