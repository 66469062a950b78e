"""Pure-stdlib MJPEG-in-AVI container mux/demux.

Closes the LAST fake media tier (SURVEY §2.12 #75): frame sampling's real
path previously required an ffmpeg binding because "no sane video
container decodes from the stdlib" — but Motion-JPEG inside AVI does: AVI
is RIFF (the same chunk grammar as WAV, parsed here with ``struct``
alone), and each ``00dc`` chunk is a complete baseline JPEG that
:mod:`.jpeg_codec` decodes for real. Modern codecs (H.264/VP9/AV1) still
genuinely need ffmpeg; MJPEG/AVI is the honest stdlib-real subset — and a
format actual crawl corpora contain (old camera footage, surveillance
clips, scientific capture rigs).

Layout written/read (RIFF per the public AVI spec):

    RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
               LIST('movi' 00dc...)
               idx1)

The demuxer is deliberately lenient where real-world AVIs vary: it walks
the top-level chunks, finds the 'movi' LIST, and collects '00dc'/'00db'
chunk payloads in order, tolerating missing idx1 — frame COUNT truth is
the movi list, not the header.

Reference-repo note: /root/reference is an empty snapshot (SURVEY §0);
the binding spec is SURVEY §2.12 and the public AVI/RIFF documentation.
"""

from __future__ import annotations

import struct


def is_avi(payload: bytes) -> bool:
    """RIFF container with an 'AVI ' form type — the dispatch signature."""
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + size + body + pad byte to even length."""
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_mjpeg_avi(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Mux complete JPEG images into a minimal playable MJPEG AVI."""
    if not frames:
        raise ValueError("at least one frame required")
    if fps <= 0:
        raise ValueError("fps must be positive")
    max_bytes = max(len(f) for f in frames)

    # avih: MicroSecPerFrame, MaxBytesPerSec, Padding, Flags(HASINDEX),
    # TotalFrames, InitialFrames, Streams, SuggestedBufferSize, Width,
    # Height, reserved[4]
    avih = struct.pack(
        "<14I",
        1_000_000 // fps, max_bytes * fps, 0, 0x10,
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    # strh: fccType 'vids', fccHandler 'MJPG', flags, prio+lang, initial,
    # scale, rate, start, length, bufsize, quality, samplesize, rcFrame
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IIIIIIIIII", 0, 0, 0, 1, fps, 0, len(frames),
                      max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    # strf: BITMAPINFOHEADER with biCompression 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of the 00dc fourcc - 4
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)

    idx1 = b""
    for f, off in zip(frames, offsets):
        # ckid, dwFlags(KEYFRAME), dwChunkOffset (relative to 'movi'), size
        idx1 += b"00dc" + struct.pack("<III", 0x10, off, len(f))
    idx1 = _chunk(b"idx1", idx1)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _collect_movi(
    payload: bytes,
    start: int,
    end: int,
    per_stream: dict[bytes, list[bytes]],
    depth: int = 0,
) -> None:
    """Walk one movi (or nested 'rec ') list body, collecting '##dc'/'##db'
    chunk payloads per stream id. Interleaved AVIs group each interleave
    unit in a 'rec ' LIST (the AVIFile/VirtualDub layout) — recurse into
    those rather than skipping them (r07 review finding). The spec nests
    'rec ' at most one level under movi; allow a little slack but BOUND
    the depth, because a crafted file with thousands of nested LISTs
    would otherwise raise RecursionError past the ValueError-only tier
    contract (r07 review finding #2)."""
    if depth > 4:
        raise ValueError("rec-list nesting beyond spec depth")
    ipos = start
    while ipos + 8 <= end:
        ckid = payload[ipos : ipos + 4]
        cksz = struct.unpack("<I", payload[ipos + 4 : ipos + 8])[0]
        cstart = ipos + 8
        if cstart + cksz > end:
            raise ValueError("truncated movi chunk")
        if ckid == b"LIST" and payload[cstart : cstart + 4] == b"rec ":
            _collect_movi(payload, cstart + 4, cstart + cksz, per_stream,
                          depth + 1)
        elif (
            ckid[:2].isdigit()
            and ckid[2:] in (b"dc", b"db")
        ):
            per_stream.setdefault(ckid[:2], []).append(
                payload[cstart : cstart + cksz]
            )
        ipos = cstart + cksz + (cksz % 2)  # even padding


def demux_mjpeg_avi(payload: bytes) -> list[bytes]:
    """Extract the ordered video frame payloads ('##dc'/'##db' chunks in
    the 'movi' LIST, including inside 'rec ' interleave groups) from an
    AVI. When several streams carry frames (e.g. audio is stream 00 and
    video is 01), returns the lowest-numbered stream that actually has
    video chunks. Raises ValueError on non-AVI input or a container
    without a movi list — callers fall through to the next tier."""
    if not is_avi(payload):
        raise ValueError("not an AVI (no RIFF/'AVI ' header)")
    riff_end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    pos = 12
    per_stream: dict[bytes, list[bytes]] = {}
    found_movi = False
    while pos + 8 <= riff_end:
        fourcc = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body_start = pos + 8
        body_end = body_start + size
        if body_end > len(payload):
            raise ValueError("truncated AVI chunk")
        if fourcc == b"LIST" and payload[body_start : body_start + 4] == b"movi":
            found_movi = True
            _collect_movi(payload, body_start + 4, body_end, per_stream)
        pos = body_end + (size % 2)
    if not found_movi:
        raise ValueError("no movi list in AVI")
    if not per_stream:
        return []
    return per_stream[min(per_stream)]
