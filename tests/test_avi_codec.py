"""MJPEG-AVI mux/demux + real video frame sampling (r07 — closes the last
fake media tier: frame sampling previously stub-sliced every payload
because 'no video container decodes from the stdlib'; MJPEG/AVI does,
given the in-repo JPEG decoder)."""

from __future__ import annotations

import pytest
import struct

from etl_asana_spark.operators import avi_codec as ac
from etl_asana_spark.operators import jpeg_codec as jc


def _clip(n_frames: int = 6, w: int = 9, h: int = 6) -> tuple[list[bytes], bytes]:
    frames = [
        jc.encode_jpeg(
            w, h,
            bytes((x * 10 + y * 5 + i * 37) % 256
                  for y in range(h) for x in range(w) for _ in range(3)),
            quality=92,
        )
        for i in range(n_frames)
    ]
    return frames, ac.encode_mjpeg_avi(frames, w, h, fps=5)


def test_mux_demux_roundtrip_is_byte_exact():
    frames, avi = _clip()
    assert ac.is_avi(avi)
    assert ac.demux_mjpeg_avi(avi) == frames


def test_every_demuxed_frame_decodes_as_real_jpeg():
    frames, avi = _clip(w=12, h=7)
    for f in ac.demux_mjpeg_avi(avi):
        w, h, bpp, pix = jc.decode_jpeg(f)
        assert (w, h, bpp, len(pix)) == (12, 7, 3, 12 * 7 * 3)


def test_demux_error_paths_raise_for_tier_fallthrough():
    _, avi = _clip()
    for bad in (b"", b"RIFF\x08\x00\x00\x00WAVEdata", avi[:40]):
        with pytest.raises(ValueError):
            ac.demux_mjpeg_avi(bad)
    with pytest.raises(ValueError):
        ac.encode_mjpeg_avi([], 8, 8)


@pytest.mark.slow  # ~9 s real-codec tier; opt-in (r11, see pytest.ini)
def test_sample_frames_takes_the_real_avi_tier(spark):
    """The fan-out kernel must return ACTUAL evenly-spaced DECODED frames
    for an AVI payload — rgb24 bytes, the same representation the PyAV
    tier emits (tier parity, r07 review finding) — never byte slices.
    Picking is the INCLUSIVE spread (r07 advice: the old floor-stride was
    front-biased and never sampled the clip tail): for 6 demuxed frames
    and n_frames=4 the indices are 0, 1, 3, 5 — first and LAST included.
    Discriminator: every emitted frame equals the rgb24 pixels of the
    expected demuxed JPEG, byte-for-byte."""
    from etl_asana_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, "a real motion jpeg clip", "en", "t", 23),
         (2, "second doc, different frames", "en", "t", 28)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    media = multimodal.attach_avi_payload(df, n_frames=6)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    out = multimodal.sample_frames(media, n_frames=4).collect()
    assert len(out) == 2 * 4
    for r in out:
        all_frames = ac.demux_mjpeg_avi(payloads[r["doc_id"]])
        src = all_frames[r["frame_idx"] * (len(all_frames) - 1) // 3]
        w, h, bpp, want_pix = jc.decode_jpeg(src)
        assert bpp == 3 and 4 <= w <= 16 and 3 <= h <= 9
        assert bytes(r["frame"]) == want_pix, (r["doc_id"], r["frame_idx"])
        assert r["frame_bytes"] == w * h * 3
    # The tail frame (index 5 of 6) must actually be sampled.
    tail = ac.demux_mjpeg_avi(payloads[1])[-1]
    _, _, _, tail_pix = jc.decode_jpeg(tail)
    got_last = [bytes(r["frame"]) for r in out
                if r["doc_id"] == 1 and r["frame_idx"] == 3]
    assert got_last == [tail_pix]


def test_demux_handles_rec_lists_and_nonzero_stream_ids():
    """Interleaved AVIs wrap each unit in a 'rec ' LIST, and video need
    not be stream 00 (r07 review finding): both layouts must demux to the
    same frames the flat layout yields."""
    frames, flat = _clip(4)

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    # movi with every frame inside its own 'rec ' list, video as stream 01
    movi_body = b"movi"
    for f in frames:
        rec = b"rec " + chunk(b"01dc", f)
        movi_body += chunk(b"LIST", rec)
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    assert ac.demux_mjpeg_avi(avi) == frames


def test_demux_prefers_lowest_stream_with_video_chunks():
    """Audio-first files: stream 00 may carry no video chunks at all; the
    demuxer returns the lowest-numbered stream that HAS '##dc' frames."""
    frames, _ = _clip(3)

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    movi_body = b"movi" + chunk(b"00wb", b"\x01\x02\x03\x04")  # audio data
    for f in frames:
        movi_body += chunk(b"01dc", f)
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    assert ac.demux_mjpeg_avi(avi) == frames


def test_sample_frames_stub_tier_unchanged_for_non_video(spark):
    """Non-container payloads must keep the deterministic slice behavior —
    the registered q_multimodal_frames key (PNG payloads) depends on it."""
    from etl_asana_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, "plain text payload, not a container", "en", "t", 35)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    media = multimodal.attach_binary_payload(df)
    payload = bytes(media.collect()[0]["payload"])
    out = sorted(
        multimodal.sample_frames(media, n_frames=4).collect(),
        key=lambda r: r["frame_idx"],
    )
    step = max(len(payload) // 4, 1)
    for i, r in enumerate(out):
        want = payload[i * step : i * step + step] or payload[-step:]
        assert bytes(r["frame"]) == want


def test_deeply_nested_rec_lists_raise_value_error_not_recursion_error():
    """r07 review finding: thousands of nested 'rec ' LISTs must hit the
    bounded-depth ValueError, not blow the interpreter recursion limit
    past the tier contract."""
    inner = b""
    for _ in range(3000):
        body = b"rec " + inner
        inner = b"LIST" + struct.pack("<I", len(body)) + body
        if len(body) % 2:
            inner += b"\x00"
    movi_body = b"movi" + inner
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        ac.demux_mjpeg_avi(avi)


def test_attach_and_sample_reject_nonpositive_frame_counts(spark):
    # setup OUTSIDE the raises-block so a setup failure can't masquerade
    # as a pass (r07 review finding)
    from etl_asana_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, "x", "en", "t", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    with pytest.raises(ValueError):
        multimodal.attach_avi_payload(df, n_frames=0)
    media = multimodal.attach_binary_payload(df)
    for bad in (0, -1):
        with pytest.raises(ValueError):
            multimodal.sample_frames(media, n_frames=bad)
