"""Clean-room MJPEG-in-AVI container codec (public Microsoft RIFF/AVI
spec) — closes the last decode_stub family with a REAL video decoder.

The reference treats media as opaque blobs (it has no video path at all);
the engine's multimodal surface stubs formats that need external codecs.
Motion-JPEG inside an AVI container needs none: AVI is a length-prefixed
RIFF chunk tree parseable with ``struct``, and each ``00dc`` frame chunk
is a complete baseline JPEG — which :mod:`.jpeg` already encodes and
decodes from the T.81 spec.  Codec-compressed video (H.264/VP9/AV1)
remains the honest ``decode_stub`` integration point: those entropy
coders are not implementable here and a real deployment plugs pyav in.

Layout written (and accepted) — the minimal standard-conform shape:

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' (56-byte MainAVIHeader)
        LIST 'strl'
          'strh' (56-byte AVIStreamHeader, fccType 'vids', handler 'MJPG')
          'strf' (40-byte BITMAPINFOHEADER, biCompression 'MJPG')
      LIST 'movi'
        '00dc' <jpeg bytes> ...   (word-aligned, as the spec requires)
      'idx1' (16-byte entries, AVIIF_KEYFRAME)

Scale shape: container parsing is header-walking over offsets — frame
PAYLOAD extraction never decodes pixels, so the frame-sampling operator
(:func:`multimodal.frame_sample_features`) decodes ONLY the sampled
frames.  At 100 TB that is the difference between decoding every frame
of every video and decoding one frame per sampling interval.

Reference parity: the reference has no media pipeline (README scope —
``kg_creator/src`` handles PDF text only); this module belongs to the
engine's beyond-reference training-data surface next to PNG/BMP/WAV
(`multimodal.py`) and JPEG (`jpeg.py`).
"""

from __future__ import annotations

import struct
from typing import List, Optional

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk, word-aligned (odd-length payloads get a pad byte
    that is NOT counted in the stored size — per the RIFF spec)."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: List[np.ndarray],
    fps: int = 10,
    quality: int = 95,
    subsampling: str = "444",
) -> bytes:
    """uint8 frames (all the same (H, W[, C]) shape) -> MJPEG AVI bytes.

    Each frame is JPEG-encoded via :func:`.jpeg.encode_jpeg` (so the
    flat-gray q95 exactness proof carries over frame-by-frame) and laid
    into ``00dc`` chunks with a standard ``idx1`` index."""
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    h, w = frames[0].shape[:2]
    payloads = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one (H, W) shape")
        payloads.append(encode_jpeg(f, quality=quality, subsampling=subsampling))
    max_bytes = max(len(p) for p in payloads)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,          # dwMicroSecPerFrame
        max_bytes * fps,           # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        _AVIF_HASINDEX,            # dwFlags
        len(payloads),             # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        max_bytes,                 # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIII",
            0, 0, 0,               # dwFlags, wPriority, wLanguage
            0,                     # dwInitialFrames
            1, fps,                # dwScale / dwRate -> fps
            0,                     # dwStart
            len(payloads),         # dwLength (in frames)
            max_bytes,             # dwSuggestedBufferSize
            0xFFFFFFFF,            # dwQuality (default)
        )
        + struct.pack("<I", 0)     # dwSampleSize (0: variable-size frames)
        + struct.pack("<4h", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", max_bytes, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    idx_entries = []
    for p in payloads:
        # idx1 offsets are measured from the 'movi' fourcc per convention
        idx_entries.append(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, len(movi_body), len(p))
        )
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def is_avi(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) over a chunk run,
    tolerating truncation (a short final chunk is clipped, not fatal —
    web-crawled media is routinely cut off mid-transfer)."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        start = pos + 8
        yield fourcc, start, min(size, end - start)
        pos = start + size + (size % 2)


def avi_metadata(payload: bytes) -> dict:
    """Header-only probe: width/height/fps/n_frames/duration_ms without
    touching (or decoding) any frame data."""
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    meta = {"width": 0, "height": 0, "fps": 0.0, "n_frames": 0,
            "duration_ms": 0, "handler": ""}
    usec_per_frame = 0
    for fourcc, start, size in _walk_chunks(payload, 12, len(payload)):
        if fourcc != b"LIST" or payload[start : start + 4] != b"hdrl":
            continue
        for f2, s2, z2 in _walk_chunks(payload, start + 4, start + size):
            if f2 == b"avih" and z2 >= 40:
                vals = struct.unpack_from("<10I", payload, s2)
                usec_per_frame = vals[0]
                meta["n_frames"] = vals[4]
                meta["width"], meta["height"] = vals[8], vals[9]
            elif f2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                for f3, s3, z3 in _walk_chunks(payload, s2 + 4, s2 + z2):
                    if f3 == b"strh" and z3 >= 36:
                        if payload[s3 : s3 + 4] != b"vids":
                            continue
                        meta["handler"] = payload[s3 + 4 : s3 + 8].decode(
                            "ascii", "replace"
                        )
                        scale, rate = struct.unpack_from("<II", payload, s3 + 20)
                        if scale:
                            meta["fps"] = rate / scale
    if not meta["fps"] and usec_per_frame:
        meta["fps"] = 1_000_000 / usec_per_frame
    if meta["fps"]:
        meta["duration_ms"] = int(round(meta["n_frames"] * 1000 / meta["fps"]))
    return meta


def avi_frame_payloads(
    payload: bytes, indices: Optional[List[int]] = None
) -> List[bytes]:
    """The raw JPEG bytes of each video frame chunk (``00dc``/``00db``),
    in stream order — NO pixel decoding.  ``indices`` restricts the
    result to those frame numbers (the frame-sampling fast path: the
    container walk is O(chunks), decode cost is O(len(indices)))."""
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    want = set(indices) if indices is not None else None
    out = []
    n = 0
    for fourcc, start, size in _walk_chunks(payload, 12, len(payload)):
        if fourcc != b"LIST" or payload[start : start + 4] != b"movi":
            continue
        for f2, s2, z2 in _walk_chunks(payload, start + 4, start + size):
            if f2[2:4] in (b"dc", b"db") and f2[:2].isdigit():
                if want is None or n in want:
                    out.append(payload[s2 : s2 + z2])
                n += 1
    return out


def decode_avi_mjpeg(
    payload: bytes, indices: Optional[List[int]] = None
) -> dict:
    """MJPEG AVI -> {'frames': [uint8 (H, W[, C]) arrays], 'fps',
    'n_frames', 'duration_ms', 'width', 'height'}.  ``indices`` decodes
    only those frames (sampling path)."""
    meta = avi_metadata(payload)
    frames = [decode_jpeg(p) for p in avi_frame_payloads(payload, indices)]
    return {"frames": frames, **meta}
