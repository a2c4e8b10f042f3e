"""Pure-stdlib Y4M (YUV4MPEG2) video codec.

Reference behavior: the reference pipeline hands video bytes to ffmpeg;
this container has no codecs, so the UNCOMPRESSED tier is implemented
directly. Y4M is the raw-frame interchange format real toolchains pipe
through (ffmpeg/x264/VMAF all speak it): a one-line ASCII header, then
``FRAME`` markers each followed by raw planes. Compressed containers
(MP4/WebM/MKV) return ``None`` — the caller falls back to the
metadata-digest stub, never garbage frames.

Supported: Cmono (luma only), C420/C420jpeg/C420mpeg2/C420paldv and C444,
8-bit. Only the luma plane is returned — frame-sampling feeds grayscale
stats/embedding stages; chroma is parsed (to advance correctly through
the stream) and discarded.
"""

from __future__ import annotations

import numpy as np

_Y4M_MAGIC = b"YUV4MPEG2"


def _plane_sizes(w: int, h: int, cs: str) -> list[tuple[int, int]] | None:
    """[(plane_w, plane_h), ...] for a colorspace token, or None."""
    if cs == "mono":
        return [(w, h)]
    if cs.startswith("420"):
        if w % 2 or h % 2:
            return None
        return [(w, h), (w // 2, h // 2), (w // 2, h // 2)]
    if cs.startswith("444"):
        return [(w, h), (w, h), (w, h)]
    return None  # 422/410/interlaced chroma: out of subset


def decode_y4m(payload: bytes):
    """Y4M bytes → (w, h, (fps_num, fps_den), [luma ndarray h×w, ...]),
    or ``None`` outside the supported subset."""
    data = bytes(payload)
    if not data.startswith(_Y4M_MAGIC):
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    fps = (30, 1)
    cs = "420"
    for tok in data[len(_Y4M_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        try:
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"F":
                n, d = val.split(b":")
                fps = (int(n), int(d))
            elif tag == b"C":
                cs = val.decode()
        except (ValueError, UnicodeDecodeError):
            return None
    if not w or not h or w <= 0 or h <= 0 or fps[0] <= 0 or fps[1] <= 0:
        return None
    planes = _plane_sizes(w, h, cs)
    if planes is None:
        return None
    frame_bytes = sum(pw * ph for pw, ph in planes)
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(data):
        if not data.startswith(b"FRAME", pos):
            return None
        fnl = data.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + frame_bytes > len(data):
            return None  # truncated
        y = np.frombuffer(data, dtype=np.uint8, count=w * h, offset=fnl + 1)
        frames.append(y.reshape(h, w).copy())
        pos = fnl + 1 + frame_bytes
    if not frames:
        return None
    return w, h, fps, frames


def encode_y4m(frames, fps: tuple[int, int] = (30, 1)) -> bytes:
    """List of uint8 H×W luma frames → Cmono Y4M bytes."""
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape
    out = bytearray(
        _Y4M_MAGIC + f" W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n".encode()
    )
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share one geometry")
        out += b"FRAME\n" + f.tobytes()
    return bytes(out)


def frame_at_ms(fps: tuple[int, int], n_frames: int, ts_ms: int) -> int:
    """Frame index shown at ``ts_ms`` — floor(ts·num/(1000·den)), clamped.
    Integer arithmetic so every engine picks the same frame."""
    idx = (ts_ms * fps[0]) // (1000 * fps[1])
    return min(max(idx, 0), n_frames - 1)
