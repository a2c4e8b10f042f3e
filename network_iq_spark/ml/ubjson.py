"""Minimal UBJSON decoder (Draft-12, ubjson.org) — enough to read an
XGBoost ``save_raw(raw_format="ubj")`` model blob without xgboost.

XGBoost ≥ 1.7 pickles its ``Booster`` as a UBJSON byte buffer (the
``handle`` slot of the pickled Booster); the reference's shipped bundle
``data/models/next_hour_congestion.joblib`` carries exactly that
(consumed at streamlit_app.py:727-737 via ``predict_proba``).  The UBJSON
wire format is a public spec; this is a from-scratch implementation of
the subset XGBoost emits:

- scalars: Z N T F i U I l L d D C S H (numerics big-endian)
- containers: ``[`` / ``{`` with optional ``$<type>`` + ``#<count>``
  strongly-typed headers; typed numeric arrays are decoded straight into
  numpy via ``np.frombuffer`` (big-endian dtypes) so the 200-tree model
  loads in milliseconds.
"""

from __future__ import annotations

import struct

import numpy as np

# marker -> (struct format, byte width) for scalar numerics (big-endian)
_NUM = {
    b"i": (">b", 1),
    b"U": (">B", 1),
    b"I": (">h", 2),
    b"l": (">i", 4),
    b"L": (">q", 8),
    b"d": (">f", 4),
    b"D": (">d", 8),
}

# marker -> numpy dtype for strongly-typed array payloads
_NP = {
    b"i": ">i1",
    b"U": ">u1",
    b"I": ">i2",
    b"l": ">i4",
    b"L": ">i8",
    b"d": ">f4",
    b"D": ">f8",
}


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("ubjson: truncated stream")
        self.pos += n
        return out

    def marker(self) -> bytes:
        m = self.take(1)
        while m == b"N":  # no-op
            m = self.take(1)
        return m

    def int_value(self, m: bytes | None = None) -> int:
        m = m or self.marker()
        fmt = _NUM.get(m)
        if fmt is None or m in (b"d", b"D"):
            raise ValueError(f"ubjson: expected integer marker, got {m!r}")
        return struct.unpack(fmt[0], self.take(fmt[1]))[0]

    def string(self) -> str:
        return self.take(self.int_value()).decode("utf-8")

    def value(self, m: bytes | None = None):
        m = m or self.marker()
        if m == b"{":
            return self.obj()
        if m == b"[":
            return self.array()
        if m == b"S" or m == b"H":
            return self.string()
        if m == b"T":
            return True
        if m == b"F":
            return False
        if m == b"Z":
            return None
        if m == b"C":
            return self.take(1).decode("latin-1")
        fmt = _NUM.get(m)
        if fmt is None:
            raise ValueError(f"ubjson: unknown marker {m!r} at {self.pos}")
        return struct.unpack(fmt[0], self.take(fmt[1]))[0]

    def _container_header(self) -> tuple[bytes | None, int | None]:
        typ = count = None
        m = self.marker()
        if m == b"$":
            typ = self.take(1)
            m = self.marker()
        if m == b"#":
            count = self.int_value()
            return typ, count
        if typ is not None:
            raise ValueError("ubjson: typed container missing count")
        # not a header — rewind one byte so the caller re-reads the marker
        self.pos -= 1
        return None, None

    def array(self):
        typ, count = self._container_header()
        if typ is not None:
            np_t = _NP.get(typ)
            if np_t is not None:
                width = np.dtype(np_t).itemsize
                arr = np.frombuffer(self.take(count * width), dtype=np_t)
                return arr.astype(np_t[1:])  # native byte order
            if typ in (b"T", b"F"):
                return np.full(count, typ == b"T", dtype=bool)
            return [self.value(typ) for _ in range(count)]
        if count is not None:
            return [self.value() for _ in range(count)]
        out = []
        while True:
            m = self.marker()
            if m == b"]":
                return out
            out.append(self.value(m))

    def obj(self):
        typ, count = self._container_header()
        out = {}
        if count is not None:
            for _ in range(count):
                key = self.string()  # key BEFORE value: RHS of a subscript
                out[key] = self.value(typ)  # assignment evaluates first
            return out
        while True:
            m = self.marker()
            if m == b"}":
                return out
            self.pos -= 1
            key = self.string()
            out[key] = self.value()


def loads(buf: bytes | bytearray):
    """Decode one UBJSON document from ``buf``."""
    return _Reader(bytes(buf)).value()
