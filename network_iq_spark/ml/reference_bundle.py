"""Structural reader for the reference's joblib model bundle (M4/M6 parity).

The reference ships ``data/models/next_hour_congestion.joblib`` — a joblib
pickle of ``{model, num_cols, cat_cols, label_rule, trained_at, metrics}``
(consumed at streamlit_app.py:727-737). This container has neither joblib
nor sklearn nor xgboost, so the bundle can't be *executed* here — but its
STRUCTURE (feature layout, label rule, recorded metrics) is plain pickle
data and is exactly what the engine must stay contract-compatible with.

This module implements a tolerant unpickler that:

- resolves importable globals normally (numpy is present);
- substitutes a generic stub class for any unimportable global (sklearn/
  xgboost estimator classes), capturing their ``__setstate__`` dicts;
- replicates joblib's ``NumpyArrayWrapper`` on-disk framing — the one piece
  of joblib-specific behavior: after the wrapper object is BUILt, the raw
  array payload follows inline in the stream (1 alignment-length byte +
  padding + C-order buffer for numeric dtypes; a nested pickle for object
  dtypes), which a vanilla unpickler cannot skip.

The framing logic mirrors the public joblib implementation
(``joblib/numpy_pickle.py``; BSD-licensed, reimplemented from the
documented format, not copied).
"""

from __future__ import annotations

import io
import pickle
from functools import reduce
from operator import mul

import numpy as np


class _Stub:
    """Generic stand-in for an unimportable pickled class. Captures
    positional args and ``__setstate__`` payloads as attributes."""

    _qualname = "?"

    def __new__(cls, *args, **kwargs):  # NEWOBJ / REDUCE tolerant
        return super().__new__(cls)

    def __init__(self, *args, **kwargs):
        self._args = args
        self._kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self._state = state

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<stub {self._qualname}>"


class _NumpyArrayWrapperStub(_Stub):
    """Stub for ``joblib.numpy_pickle.NumpyArrayWrapper`` that knows how to
    consume the out-of-band array payload that joblib writes immediately
    after the wrapper's pickle ops."""

    def read_array(self, fh) -> np.ndarray:
        dtype = self.__dict__["dtype"]
        shape = tuple(self.__dict__.get("shape", ()))
        order = self.__dict__.get("order", "C")
        if dtype.hasobject:
            # object arrays are a nested pickle in the same stream —
            # joblib writes NO alignment padding for these even when the
            # wrapper carries numpy_array_alignment_bytes
            return _TolerantUnpickler(fh).load()
        if getattr(self, "numpy_array_alignment_bytes", None):
            pad = int.from_bytes(fh.read(1), "little")
            if pad:
                fh.read(pad)
        count = reduce(mul, shape, 1)
        data = fh.read(int(count) * dtype.itemsize)
        arr = np.frombuffer(data, dtype=dtype, count=count).copy()
        if order == "F":
            arr.shape = shape[::-1]
            arr = arr.transpose()
        else:
            arr.shape = shape
        return arr


class _TolerantUnpickler(pickle._Unpickler):
    dispatch = pickle._Unpickler.dispatch.copy()

    def __init__(self, file_handle):
        super().__init__(file_handle)
        self._file_handle = file_handle

    def find_class(self, module: str, name: str):
        if module == "joblib.numpy_pickle" and name == "NumpyArrayWrapper":
            return _NumpyArrayWrapperStub
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            stub = type(name, (_Stub,), {"_qualname": f"{module}.{name}"})
            return stub

    def load_build(self):
        pickle._Unpickler.load_build(self)
        top = self.stack[-1]
        if isinstance(top, _NumpyArrayWrapperStub):
            self.stack[-1] = top.read_array(self._file_handle)


_TolerantUnpickler.dispatch[pickle.BUILD[0]] = _TolerantUnpickler.load_build


def load_reference_bundle(path: str) -> dict:
    """Load a joblib bundle structurally: real python/numpy values
    everywhere, stub objects for unimportable estimator classes."""
    with open(path, "rb") as f:
        data = f.read()
    return _TolerantUnpickler(io.BytesIO(data)).load()
