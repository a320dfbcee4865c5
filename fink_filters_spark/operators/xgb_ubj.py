"""Minimal UBJSON reader/writer + XGBoost tree-ensemble predictor (numpy).

The reference ships packaged XGBoost ``.ubj`` classifiers and scores
candidates with them (``ztf/filter_early_tde_candidates/filter.py:79-85,
203-218``). The xgboost wheel is not installed in this container, so this
module implements the two public formats needed to serve such a model
anyway:

- UBJSON (https://ubjson.org, the container format of ``.ubj``): value
  types Z/T/F/i/U/I/l/L/d/D/C/S/H, arrays/objects with optional ``$type``
  and ``#count`` optimizations, big-endian numerics. ``ubjson_loads`` /
  ``ubjson_dumps`` cover the subset XGBoost emits (which is plain UBJSON).
- The XGBoost UBJ/JSON model schema
  (https://xgboost.readthedocs.io/en/stable/tutorials/saving_model.html):
  ``learner.gradient_booster.model.trees[*]`` with parallel arrays
  ``split_indices`` / ``split_conditions`` / ``left_children`` /
  ``right_children`` / ``default_left``; a node is a leaf when
  ``left_children[j] == -1``, and a leaf's value is stored in
  ``split_conditions[j]``. Prediction sums leaf values over trees and
  applies the objective's link (sigmoid for ``binary:logistic``).

``XGBEnsemble`` plugs into ``operators/ml.predict_proba`` via
``predict_proba_batch`` — broadcast once, score Arrow batches vectorized.
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------------
# UBJSON parsing
# ---------------------------------------------------------------------------

_FIXED = {
    0x69: ("b", 1),   # i int8
    0x55: ("B", 1),   # U uint8
    0x49: (">h", 2),  # I int16
    0x6C: (">i", 4),  # l int32
    0x4C: (">q", 8),  # L int64
    0x64: (">f", 4),  # d float32
    0x44: (">d", 8),  # D float64
}
_INT_MARKS = (0x69, 0x55, 0x49, 0x6C, 0x4C)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def fixed(self, mark: int):
        fmt, size = _FIXED[mark]
        v = struct.unpack_from(fmt, self.buf, self.pos)[0]
        self.pos += size
        return v

    def length(self) -> int:
        mark = self.byte()
        if mark not in _INT_MARKS:
            raise ValueError(f"ubjson: bad length marker 0x{mark:02x}")
        return self.fixed(mark)

    def string(self) -> str:
        n = self.length()
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += n
        return s

    def value(self, mark: int | None = None):
        if mark is None:
            mark = self.byte()
        if mark in _FIXED:
            return self.fixed(mark)
        if mark == 0x5A:  # Z
            return None
        if mark == 0x54:  # T
            return True
        if mark == 0x46:  # F
            return False
        if mark == 0x43:  # C
            return chr(self.byte())
        if mark in (0x53, 0x48):  # S / H (high-precision rides as string)
            return self.string()
        if mark == 0x5B:  # [
            return self.array()
        if mark == 0x7B:  # {
            return self.obj()
        raise ValueError(f"ubjson: unknown marker 0x{mark:02x}")

    def _container_header(self):
        """Optional $type and #count; returns (elem_mark, count)."""
        elem_mark, count = None, None
        if self.pos < len(self.buf) and self.buf[self.pos] == 0x24:  # $
            self.pos += 1
            elem_mark = self.byte()
        if self.pos < len(self.buf) and self.buf[self.pos] == 0x23:  # #
            self.pos += 1
            count = self.length()
        elif elem_mark is not None:
            raise ValueError("ubjson: $type without #count")
        return elem_mark, count

    def array(self):
        elem_mark, count = self._container_header()
        out = []
        if count is not None:
            for _ in range(count):
                out.append(self.value(elem_mark))
            return out
        while True:
            mark = self.byte()
            if mark == 0x5D:  # ]
                return out
            out.append(self.value(mark))

    def obj(self):
        elem_mark, count = self._container_header()
        out = {}
        # NB: key must be parsed before the value — Python evaluates the
        # RHS of `out[k()] = v()` first, which would read them in the
        # wrong order
        if count is not None:
            for _ in range(count):
                key = self.string()
                out[key] = self.value(elem_mark)
            return out
        while True:
            if self.buf[self.pos] == 0x7D:  # }
                self.pos += 1
                return out
            key = self.string()
            out[key] = self.value(elem_mark)


def ubjson_loads(payload: bytes):
    return _Reader(payload).value()


# ---------------------------------------------------------------------------
# UBJSON writing (enough to craft model fixtures / round-trip tests)
# ---------------------------------------------------------------------------


def _write_int(out: bytearray, v: int) -> None:
    if -128 <= v < 128:
        out += b"i" + struct.pack("b", v)
    elif 0 <= v < 256:
        out += b"U" + struct.pack("B", v)
    elif -(2**15) <= v < 2**15:
        out += b"I" + struct.pack(">h", v)
    elif -(2**31) <= v < 2**31:
        out += b"l" + struct.pack(">i", v)
    else:
        out += b"L" + struct.pack(">q", v)


def _write(out: bytearray, v) -> None:
    if v is None:
        out += b"Z"
    elif v is True:
        out += b"T"
    elif v is False:
        out += b"F"
    elif isinstance(v, int):
        _write_int(out, v)
    elif isinstance(v, float):
        out += b"D" + struct.pack(">d", v)
    elif isinstance(v, str):
        out += b"S"
        enc = v.encode("utf-8")
        _write_int(out, len(enc))
        out += enc
    elif isinstance(v, (list, tuple)):
        out += b"["
        for x in v:
            _write(out, x)
        out += b"]"
    elif isinstance(v, dict):
        out += b"{"
        for k, x in v.items():
            enc = str(k).encode("utf-8")
            _write_int(out, len(enc))
            out += enc
            _write(out, x)
        out += b"}"
    else:
        raise TypeError(f"ubjson_dumps: unsupported type {type(v)}")


def ubjson_dumps(obj) -> bytes:
    out = bytearray()
    _write(out, obj)
    return bytes(out)


# ---------------------------------------------------------------------------
# XGBoost tree-ensemble predictor
# ---------------------------------------------------------------------------


class XGBEnsemble:
    """Vectorized numpy predictor over a parsed XGBoost UBJ/JSON model.

    Supports the single-output tree ensembles the reference packages:
    margin = sum over trees of the reached leaf's value; ``binary:logistic``
    applies a sigmoid on (margin + logit(base_score)), regression
    objectives add base_score directly. NaN features follow
    ``default_left``. Broadcast-friendly: plain numpy arrays, no JVM or
    xgboost dependency.
    """

    def __init__(self, trees: list[dict], base_score: float, objective: str):
        import numpy as np

        self.objective = objective
        self.base_score = float(base_score)
        self._trees = []
        for t in trees:
            self._trees.append(
                (
                    np.asarray(t["split_indices"], dtype=np.int64),
                    np.asarray(t["split_conditions"], dtype=np.float64),
                    np.asarray(t["left_children"], dtype=np.int64),
                    np.asarray(t["right_children"], dtype=np.int64),
                    np.asarray(t["default_left"], dtype=bool),
                )
            )

    # -- loading -----------------------------------------------------------

    @classmethod
    def from_ubj(cls, payload: bytes) -> "XGBEnsemble":
        return cls.from_model_dict(ubjson_loads(payload))

    @classmethod
    def from_file(cls, path: str) -> "XGBEnsemble":
        with open(path, "rb") as f:
            return cls.from_ubj(f.read())

    @classmethod
    def from_model_dict(cls, doc: dict) -> "XGBEnsemble":
        learner = doc["learner"]
        trees = learner["gradient_booster"]["model"]["trees"]
        # learner_model_param values are strings in the schema
        base = float(learner["learner_model_param"]["base_score"])
        objective = learner.get("objective", {}).get("name", "reg:squarederror")
        return cls(trees, base, objective)

    # -- prediction --------------------------------------------------------

    def margin(self, mat):
        import numpy as np

        x = np.asarray(mat, dtype=np.float64)
        n = x.shape[0]
        total = np.zeros(n, dtype=np.float64)
        for split_idx, cond, left, right, dleft in self._trees:
            node = np.zeros(n, dtype=np.int64)
            active = left[node] != -1
            while active.any():
                idx = node[active]
                feat = x[active, split_idx[idx]]
                goleft = feat < cond[idx]
                nan = np.isnan(feat)
                goleft = np.where(nan, dleft[idx], goleft)
                node[active] = np.where(goleft, left[idx], right[idx])
                active = left[node] != -1
            total += cond[node]  # leaf value lives in split_conditions
        return total

    def predict_proba_batch(self, mat):
        import numpy as np

        m = self.margin(mat)
        if self.objective == "binary:logistic":
            b = min(max(self.base_score, 1e-15), 1 - 1e-15)
            return 1.0 / (1.0 + np.exp(-(m + math.log(b / (1.0 - b)))))
        return m + self.base_score
