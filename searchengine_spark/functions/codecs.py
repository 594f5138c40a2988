"""Posting-list integer codecs: variable-byte (docids) and unary (tfs).

Byte/bit-level semantics match the reference
(/root/reference/common/.../compression/VariableByteCompressor.java and
UnaryCompressor.java), pinned by its unit-test goldens:

* Variable-byte: per int, base-128 **big-endian**, MSB of the **last**
  byte set as terminator. ``5 -> [0x85]``, ``824 -> [0x06, 0xB8]``.
  ``0 -> [0x00]`` (reference quirk: unterminated — decode folds it into
  the next value; harmless because docids/gaps/tfs are always >= 1).
  The reference encodes RAW docids; we encode **gaps** (delta within a
  sorted posting block) — an allowed improvement since rank identity is
  defined on query results, not index bytes (SURVEY.md §2.7 C1).
* Unary: value v -> (v-1) one-bits then a zero-bit, packed MSB-first;
  the whole array is bit-aligned, byte-aligned only at the end
  (zero-padded). ``[32] -> FF FF FF FE``, ``[1,2,1,1,3] -> [0x46]``.
  Values <= 0 are skipped (reference prints a warning; we raise, since
  a tf <= 0 upstream is a pipeline bug).

All functions are numpy-vectorized (no per-element Python in the hot
loop beyond the VB byte-slice assembly) and are wrapped by pandas UDFs
in the packed-postings writer/reader.
"""

from __future__ import annotations

import numpy as np

# 128**1 .. 128**8 — the byte-width breakpoints that fit in int64
# (128**9 == 2**63 overflows; any non-negative int64 is < it).
_VB_THRESHOLDS = np.array([128**k for k in range(1, 9)], dtype=np.int64)


def _vb_widths(vals: np.ndarray) -> np.ndarray:
    """Per-value VB byte width (number of 7-bit digits; 0 -> 1, the
    0x00 quirk byte). Shared by ``vb_encode`` and ``vb_encode_rows`` so
    the row splitter's framing is bit-identical to the encoder's layout
    by construction, not by a duplicated float-log expression."""
    # Exact integer digit count — NOT a float log. A double log128 is
    # wrong twice at the extremes: it rounds UP to k at the ulp-band
    # just below 128**k (128**8 - 1 would get 9 bytes, true width 8),
    # and the power-of-128 bump guard overflows int64 at 128**9 == 2**63
    # (every value >= 128**8 would get a phantom 10th byte). width(v) is
    # the k with 128**(k-1) <= v < 128**k; int64 values need at most 9.
    safe = np.maximum(vals, 1)
    return (
        np.searchsorted(_VB_THRESHOLDS, safe, side="right") + 1
    ).astype(np.int64)


def vb_encode(values: np.ndarray | list[int]) -> bytes:
    """Variable-byte encode an int array (big-endian, last-byte MSB)."""
    vals = np.asarray(values, dtype=np.int64)
    if vals.size == 0:
        return b""
    if (vals < 0).any():
        raise ValueError("variable-byte encoding requires non-negative ints")
    nbytes = _vb_widths(vals)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    # peel 7-bit digits least-significant first, writing right-to-left
    remaining = vals.copy()
    max_b = int(nbytes.max())
    for digit in range(max_b):
        mask = nbytes > digit
        pos = ends[mask] - 1 - digit
        out[pos] = remaining[mask] % 128
        remaining = remaining // 128
    # terminator bit on the last byte of each value — except the 0 quirk
    term_pos = ends - 1
    term_mask = vals != 0
    out[term_pos[term_mask]] += 128
    return out.tobytes()


def vb_decode(data: bytes, tot_nums: int) -> np.ndarray:
    """Decode ``tot_nums`` ints from a variable-byte stream."""
    if tot_nums == 0:
        return np.zeros(0, dtype=np.int64)
    raw = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    is_term = raw >= 128
    digits = np.where(is_term, raw - 128, raw)
    # value boundaries: terminator positions
    ends = np.flatnonzero(is_term)
    starts = np.concatenate(([0], ends[:-1] + 1))
    out = np.zeros(len(ends), dtype=np.int64)
    # horner accumulation vectorized over values of equal length
    lengths = ends - starts + 1
    for ln in np.unique(lengths):
        sel = lengths == ln
        s = starts[sel]
        acc = np.zeros(sel.sum(), dtype=np.int64)
        for d in range(int(ln)):
            acc = acc * 128 + digits[s + d]
        out[sel] = acc
    return out[:tot_nums]


def unary_encode(values: np.ndarray | list[int]) -> bytes:
    """Unary encode: v -> (v-1) ones + a zero, MSB-first bit packing."""
    vals = np.asarray(values, dtype=np.int64)
    if vals.size == 0:
        return b""
    if (vals <= 0).any():
        raise ValueError("unary encoding requires strictly positive ints")
    nbits = int(vals.sum())
    bits = np.ones(nbits, dtype=np.uint8)
    zero_pos = np.cumsum(vals) - 1
    bits[zero_pos] = 0
    return np.packbits(bits).tobytes()  # packbits pads with 0 bits, MSB-first


def unary_decode(data: bytes, tot_nums: int) -> np.ndarray:
    """Decode ``tot_nums`` ints from a unary bit stream."""
    if tot_nums == 0:
        return np.zeros(0, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    zeros = np.flatnonzero(bits == 0)[:tot_nums]
    prev = np.concatenate(([-1], zeros[:-1]))
    return (zeros - prev).astype(np.int64)


def vb_encode_rows(arrays: list) -> list[bytes]:
    """VB-encode many small arrays at once: ONE flattened vb_encode
    pass plus per-row byte splits — no per-row encoder calls, so an
    Arrow batch of position lists packs at numpy speed."""
    lens = [len(a) for a in arrays]
    if not arrays or sum(lens) == 0:
        return [b""] * len(arrays)
    flat = np.concatenate(
        [np.asarray(a, dtype=np.int64) for a in arrays if len(a)]
    )
    blob = vb_encode(flat)
    ends = np.cumsum(_vb_widths(flat))
    out: list[bytes] = []
    vpos = 0
    bpos = 0
    for ln in lens:
        if ln == 0:
            out.append(b"")
            continue
        vpos += ln
        e = int(ends[vpos - 1])
        out.append(blob[bpos:e])
        bpos = e
    return out


def gaps_encode(sorted_vals: np.ndarray | list[int]) -> np.ndarray:
    """Docid array -> gap array (first value kept raw)."""
    vals = np.asarray(sorted_vals, dtype=np.int64)
    if vals.size == 0:
        return vals
    return np.diff(vals, prepend=0)


def gaps_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.int64))
