"""Bit-exact Java ``Math.log10`` / ``Math.log`` in pure Python.

Java's StrictMath delegates to Sun's fdlibm 5.3 (``e_log.c``,
``e_log10.c``), a public, freely-distributable algorithm; HotSpot's
Math.log10 matches it on this platform (verified against the reference
goldens, e.g. log10(1.6) = 0.2041199826559248). CPython's math.log10
and numpy's log10 each differ from it by 1 ulp on *different* inputs,
so neither can reproduce the reference's golden doubles alone.

Python floats are IEEE-754 binary64 with correctly-rounded primitive
ops, so a literal transcription of fdlibm is bit-exact.
"""

from __future__ import annotations

import struct


def _hi_lo(x: float) -> tuple[int, int]:
    b = struct.pack(">d", x)
    return struct.unpack(">i", b[:4])[0], struct.unpack(">I", b[4:])[0]


def _set_hi(x: float, hi: int) -> float:
    b = struct.pack(">d", x)
    return struct.unpack(">d", struct.pack(">i", hi) + b[4:])[0]


_TWO54 = 1.80143985094819840000e16
_LN2_HI = 6.93147180369123816490e-01
_LN2_LO = 1.90821492927058770002e-10
_LG1 = 6.666666666666735130e-01
_LG2 = 3.999999999940941908e-01
_LG3 = 2.857142874366239149e-01
_LG4 = 2.222219843214978396e-01
_LG5 = 1.818357216161805012e-01
_LG6 = 1.531383769920937332e-01
_LG7 = 1.479819860511658591e-01

_IVLN10 = 4.34294481903251816668e-01
_LOG10_2HI = 3.01029995663611771306e-01
_LOG10_2LO = 3.69423907715893089906e-13


def jlog(x: float) -> float:
    """fdlibm __ieee754_log (Java StrictMath.log)."""
    x = float(x)
    hx, lx = _hi_lo(x)
    k = 0
    if hx < 0x00100000:
        if ((hx & 0x7FFFFFFF) | lx) == 0:
            return float("-inf")
        if hx < 0:
            return float("nan")
        k -= 54
        x *= _TWO54
        hx, lx = _hi_lo(x)
    if hx >= 0x7FF00000:
        return x + x
    k += (hx >> 20) - 1023
    hx &= 0x000FFFFF
    i = (hx + 0x95F64) & 0x100000
    x = _set_hi(x, hx | (i ^ 0x3FF00000))
    k += i >> 20
    f = x - 1.0
    if (0x000FFFFF & (2 + hx)) < 3:
        if f == 0.0:
            if k == 0:
                return 0.0
            dk = float(k)
            return dk * _LN2_HI + dk * _LN2_LO
        r = f * f * (0.5 - 0.33333333333333333 * f)
        if k == 0:
            return f - r
        dk = float(k)
        return dk * _LN2_HI - ((r - dk * _LN2_LO) - f)
    s = f / (2.0 + f)
    dk = float(k)
    z = s * s
    i = hx - 0x6147A
    w = z * z
    j = 0x6B851 - hx
    t1 = w * (_LG2 + w * (_LG4 + w * _LG6))
    t2 = z * (_LG1 + w * (_LG3 + w * (_LG5 + w * _LG7)))
    i |= j
    r = t2 + t1
    if i > 0:
        hfsq = 0.5 * f * f
        if k == 0:
            return f - (hfsq - s * (hfsq + r))
        return dk * _LN2_HI - ((hfsq - (s * (hfsq + r) + dk * _LN2_LO)) - f)
    if k == 0:
        return f - s * (f - r)
    return dk * _LN2_HI - ((s * (f - r) - dk * _LN2_LO) - f)


def jlog10(x: float) -> float:
    """fdlibm __ieee754_log10 (Java StrictMath.log10 / Math.log10)."""
    x = float(x)
    hx, lx = _hi_lo(x)
    k = 0
    if hx < 0x00100000:
        if ((hx & 0x7FFFFFFF) | lx) == 0:
            return float("-inf")
        if hx < 0:
            return float("nan")
        k -= 54
        x *= _TWO54
        hx, lx = _hi_lo(x)
    if hx >= 0x7FF00000:
        return x + x
    k += (hx >> 20) - 1023
    i = (k & 0x80000000) >> 31 if k >= 0 else 1  # ((unsigned)k & 0x80000000) >> 31
    hx = (hx & 0x000FFFFF) | ((0x3FF - i) << 20)
    y = float(k + i)
    x = _set_hi(x, hx)
    z = y * _LOG10_2LO + _IVLN10 * jlog(x)
    return z + y * _LOG10_2HI
