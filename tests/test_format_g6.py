"""Byte parity of the native fast %g writer (bsc_format.cpp put_g6)
against glibc printf("%g") — the formatter the reference's VCF text
values go through (print_vcf.c uses bcf encoding; our text rows print
GL with %g semantics, output/vector_site.py).

put_g6 takes a cheap long-double path and falls back to snprintf inside
a guard band around decimal ties, so equality must hold for EVERY
finite double — exercised here over random float32s (the GL value
domain), adversarial tie constructions, decade boundaries, and special
values.
"""

import ctypes
import math
import struct

import numpy as np
import pytest

from bs_call_tpu.native import load

libc = ctypes.CDLL(None)
libc.snprintf.restype = ctypes.c_int


def _ref_g(x: float) -> bytes:
    buf = ctypes.create_string_buffer(64)
    libc.snprintf(buf, 64, b"%g", ctypes.c_double(x))
    return buf.value


@pytest.fixture(scope="module")
def g6():
    lib = load()
    if lib is None:
        pytest.skip("native library unavailable")
    lib.bsc_format_g6.restype = ctypes.c_int64
    lib.bsc_format_g6.argtypes = [ctypes.c_double, ctypes.c_char_p]

    def fmt(x: float) -> bytes:
        buf = ctypes.create_string_buffer(64)
        n = lib.bsc_format_g6(ctypes.c_double(x), buf)
        return buf.raw[:n]

    return fmt


def _check_many(g6, values):
    bad = []
    for v in values:
        got = g6(float(v))
        want = _ref_g(float(v))
        if got != want:
            bad.append((float(v), got, want))
            if len(bad) > 5:
                break
    assert not bad, bad


def test_specials(g6):
    _check_many(
        g6,
        [0.0, -0.0, 1.0, -1.0, 10.0, 100000.0, 999999.0, 1000000.0,
         999999.5, 999999.4999999, 0.0001, 0.00009999999, 1e-5, 1e6,
         123456789.0, -99.999, 1e-45, 5e-324, 1.7976931348623157e308,
         math.inf, -math.inf, math.nan, 0.15625, -0.15625, 0.1, 0.5,
         2.5, 1234565.0, 123456.5, 12345.65, 1.000005, 100.0005,
         9.999995e-5, 9.9999949999e-5, 1e22, 1e23, 1e-22],
    )


def test_random_float32_gl_domain(g6):
    # GL values are float32s, mostly in [-100, 0]
    rng = np.random.default_rng(0)
    vals = rng.uniform(-100, 0, 200_000).astype(np.float32)
    _check_many(g6, vals)


def test_random_float32_bit_patterns(g6):
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2**32, 200_000, dtype=np.uint32)
    vals = bits.view(np.float32)
    vals = vals[np.isfinite(vals)]
    _check_many(g6, vals.astype(np.float64))


def test_random_doubles_wide(g6):
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2**64, 100_000, dtype=np.uint64)
    vals = bits.view(np.float64)
    vals = vals[np.isfinite(vals)]
    _check_many(g6, vals)


def test_tie_adversaries(g6):
    # doubles whose 6-significant-digit decimal rounding sits exactly on
    # or within 1 ulp of a .5 tie (the guard-band fallback territory)
    vals = []
    for digits in (100000.5, 123456.5, 999999.5, 100000.05,
                   314159.5, 271828.5):
        for k in range(-30, 31):
            v = digits * (10.0 ** k)
            vals.append(v)
            vals.append(np.nextafter(v, 0))
            vals.append(np.nextafter(v, math.inf))
    # exact decade boundaries and their neighbours
    for k in range(-40, 40):
        v = 10.0 ** k
        vals += [v, np.nextafter(v, 0), np.nextafter(v, math.inf)]
    _check_many(g6, vals)


def test_exact_binary_fractions(g6):
    # short binary fractions have terminating decimal expansions: the
    # most likely true-tie cases
    vals = []
    for m in range(1, 4096):
        for sh in (1, 2, 4, 8, 16, 24):
            vals.append(m / (1 << sh))
    _check_many(g6, vals)


def test_float32_exhaustive_exponent_sweep(g6):
    # one mantissa sweep per float32 exponent bucket
    vals = []
    for exp in range(0, 255):
        for frac in (0, 1, 0x400000, 0x7FFFFF, 0x555555):
            bits = (exp << 23) | frac
            v = struct.unpack("<f", struct.pack("<I", bits))[0]
            if math.isfinite(v):
                vals += [v, -v]
    _check_many(g6, vals)
