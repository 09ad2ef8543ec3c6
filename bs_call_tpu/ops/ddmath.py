"""Double-float32 ("df32") arithmetic for TPUs without native float64.

A value is an unevaluated pair (hi, lo) of float32 with |lo| <= ulp(hi)/2,
giving ~48 bits of significand — enough to reproduce the reference's
double-precision genotype likelihoods to far below the 6-significant-digit
precision of the printed GL fields (float64 has 53 bits; the residual
1e-13-relative difference is handled by the same boundary-rescue tiers as
any other engine).

Algorithms are the classical error-free transforms (Knuth two-sum, Dekker
split/two-prod) plus range-reduced Taylor exp and Newton-refined log.
Everything is elementwise jnp code, so it runs on the TPU VPU and fuses
like the float32 kernel.

Validated against float64 in tests; if a compiler configuration ever
breaks the error-free transforms (e.g. value-changing fast-math), the
parity test fails loudly rather than silently degrading.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32

# double-float constant: ln(2) split into two f32s
_LN2_D = np.float64(0.6931471805599453)
_LN2_HI = np.float32(_LN2_D)
_LN2_LO = np.float32(_LN2_D - np.float64(np.float32(_LN2_D)))


def const(v: float):
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    return (jnp.asarray(hi), jnp.asarray(lo))


def from_f32(a):
    return (a, jnp.zeros_like(a))


def to_f64(x):
    return np.asarray(x[0], dtype=np.float64) + np.asarray(
        x[1], dtype=np.float64
    )


import jax


def _barrier(*xs):
    """Keep XLA's algebraic simplifier from rewriting the error-free
    transforms (it otherwise cancels compensation terms in the fused
    kernel; observed as f32-level error under jit)."""
    return jax.lax.optimization_barrier(xs)


def dd_jit(fn, **jit_kw):
    """jax.jit that preserves df32 semantics on every backend.

    XLA:CPU's loop-fusion emitter evaluates fused mul+add chains with
    excess precision (FMA contraction) AFTER optimization barriers are
    stripped, which destroys the error-free transforms: a jitted
    composite dd.mul degrades from ~1e-14 to ~6e-8 relative error while
    each primitive alone stays exact. Disabling the fusion pass for the
    compiled program restores bit-exact behavior (verified in
    tests/test_emit_device.py). TPU emitters do not contract these
    chains (dd planes validated bit-compatible on hardware, round 2
    adversarial parity seeds), so only CPU pays the fusion-off cost —
    and only tests and dryruns run dd under jit on CPU.

    Backend choice is deferred to the first call so importing a module
    that decorates with dd_jit never initializes a JAX backend."""
    box = {}

    def call(*args, **kwargs):
        f = box.get("f")
        if f is None:
            try:
                cpu = jax.default_backend() == "cpu"
            except Exception:
                cpu = True
            if cpu:
                f = jax.jit(
                    fn,
                    compiler_options={
                        "xla_disable_hlo_passes": "fusion"
                    },
                    **jit_kw,
                )
            else:
                f = jax.jit(fn, **jit_kw)
            box["f"] = f
        return f(*args, **kwargs)

    return call


def _two_sum(a, b):
    s = a + b
    s, a, b = _barrier(s, a, b)
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    s = a + b
    s, a, b = _barrier(s, a, b)
    return s, b - (s - a)


def _split(a):
    t = F32(4097.0) * a
    t, a = _barrier(t, a)
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    p, a2, b2 = _barrier(p, a, b)
    ah, al = _split(a2)
    bh, bl = _split(b2)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def add(x, y):
    s, e = _two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    return _quick_two_sum(s, e)


def add_f32(x, a):
    s, e = _two_sum(x[0], a)
    e = e + x[1]
    return _quick_two_sum(s, e)


def neg(x):
    return (-x[0], -x[1])


def sub(x, y):
    return add(x, neg(y))


def mul(x, y):
    p, e = _two_prod(x[0], y[0])
    e = e + x[0] * y[1] + x[1] * y[0]
    return _quick_two_sum(p, e)


def mul_f32(x, a):
    p, e = _two_prod(x[0], a)
    e = e + x[1] * a
    return _quick_two_sum(p, e)


def div(x, y):
    q1 = x[0] / y[0]
    r = sub(x, mul_f32(y, q1))
    q2 = (r[0] + r[1]) / y[0]
    return _quick_two_sum(q1, q2)


def exp(x):
    """df32 exp via 2^k * expm1-style Taylor on the reduced argument."""
    k = jnp.round(x[0] / _LN2_HI)
    # k*ln2 must be subtracted exactly: k*LN2_HI needs two_prod (k has up
    # to 8 significant bits, the product exceeds 24)
    p, pe = _two_prod(k, _LN2_HI)
    r = add(x, (-p, -pe))
    r = add_f32(r, -k * _LN2_LO)  # |r| <= ln2/2
    # Taylor sum_{i=0..9} r^i/i! in df32, Horner form
    import math

    coeffs = [1.0 / math.factorial(i) for i in range(9, 1, -1)]
    acc = const(coeffs[0])
    acc = (jnp.broadcast_to(acc[0], r[0].shape),
           jnp.broadcast_to(acc[1], r[0].shape))
    for c in coeffs[1:]:
        acc = add(mul(acc, r), const(c))
    # ... * r^2 + r + 1
    acc = mul(mul(acc, r), r)
    acc = add(acc, r)
    acc = add_f32(acc, F32(1.0))
    # XLA's exp2 is approximate even at integer arguments; ldexp scales
    # by an exact power of two
    scale = jnp.ldexp(jnp.float32(1.0), k.astype(jnp.int32))
    return (acc[0] * scale, acc[1] * scale)


def log(x):
    """df32 log: float32 seed + two Newton steps
    (y <- y + x*exp(-y) - 1). Two steps because the TPU's f32 log
    approximation is coarse (~1e-4 relative); quadratic convergence takes
    it below the df32 arithmetic floor either way."""
    y0 = jnp.log(jnp.maximum(x[0], jnp.float32(1e-38)))
    y = (y0, jnp.zeros_like(y0))
    for _ in range(2):
        e = exp(neg(y))
        corr = add_f32(mul(x, e), F32(-1.0))
        y = add(y, corr)
    return y
