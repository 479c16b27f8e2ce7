"""Double-single (compensated f32) arithmetic for the residual legs.

The mixed-precision refinement (solver/heateq.solve_refined) needs the
true residual r = f - S·u evaluated with operator error below ~1e-9
relative; plain f32 evaluation floors at ~eps32·sqrt(ndof)·chain ≈ 1.7e-2
per-round reduction at 1M-node grids (measured, BASELINE.md), and full
f64 is software-emulated on TPU (~1.9 s per leg at the 135-MDoF
flagship). A double-single number is the unevaluated sum hi + lo of two
f32 with |lo| <= ulp(hi)/2 ≈ eps32·|hi|: the classical error-free
transformations (Knuth TwoSum, Dekker TwoProd via Veltkamp splitting)
evaluate the same linear chain with O(eps32²) ≈ 1e-14 per-op error using
only native-speed f32 VPU ops.

Requirements and scope:
- Exactness needs strict IEEE f32 add/mul semantics with no
  reassociation. XLA preserves op order and TPU f32 VPU ops are IEEE
  (the repo's mg_pallas._dot_last split relies on the same property).
- This is NOT the _dot_last bf16 hi/lo trick: that split's exactness
  argument needs one exactly-representable operand (CLAUDE.md). The
  transformations here are valid for arbitrary operands.
- A DS value is a plain (hi, lo) tuple of same-shape f32 arrays — a
  pytree, so DS values thread through jit like any param.

SURVEY.md §7.3 item 1 ("f64 on TPU … iterative refinement
mixed-precision CG"); round-3 verdict task 1.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# Veltkamp split constant for f32 (p=24): 2^ceil(p/2) + 1.
_VELTKAMP = 4097.0


def two_sum(a, b):
    """Exact a + b = s + err (Knuth; 6 flops, no magnitude assumption)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def fast_two_sum(a, b):
    """Exact a + b = s + err, REQUIRES |a| >= |b| (Dekker; 3 flops)."""
    s = a + b
    err = b - (s - a)
    return s, err


def split(a):
    """Veltkamp split: a = h + l exactly, both with <= 12 mantissa bits
    (so products of split halves are exact in f32)."""
    t = _VELTKAMP * a
    h = t - (t - a)
    return h, a - h


def two_prod(a, b):
    """a * b = p + err to O(eps32²): all partial products of the Veltkamp
    halves are EXACT in f32 (12-bit × 12-bit mantissas), combined with
    TwoSum. Deliberately NOT the classical Dekker form p = fl(a·b),
    err = exact − p: backends that contract multiply+add into FMA (LLVM
    fp-contract on CPU, and potentially the TPU VPU) compute a·b
    UNROUNDED inside the subtraction, which silently corrupts err by
    eps32·|p| (measured: the lo channel became eps-level garbage under
    jit on CPU). Exact products are immune — contracting them changes
    nothing."""
    a1, a2 = split(a)
    b1, b2 = split(b)
    p, e1 = two_sum(a1 * b1, a1 * b2)
    p, e2 = two_sum(p, a2 * b1)
    return p, (e1 + e2) + a2 * b2


# --------------------------------------------------------------- DS values


def from_f64(x):
    """f64 array -> DS pair. A DS pair carries ~49 mantissa bits, so the
    split rounds at ~2^-49 relative — far below the ~1e-9 operator
    budget of the residual legs."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def to_f64(d):
    return d[0].astype(jnp.float64) + d[1].astype(jnp.float64)


def zeros_like(d):
    z = jnp.zeros_like(d[0])
    return z, z


def add(x, y):
    """DS + DS ("sloppy" accumulation: error O(eps32²) relative to the
    operand magnitudes — sufficient here because every intermediate in
    the S chain is O(|f|·κ) and the target is absolute ~1e-9·|f|)."""
    s, e = two_sum(x[0], y[0])
    return fast_two_sum(s, e + (x[1] + y[1]))


def sub(x, y):
    s, e = two_sum(x[0], -y[0])
    return fast_two_sum(s, e + (x[1] - y[1]))


def add_f32(x, a):
    """DS + plain f32 array."""
    s, e = two_sum(x[0], a)
    return fast_two_sum(s, e + x[1])


def neg(x):
    return -x[0], -x[1]


def mul(x, y):
    """DS * DS elementwise (used for the per-row f64 scale arrays:
    h_half, h_stab, inv_h products)."""
    p, e = two_prod(x[0], y[0])
    return fast_two_sum(p, e + (x[0] * y[1] + x[1] * y[0]))


class SplitScalar(NamedTuple):
    """A static f64 scalar pre-split host-side for DS products: value ==
    hi + lo with hi == h1 + h2 Veltkamp-split (h1, h2 have <= 12 mantissa
    bits). All four are Python floats — trace-time constants."""

    hi: float
    lo: float
    h1: float
    h2: float

    @property
    def pow2(self) -> bool:
        """Scaling by an exact power of two (incl. sign) is error-free in
        f32 — both DS channels scale directly, no compensation."""
        if self.lo != 0.0 or self.hi == 0.0:
            return False
        m, _ = math.frexp(abs(self.hi))
        return m == 0.5


def split_scalar(w) -> SplitScalar:
    hi = float(np.float32(w))
    lo = float(np.float32(np.float64(w) - np.float64(hi)))
    t = float(np.float32(_VELTKAMP) * np.float32(hi))
    h1 = float(np.float32(t) - np.float32(t - hi))
    return SplitScalar(hi, lo, h1, hi - h1)


def scale(x, s: SplitScalar):
    """DS array * static scalar (exact-partial-product form — see
    two_prod for why the classical Dekker err formula is unusable under
    FMA contraction)."""
    if s.hi == 0.0 and s.lo == 0.0:
        return zeros_like(x)
    if s.pow2:
        return s.hi * x[0], s.hi * x[1]
    a1, a2 = split(x[0])
    p, e1 = two_sum(a1 * s.h1, a1 * s.h2)
    p, e2 = two_sum(p, a2 * s.h1)
    err = (e1 + e2) + a2 * s.h2
    err = err + (x[0] * s.lo + x[1] * s.hi)
    return fast_two_sum(p, err)


def sum_taps(taps_hi, taps_lo):
    """Compensated sum of same-magnitude-class terms: his via a TwoSum
    chain collecting the rounding errors, los accumulated in plain f32
    (their own rounding is O(eps32²) relative)."""
    s = taps_hi[0]
    e = taps_lo[0]
    for h, l in zip(taps_hi[1:], taps_lo[1:]):
        s, err = two_sum(s, h)
        e = e + (err + l)
    return fast_two_sum(s, e)


def norm2_f64(d):
    """||hi + lo||_2 in f64 (one emulated-f64 reduction — cheap)."""
    x = to_f64(d)
    return jnp.sqrt(jnp.sum(x * x))
