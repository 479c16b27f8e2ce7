"""Preconditioned conjugate gradients as one fused XLA loop.

The whole CG iteration — Kronecker matvec, per-timestep solves, wavelet
preconditioner, dot products — lives inside a single ``lax.while_loop`` under
``jit`` (BASELINE.json: "one fused XLA loop"), so a solve is one device
dispatch with no host round-trips. The operation order matches the NumPy
oracle exactly so float64 residual histories agree to rounding.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class PCGResult(NamedTuple):
    U: jax.Array
    iterations: jax.Array  # int32
    residuals: jax.Array  # (maxiter+1,) 2-norm history, NaN beyond last
    precond_residuals: jax.Array  # sqrt(r·z) history
    converged: jax.Array  # bool


def pcg(
    apply_S: Callable,
    apply_KX: Callable,
    f: jax.Array,
    tol: float,
    maxiter: int,
    x0: jax.Array | None = None,
) -> PCGResult:
    """Solve S u = f with preconditioner K_X; stops at ||r|| <= tol*||f||.

    Trace-compatible: ``maxiter`` bounds the history buffer; the while_loop
    exits early on convergence. ``x0`` warm-starts the iteration (restart
    semantics — used by checkpoint/resume for long runs).
    """
    dtype = f.dtype
    nan = jnp.array(jnp.nan, dtype)

    U0 = jnp.zeros_like(f) if x0 is None else x0
    R0 = f - apply_S(U0)
    Z0 = apply_KX(R0)
    P0 = Z0
    rz0 = jnp.vdot(R0, Z0)
    fnorm = jnp.linalg.norm(f)
    res0 = jnp.full((maxiter + 1,), nan).at[0].set(jnp.linalg.norm(R0))
    pres0 = jnp.full((maxiter + 1,), nan).at[0].set(
        jnp.sqrt(jnp.maximum(rz0, 0.0))
    )

    def cond(state):
        it, U, R, P, rz, res, pres, done = state
        return jnp.logical_and(it < maxiter, jnp.logical_not(done))

    def body(state):
        it, U, R, P, rz, res, pres, done = state
        SP = apply_S(P)
        alpha = rz / jnp.vdot(P, SP)
        U = U + alpha * P
        R = R - alpha * SP
        rnorm = jnp.linalg.norm(R)
        res = res.at[it + 1].set(rnorm)
        Z = apply_KX(R)
        rz_new = jnp.vdot(R, Z)
        pres = pres.at[it + 1].set(jnp.sqrt(jnp.maximum(rz_new, 0.0)))
        done = rnorm <= tol * fnorm
        P = Z + (rz_new / rz) * P
        return (it + 1, U, R, P, rz_new, res, pres, done)

    it, U, R, P, rz, res, pres, done = jax.lax.while_loop(
        cond, body, (jnp.int32(0), U0, R0, P0, rz0, res0, pres0, jnp.bool_(False))
    )
    return PCGResult(
        U=U, iterations=it, residuals=res, precond_residuals=pres, converged=done
    )
