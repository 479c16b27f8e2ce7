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
    dot: Callable | None = None,
) -> PCGResult:
    """Solve S u = f with preconditioner K_X; stops at ||r|| <= tol*||f||.

    Trace-compatible: ``maxiter`` bounds the history buffer; the while_loop
    exits early on convergence. ``x0`` warm-starts the iteration (restart
    semantics — used by checkpoint/resume for long runs).

    ``dot``: inner-product override for manually-partitioned (shard_map)
    callers — must return the GLOBAL <a, b> (e.g. masked local vdot +
    lax.psum); norms are then derived as sqrt(dot(x, x)). The default keeps
    jnp.vdot / jnp.linalg.norm so single-device residual histories stay
    bitwise stable against the recorded oracle baselines.
    """
    dtype = f.dtype
    nan = jnp.array(jnp.nan, dtype)
    if dot is None:
        dot = jnp.vdot
        norm = jnp.linalg.norm
    else:
        norm = lambda x: jnp.sqrt(dot(x, x))

    U0 = jnp.zeros_like(f) if x0 is None else x0
    R0 = f - apply_S(U0)
    Z0 = apply_KX(R0)
    P0 = Z0
    rz0 = dot(R0, Z0)
    fnorm = norm(f)
    res0 = jnp.full((maxiter + 1,), nan).at[0].set(norm(R0))
    pres0 = jnp.full((maxiter + 1,), nan).at[0].set(
        jnp.sqrt(jnp.maximum(rz0, 0.0))
    )

    def cond(state):
        it, U, R, P, rz, res, pres, done = state
        return jnp.logical_and(it < maxiter, jnp.logical_not(done))

    def body(state):
        it, U, R, P, rz, res, pres, done = state
        SP = apply_S(P)
        alpha = rz / dot(P, SP)
        U = U + alpha * P
        R = R - alpha * SP
        rnorm = norm(R)
        res = res.at[it + 1].set(rnorm)
        Z = apply_KX(R)
        rz_new = dot(R, Z)
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


# --------------------------------------------------------------- chunked PCG
#
# Alternative driver: fixed-trip fori_loop chunks (masked updates after
# convergence, so extra trips are exact no-ops) with host convergence checks
# between chunks. Identical arithmetic per live iteration -> identical
# residual histories. NOTE (measured on the axon tunnel): a synchronous host
# round-trip costs ~170 ms regardless of work and block_until_ready does NOT
# actually block there, so the single-dispatch while-loop form above is the
# faster default; chunked exists for mid-solve host control (checkpointing,
# adaptive policies), at one tunnel sync per chunk.


class PCGState(NamedTuple):
    it: jax.Array
    U: jax.Array
    R: jax.Array
    P: jax.Array
    rz: jax.Array
    res: jax.Array
    pres: jax.Array
    done: jax.Array
    fnorm: jax.Array


def pcg_init(apply_S, apply_KX, f, maxiter: int, x0=None) -> PCGState:
    dtype = f.dtype
    nan = jnp.array(jnp.nan, dtype)
    U0 = jnp.zeros_like(f) if x0 is None else x0
    R0 = f - apply_S(U0)
    Z0 = apply_KX(R0)
    rz0 = jnp.vdot(R0, Z0)
    res0 = jnp.full((maxiter + 1,), nan).at[0].set(jnp.linalg.norm(R0))
    pres0 = jnp.full((maxiter + 1,), nan).at[0].set(
        jnp.sqrt(jnp.maximum(rz0, 0.0))
    )
    return PCGState(
        it=jnp.int32(0), U=U0, R=R0, P=Z0, rz=rz0, res=res0, pres=pres0,
        done=jnp.bool_(False), fnorm=jnp.linalg.norm(f),
    )


def pcg_chunk(apply_S, apply_KX, state: PCGState, tol: float, k: int) -> PCGState:
    """Advance k masked PCG iterations (a single device dispatch)."""

    def body(_, s: PCGState) -> PCGState:
        SP = apply_S(s.P)
        alpha = jnp.where(s.done, 0.0, s.rz / jnp.vdot(s.P, SP)).astype(s.rz.dtype)
        U = s.U + alpha * s.P
        R = s.R - alpha * SP
        rnorm = jnp.linalg.norm(R)
        idx = jnp.where(s.done, 0, s.it + 1)
        res = s.res.at[idx].set(jnp.where(s.done, s.res[0], rnorm))
        Z = apply_KX(R)
        rz_new = jnp.vdot(R, Z)
        pres = s.pres.at[idx].set(
            jnp.where(s.done, s.pres[0], jnp.sqrt(jnp.maximum(rz_new, 0.0)))
        )
        new_done = jnp.logical_or(s.done, rnorm <= tol * s.fnorm)
        beta = jnp.where(s.done, 0.0, rz_new / s.rz).astype(s.rz.dtype)
        # alpha/beta are masked to 0 after convergence, so U and R freeze by
        # construction; only P needs an explicit select (beta=0 gives Z).
        P = jnp.where(s.done, s.P, Z + beta * s.P)
        return PCGState(
            it=s.it + jnp.int32(jnp.logical_not(s.done)),
            U=U,
            R=R,
            P=P,
            rz=jnp.where(s.done, s.rz, rz_new),
            res=res,
            pres=pres,
            done=new_done,
            fnorm=s.fnorm,
        )

    return jax.lax.fori_loop(0, k, body, state)
