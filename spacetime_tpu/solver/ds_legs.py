"""Double-single residual legs for the mixed-precision refinement.

Evaluates r = f − S·u with the S chain (B → K_Y → Bᵀ, + stabilization,
+ trace) in double-single f32 arithmetic (ops/ds.py) instead of emulated
f64 — the same linear operator to ~1e-10 relative, at a fraction of the
emulated-f64 cost (the three residual legs are ~5–6 s of the 10.58-s
135-MDoF flagship refinement; round-3 verdict task 1).

Scope: the structured constant-stencil multigrid regime (the flagship
path) — StencilOperator spatial forms + MultiShiftMultigrid K_Y. Other
regimes (dense/cheb inners, weighted/nested/SA multigrid) keep the f64
legs; solve_refined falls back automatically.

Key structural facts this file leans on:
- S = Bᵀ K_Y B + stab + trace uses ONLY the ω=0 shift family
  (omega_ky ≡ 0, solver/heateq._finish_* setup): the V-cycle operator is
  the pure stiffness stencil, and the per-row Chebyshev coefficient
  arrays are row-constant — they collapse to static scalar splits.
- The 2D stiffness stencil weights (4, −1) and every transfer weight
  (1, 1/2) are exact powers of two: those scalings are error-free in DS,
  leaving only compensated sums.
- The coarsest-grid solve and the single trace row are tiny; they run in
  genuine f64 (emulated, but on ~1e4-element arrays).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ds
from ..ops.multigrid import MultiShiftMultigrid, _MSLevel


def _weight_groups(disps, weights):
    """weight -> taps, zero weights dropped (mirrors StencilOperator.apply
    / ops.kron_pallas._weight_groups grouping)."""
    groups: dict[float, list] = {}
    for disp, w in zip(disps, weights):
        if w == 0.0:
            continue
        groups.setdefault(float(w), []).append(disp)
    return groups


class _DSStencil:
    """Constant-coefficient stencil in DS arithmetic: per weight group the
    taps (shifted DS slices) are compensated-summed, then scaled by the
    pre-split scalar weight."""

    def __init__(self, st):
        self.gs = st.grid_shape
        self.groups = [
            (ds.split_scalar(w), tuple(taps))
            for w, taps in _weight_groups(st.disps, st.weights).items()
        ]

    def apply(self, xds):
        dim = len(self.gs)
        batch = xds[0].ndim - dim
        center = (0,) * dim
        pad_hi = pad_lo = None
        out = None
        for s, taps in self.groups:
            hi_taps, lo_taps = [], []
            for disp in taps:
                if disp == center:
                    hi_taps.append(xds[0])
                    lo_taps.append(xds[1])
                    continue
                if pad_hi is None:
                    pad = [(0, 0)] * batch + [(1, 1)] * dim
                    pad_hi = jnp.pad(xds[0], pad)
                    pad_lo = jnp.pad(xds[1], pad)
                idx = tuple([slice(None)] * batch) + tuple(
                    slice(1 + d, 1 + d + n) for d, n in zip(disp, self.gs)
                )
                hi_taps.append(pad_hi[idx])
                lo_taps.append(pad_lo[idx])
            term = ds.scale(ds.sum_taps(hi_taps, lo_taps), s)
            out = term if out is None else ds.add(out, term)
        return out


# ------------------------------------------------------------- transfers


def _shift1_zero_ds(xds, axes, sign=1):
    pad = [(0, 0)] * xds[0].ndim
    sl = [slice(None)] * xds[0].ndim
    for a in axes:
        pad[a] = (1, 0) if sign > 0 else (0, 1)
        sl[a] = (
            slice(0, xds[0].shape[a]) if sign > 0
            else slice(1, xds[0].shape[a] + 1)
        )
    sl = tuple(sl)
    return jnp.pad(xds[0], pad)[sl], jnp.pad(xds[1], pad)[sl]


def _pairsum_ds(xds, axis):
    sl = [slice(None)] * xds[0].ndim
    sl[axis] = slice(0, xds[0].shape[axis] - 1, 2)
    even = tuple(sl)
    sl[axis] = slice(1, xds[0].shape[axis], 2)
    odd = tuple(sl)
    return ds.add(
        (xds[0][even], xds[1][even]), (xds[0][odd], xds[1][odd])
    )


def _repeat2_pad_ds(xds, axis):
    pad = [(0, 0)] * xds[0].ndim
    pad[axis] = (0, 1)
    rep = lambda c: jnp.pad(jnp.repeat(c, 2, axis=axis), pad)
    return rep(xds[0]), rep(xds[1])


def _transfer_ds(xds, dim, *, restrict):
    """DS twin of ops.multigrid._transfer_fast: shifts/repeats are exact,
    the 1/2 scale is exact, only the adds carry compensation."""
    axes = tuple(range(xds[0].ndim - dim, xds[0].ndim))
    if restrict:
        h = ds.add(xds, _shift1_zero_ds(xds, axes, sign=-1))
        for a in axes:
            h = _pairsum_ds(h, a)
        return 0.5 * h[0], 0.5 * h[1]
    g = xds
    for a in axes:
        g = _repeat2_pad_ds(g, a)
    s = ds.add(g, _shift1_zero_ds(g, axes, sign=1))
    return 0.5 * s[0], 0.5 * s[1]


# ---------------------------------------------------------------- V-cycle


class _DSLevel:
    """One multigrid level of the ω=0 family: the stiffness DS stencil
    plus the (row-constant) Chebyshev smoothing scalars, pre-split."""

    def __init__(self, lev: _MSLevel, dim: int):
        self.A = _DSStencil(lev.A_st)
        self.n = lev.n
        self.dim = dim
        # Same derivation as MultiShiftMultigrid.row_params at ω = 0,
        # kept in f64 host arithmetic before the split.
        inv_diag = 1.0 / lev.cA
        lam = 1.1 * lev.gA * inv_diag
        self.inv_diag = ds.split_scalar(inv_diag)
        self.inv_theta = ds.split_scalar(1.0 / (0.625 * lam))
        self.inv_delta = ds.split_scalar(1.0 / (0.375 * lam))


class DSKYCycle:
    """K_Y's multi-shift V-cycle at ω ≡ 0 in DS arithmetic — mirrors
    MultiShiftMultigrid.vcycle/solve (XLA forms, pallas=None) so the DS
    legs evaluate the same operator the f64 legs define."""

    _SIGMA = MultiShiftMultigrid._SIGMA

    def __init__(self, ms: MultiShiftMultigrid):
        self.levels = [_DSLevel(lev, ms.dim) for lev in ms.levels]
        self.dim = ms.dim
        self.nu = ms.nu
        self.nu_post = ms.nu if ms.nu_post is None else ms.nu_post

    def _smooth(self, lev: _DSLevel, xds, bds, nu: int):
        sigma = self._SIGMA
        if xds is None:  # zero initial guess: r = inv_diag * b exactly
            r = ds.scale(bds, lev.inv_diag)
            xds = None
        else:
            r = ds.scale(ds.sub(bds, lev.A.apply(xds)), lev.inv_diag)
        d = ds.scale(r, lev.inv_theta)
        xds = d if xds is None else ds.add(xds, d)
        rho = 1.0 / sigma
        for _ in range(nu - 1):
            rho_new = 1.0 / (2.0 * sigma - rho)
            r = ds.sub(r, ds.scale(lev.A.apply(d), lev.inv_diag))
            d = ds.add(
                ds.scale(d, ds.split_scalar(rho_new * rho)),
                ds.scale(
                    ds.scale(r, lev.inv_delta),
                    ds.split_scalar(2.0 * rho_new),
                ),
            )
            xds = ds.add(xds, d)
            rho = rho_new
        return xds

    def _coarse(self, bds, cinv64):
        """Coarsest solve in genuine f64 (tiny arrays)."""
        b64 = ds.to_f64(bds)
        sh = b64.shape
        m = cinv64.shape[0]
        out = jnp.dot(
            b64.reshape(-1, m), cinv64, precision=jax.lax.Precision.HIGHEST
        )
        return ds.from_f64(out.reshape(sh))

    def vcycle(self, bds, cinv64, lvl=0):
        if lvl == len(self.levels):
            return self._coarse(bds, cinv64)
        lev = self.levels[lvl]
        x = self._smooth(lev, None, bds, self.nu)
        r = ds.sub(bds, lev.A.apply(x))
        rc = _transfer_ds(r, self.dim, restrict=True)
        ec = self.vcycle(rc, cinv64, lvl + 1)
        x = ds.add(x, _transfer_ds(ec, self.dim, restrict=False))
        return self._smooth(lev, x, bds, self.nu_post)

    def solve(self, bds, cinv64, cycles):
        x = self.vcycle(bds, cinv64)
        for _ in range(cycles - 1):
            r = ds.sub(bds, self.levels[0].A.apply(x))
            x = ds.add(x, self.vcycle(r, cinv64))
        return x


# ------------------------------------------------------------ the S chain


class DSResidual:
    """r = f − S·u in DS arithmetic for a structured constant-stencil mg
    HeatSolver. Built once per solver; ``params()`` returns the device
    pytree (threaded through jit as arguments, never closed over), and
    ``resid(f64, u64, p)`` returns (r64, ||r||)."""

    @staticmethod
    def supported(solver) -> bool:
        from ..ops.multigrid import MultiShiftMultigrid as MS

        return (
            solver.inner == "mg"
            and type(getattr(solver, "msmg", None)) is MS
            and getattr(solver, "_st_ops", None) is not None
            and not getattr(solver, "_mg_weighted", False)
        )

    def __init__(self, solver):
        if not self.supported(solver):
            raise ValueError("DS legs need the structured-stencil mg regime")
        M_st, A_st = solver._st_ops
        self.M = _DSStencil(M_st)
        self.A = _DSStencil(A_st)
        self.gs = solver.gs
        self.N = solver.N
        self.ky = DSKYCycle(solver.msmg)
        self.cycles = solver.mg_cycles
        self._solver = solver  # trace row runs the solver's f64 path

    def params(self):
        sv = self._solver
        h = np.asarray(sv._host["h"], np.float64)
        from ..ops.stencil import row_scale

        pair = lambda v: (
            row_scale(v.astype(np.float32), self.gs, jnp.float32),
            row_scale(
                (v - v.astype(np.float32).astype(np.float64)).astype(
                    np.float32
                ),
                self.gs,
                jnp.float32,
            ),
        )
        return {
            "h_half": pair(0.5 * h),
            "h_stab": pair(h / 16.0),
            "inv_h": pair(1.0 / h),
            "mg_cinv_ky": jnp.asarray(
                sv._host["mg_cinv_ky"], jnp.float64
            ),
        }

    # Row-structure helpers: concatenation along the leading (time) axis
    # is exact per channel.
    @staticmethod
    def _cat(a, b):
        return (
            jnp.concatenate([a[0], b[0]]),
            jnp.concatenate([a[1], b[1]]),
        )

    def _zrow(self):
        z = jnp.zeros((1,) + self.gs, jnp.float32)
        return z, z

    def _diff_rows(self, uds):
        """U[1:] − U[:-1] and U[1:] + U[:-1] (DS)."""
        hi, lo = uds
        up = (hi[1:], lo[1:])
        dn = (hi[:-1], lo[:-1])
        return ds.sub(up, dn), ds.add(up, dn)

    def apply_S(self, uds, p):
        # B: M(DU) + h_half ⊙ A(SU)
        du, su = self._diff_rows(uds)
        v = ds.add(
            self.M.apply(du), ds.mul(p["h_half"], self.A.apply(su))
        )
        # K_Y: cycles V-cycles at ω=0, then the 1/h row scale
        v = self.ky.solve(v, p["mg_cinv_ky"], self.cycles)
        v = ds.mul(v, p["inv_h"])
        # Bᵀ: concat(−VM+VA, 0) + concat(0, VM+VA)
        vm = self.M.apply(v)
        va = ds.mul(p["h_half"], self.A.apply(v))
        z = self._zrow()
        out = ds.add(
            self._cat(ds.sub(va, vm), z), self._cat(z, ds.add(vm, va))
        )
        # stabilization: concat(0, W) − concat(W, 0), W = h_stab ⊙ A(DU)
        w = ds.mul(p["h_stab"], self.A.apply(du))
        out = ds.add(out, ds.sub(self._cat(z, w), self._cat(w, z)))
        return out

    def resid_pair(self, f_pair, u64, p):
        """r = f − S·u − trace·u as a DS pair, never materializing an f64
        intermediate of the full space-time size: converting the big DS
        output to f64 INSIDE the leg jit makes XLA push the convert
        backward through the whole chain — measured 438 s compile (vs
        6 s without) at a 31²×17 toy. The f64↔DS boundary therefore
        lives in separate tiny jits (split_f / norm / normalize32)."""
        uds = ds.from_f64(u64)
        r = ds.sub(f_pair, self.apply_S(uds, p))
        # Trace term: M·K_H·M on row 0 only (~m elements) — the solver's
        # f64 path is p-free in the structured regime (static stencils +
        # the closure Chebyshev M⁻¹); one row of genuine f64 is cheap.
        tr = self._solver._trace_row(u64[0:1], None)
        tr_ds = ds.from_f64(tr)
        r0 = ds.sub((r[0][0:1], r[1][0:1]), tr_ds)
        return (
            r[0].at[0:1].set(r0[0]),
            r[1].at[0:1].set(r0[1]),
        )

    # -------- the tiny f64/DS boundary jits (see resid_pair docstring)

    @staticmethod
    def split_f(f64):
        return ds.from_f64(f64)

    @staticmethod
    def norm(r_pair):
        return ds.norm2_f64(r_pair)

    @staticmethod
    def normalize32(r_pair, rnorm):
        """(r / ||r||) rounded to f32 — the inner solve's RHS."""
        inv = (1.0 / rnorm).astype(jnp.float32)
        return r_pair[0] * inv + r_pair[1] * inv
