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

    # Operator hooks — the flat-dof subclass (DSFlatResidual) overrides
    # these three (its M/A/K_Y read value arrays from the params pytree;
    # the structured stencils here are static-weight closures).
    def _applyM(self, xds, p):
        return self.M.apply(xds)

    def _applyA(self, xds, p):
        return self.A.apply(xds)

    def _ky_solve(self, vds, p):
        return self.ky.solve(vds, p["mg_cinv_ky"], self.cycles)

    def _trace64(self, u64_row, p):
        # p-free in the structured regime (static stencils + the closure
        # Chebyshev M⁻¹); one row of genuine f64 is cheap.
        return self._solver._trace_row(u64_row, None)

    def apply_S(self, uds, p):
        # B: M(DU) + h_half ⊙ A(SU)
        du, su = self._diff_rows(uds)
        v = ds.add(
            self._applyM(du, p), ds.mul(p["h_half"], self._applyA(su, p))
        )
        # K_Y: cycles V-cycles at ω=0, then the 1/h row scale
        v = self._ky_solve(v, p)
        v = ds.mul(v, p["inv_h"])
        # Bᵀ: concat(−VM+VA, 0) + concat(0, VM+VA)
        vm = self._applyM(v, p)
        va = ds.mul(p["h_half"], self._applyA(v, p))
        z = self._zrow()
        out = ds.add(
            self._cat(ds.sub(va, vm), z), self._cat(z, ds.add(vm, va))
        )
        # stabilization: concat(0, W) − concat(W, 0), W = h_stab ⊙ A(DU)
        w = ds.mul(p["h_stab"], self._applyA(du, p))
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
        # Trace term: M·K_H·M on row 0 only (~m elements) in genuine f64
        # (see _trace64 — the flat subclass threads its f64 mass/Chebyshev
        # arrays through p).
        tr = self._trace64(u64[0:1], p)
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


# ====================================================== flat-dof regimes
#
# DS residual legs for the UNSTRUCTURED flat-(…, m) layouts — nested
# red-refinement hierarchies (inner='mg' + refined_from) and smoothed-
# aggregation AMG (inner='amg') — extending the −23% structured-flagship
# refinement win (r4_ds_flagship.log) to the L-shape/imported-mesh paths
# that previously paid ~2 s/leg emulated-f64 legs (round-4 verdict
# task 3). Value arrays here are GENERAL f64 matrices (no power-of-two
# structure), so every product is a full Veltkamp two_prod (ds.mul); the
# arrays thread through params as (hi, lo) f32 pairs.


def _pair64(v):
    """Host f64 array -> (hi, lo) f32 device pair (DS split)."""
    v = np.asarray(v, np.float64)
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def _dia_apply_ds(xds, offsets, vp):
    """DS twin of ops.sparse.dia_matvec: Y[..., i] = Σ_d v[i, d]·x[..., i+d]
    with DS values vp = ((m, ndiag) hi, lo). The padded x channels are
    sliced per diagonal exactly like the f64 form so the zero-fill
    behavior (values are zero where out of range) matches."""
    m = vp[0].shape[0]
    mo = max(max(offsets), -min(offsets))
    pad = [(0, 0)] * (xds[0].ndim - 1) + [(mo, mo)]
    ph = jnp.pad(xds[0], pad)
    pl = jnp.pad(xds[1], pad)
    out = None
    for k, d in enumerate(offsets):
        sl = (Ellipsis, slice(mo + d, mo + d + m))
        term = ds.mul((vp[0][:, k], vp[1][:, k]), (ph[sl], pl[sl]))
        out = term if out is None else ds.add(out, term)
    return out


def _ell_apply_ds(xds, eidx, vp):
    """DS twin of the SA ELL level operator (ops.multigrid.SAMultiShift-
    Multigrid._op, ω=0 so only the A values): unrolled over the static K
    slots, each a full-width lane-major gather per DS channel. Padded
    slots carry weight exactly 0 → their ds.mul terms are exact zeros."""
    out = None
    for k in range(eidx.shape[-1]):
        g = (
            jnp.take(xds[0], eidx[..., k], axis=-1),
            jnp.take(xds[1], eidx[..., k], axis=-1),
        )
        term = ds.mul((vp[0][..., k], vp[1][..., k]), g)
        out = term if out is None else ds.add(out, term)
    return out


def _gather_apply_ds(wp, idx, vds):
    """DS twin of NestedMultiShiftMultigrid._gather_apply (the K-unrolled
    transfer gathers)."""
    out = None
    for k in range(idx.shape[-1]):
        g = (
            jnp.take(vds[0], idx[..., k], axis=-1),
            jnp.take(vds[1], idx[..., k], axis=-1),
        )
        term = ds.mul((wp[0][..., k], wp[1][..., k]), g)
        out = term if out is None else ds.add(out, term)
    return out


class _DSFlatLevel:
    """Static (trace-time) structure of one flat multigrid level at ω = 0:
    DIA offsets or the ELL slot count, plus the row-constant Chebyshev
    smoothing scalars (at ω ≡ 0 the per-row λ rows of row_params collapse
    to one value — same derivation, host f64, pre-split)."""

    def __init__(self, lev):
        self.fmt = getattr(lev, "fmt", "dia")
        self.offA = lev.offA
        lam = 1.1 * float((lev.rsA / lev.dA).max())
        self.inv_theta = ds.split_scalar(1.0 / (0.625 * lam))
        self.inv_delta = ds.split_scalar(1.0 / (0.375 * lam))
        # Factored-transfer eligibility mirrors the f64 vcycle's gate
        # (fmt == 'dia' and the aggregation parts exist).
        self.fact = self.fmt == "dia" and getattr(lev, "agg", None) is not None
        self.Kp = lev.Pidx.shape[-1]
        self.Kr = lev.Ridx.shape[-1]

    def op(self, xds, lp):
        if self.fmt == "dia":
            return _dia_apply_ds(xds, self.offA, lp["Av"])
        return _ell_apply_ds(xds, lp["eidx"], lp["ewA"])

    def params(self, lev, use_fact):
        """Device params for this level (value/idx arrays — threaded
        through the leg jit as arguments, never closed over)."""
        lp = {"invd": _pair64(1.0 / lev.dA)}
        if self.fmt == "dia":
            lp["Av"] = _pair64(lev.Av)
        else:
            lp["eidx"] = jnp.asarray(lev.eidx)
            lp["ewA"] = _pair64(lev.ewA)
        if use_fact and self.fact:
            lp["agg"] = jnp.asarray(lev.agg)
            lp["tw"] = _pair64(lev.tw)
            lp["wd"] = _pair64(lev.wd)
            lp["mem_idx"] = jnp.asarray(lev.mem_idx)
            # mem_w is an exact 0/1 validity mask — one f32 channel.
            lp["mem_w"] = jnp.asarray(lev.mem_w, jnp.float32)
        else:
            lp["Pidx"] = jnp.asarray(lev.Pidx)
            lp["Pw"] = _pair64(lev.Pw)
            lp["Ridx"] = jnp.asarray(lev.Ridx)
            lp["Rw"] = _pair64(lev.Rw)
        return lp


class DSFlatKYCycle:
    """K_Y's multi-shift V-cycle at ω ≡ 0 on a flat-dof hierarchy in DS
    arithmetic — mirrors NestedMultiShiftMultigrid / SAMultiShiftMultigrid
    .vcycle/solve (XLA forms, pallas=None: the f64 legs never engage
    kernels) so the DS legs evaluate the same operator the f64 legs
    define, including the factored-transfer form where the f64 path uses
    it (SA DIA levels with factored_transfers=True)."""

    def __init__(self, ms):
        self.levels = [_DSFlatLevel(lev) for lev in ms.levels]
        self.nu = ms.nu
        self.nu_post = ms.nu if ms.nu_post is None else ms.nu_post
        self.use_fact = bool(getattr(ms, "factored_transfers", False))
        self._ms = ms  # host structure (params construction only)

    def level_params(self):
        return [
            dl.params(lev, self.use_fact)
            for dl, lev in zip(self.levels, self._ms.levels)
        ]

    _SIGMA = MultiShiftMultigrid._SIGMA

    def _smooth(self, lev: _DSFlatLevel, lp, xds, bds, nu: int):
        sigma = self._SIGMA
        if xds is None:  # zero initial guess: r = invd ⊙ b
            r = ds.mul(lp["invd"], bds)
        else:
            r = ds.mul(lp["invd"], ds.sub(bds, lev.op(xds, lp)))
        d = ds.scale(r, lev.inv_theta)
        xds = d if xds is None else ds.add(xds, d)
        rho = 1.0 / sigma
        for _ in range(nu - 1):
            rho_new = 1.0 / (2.0 * sigma - rho)
            r = ds.sub(r, ds.mul(lp["invd"], lev.op(d, lp)))
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

    # ------------------------------------------------------- transfers

    def _restrict(self, lev: _DSFlatLevel, lp, rds):
        if "mem_idx" in lp:
            # Factored Pᵀ·r = Tᵀ(I − ωAD⁻¹)·r (SAMultiShiftMultigrid
            # ._restrict_fact): banded A matvec + exact 0/1 member sums.
            u = ds.sub(rds, lev.op(ds.mul(lp["wd"], rds), lp))
            u = ds.mul(lp["tw"], u)
            out = None
            for k in range(lp["mem_idx"].shape[-1]):
                w = lp["mem_w"][..., k]  # exactly 0 or 1
                g = (
                    w * jnp.take(u[0], lp["mem_idx"][..., k], axis=-1),
                    w * jnp.take(u[1], lp["mem_idx"][..., k], axis=-1),
                )
                out = g if out is None else ds.add(out, g)
            return out
        return _gather_apply_ds(lp["Rw"], lp["Ridx"], rds)

    def _interp(self, lev: _DSFlatLevel, lp, eds):
        if "mem_idx" in lp:
            # Factored P·e = (I − ωD⁻¹A)·T·e: K=1 parent gather (exact)
            # + banded A matvec.
            g = ds.mul(
                lp["tw"],
                (
                    jnp.take(eds[0], lp["agg"], axis=-1),
                    jnp.take(eds[1], lp["agg"], axis=-1),
                ),
            )
            return ds.sub(g, ds.mul(lp["wd"], lev.op(g, lp)))
        return _gather_apply_ds(lp["Pw"], lp["Pidx"], eds)

    def _coarse(self, bds, cinv64):
        """Coarsest solve in genuine f64 (tiny (…, m_c) arrays) — same
        right-multiply as heateq.apply_KY's coarse callback."""
        b64 = ds.to_f64(bds)
        sh = b64.shape
        mc = cinv64.shape[0]
        out = jnp.dot(
            b64.reshape(-1, mc), cinv64, precision=jax.lax.Precision.HIGHEST
        )
        return ds.from_f64(out.reshape(sh))

    def vcycle(self, bds, lps, cinv64, lvl=0):
        if lvl == len(self.levels):
            return self._coarse(bds, cinv64)
        lev = self.levels[lvl]
        lp = lps[lvl]
        x = self._smooth(lev, lp, None, bds, self.nu)
        r = ds.sub(bds, lev.op(x, lp))
        ec = self.vcycle(self._restrict(lev, lp, r), lps, cinv64, lvl + 1)
        x = ds.add(x, self._interp(lev, lp, ec))
        return self._smooth(lev, lp, x, bds, self.nu_post)

    def solve(self, bds, lps, cinv64, cycles):
        x = self.vcycle(bds, lps, cinv64)
        for _ in range(cycles - 1):
            r = ds.sub(bds, self.levels[0].op(x, lps[0]))
            x = ds.add(x, self.vcycle(r, lps, cinv64))
        return x


class DSFlatResidual(DSResidual):
    """r = f − S·u in DS arithmetic for the flat-dof multigrid regimes:
    nested red-refinement hierarchies and smoothed-aggregation AMG
    (inner='mg'/'amg' on unstructured meshes, spatial_format 'dia'/'ell').

    The spatial M/A are the fine DIA matrices (the 'ell' spatial format's
    f64 path falls back to the same DIA values — heateq._spmv_generic);
    K_Y is the DS flat V-cycle above; the trace row runs the solver's own
    f64 path with the three f64 arrays it reads (dia_Mv / cheb_invM /
    cheb_coefM) threaded through the leg params."""

    @staticmethod
    def supported(solver) -> bool:
        from ..ops.multigrid import NestedMultiShiftMultigrid as NMS

        return (
            solver.inner == "mg"
            and isinstance(getattr(solver, "msmg", None), NMS)
            and solver.spatial_format in ("dia", "ell")
            and getattr(solver, "_dia_host", None) is not None
        )

    def __init__(self, solver):
        if not self.supported(solver):
            raise ValueError(
                "DS flat legs need the nested/SA flat-dof mg regime"
            )
        self.gs = solver.gs  # (m,)
        self.N = solver.N
        self.ky = DSFlatKYCycle(solver.msmg)
        self.cycles = solver.mg_cycles
        self._offM = solver._dia_off["M"]
        self._offA = solver._dia_off["A"]
        self._solver = solver

    # ------------------------------------------------------ operator hooks

    def _applyM(self, xds, p):
        return _dia_apply_ds(xds, self._offM, p["Mv"])

    def _applyA(self, xds, p):
        return _dia_apply_ds(xds, self._offA, p["Av"])

    def _ky_solve(self, vds, p):
        return self.ky.solve(vds, p["ky"], p["mg_cinv_ky"], self.cycles)

    def _trace64(self, u64_row, p):
        return self._solver._trace_row(u64_row, p["tr64"])

    def params(self):
        sv = self._solver
        h = np.asarray(sv._host["h"], np.float64)
        from ..ops.stencil import row_scale

        pair_rows = lambda v: (
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
            "h_half": pair_rows(0.5 * h),
            "h_stab": pair_rows(h / 16.0),
            "inv_h": pair_rows(1.0 / h),
            "Mv": _pair64(sv._dia_host["Mv"]),
            "Av": _pair64(sv._dia_host["Av"]),
            "ky": self.ky.level_params(),
            "mg_cinv_ky": jnp.asarray(sv._host["mg_cinv_ky"], jnp.float64),
            # The f64 trace row reads exactly these three entries of the
            # solver's f64 params (heateq._trace_row → _spmv_M/_apply_Minv).
            "tr64": {
                "dia_Mv": jnp.asarray(sv._dia_host["Mv"], jnp.float64),
                "cheb_invM": jnp.asarray(
                    sv._host["cheb_invM"], jnp.float64
                ).reshape(self.gs),
                "cheb_coefM": jnp.asarray(
                    sv._host["cheb_coefM"], jnp.float64
                ),
            },
        }


def make_ds_residual(solver):
    """The DS residual class supporting ``solver``, or None (structured
    constant-stencil regime → DSResidual; nested/SA flat regimes →
    DSFlatResidual; everything else keeps the f64 legs)."""
    if DSResidual.supported(solver):
        return DSResidual(solver)
    if DSFlatResidual.supported(solver):
        return DSFlatResidual(solver)
    return None
