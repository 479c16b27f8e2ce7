"""Pallas TPU kernels for the multi-shift multigrid smoother and operator.

The Chebyshev–Jacobi smoother of ops/multigrid.MultiShiftMultigrid is the
hot loop of every V-cycle: each degree applies Op = A + ω⊙M (two stencils,
a per-time-row shift) plus axpy updates. The XLA form costs ~6 memory
passes per Op application (pad materializations + separate fusions,
measured 2.0 ms at 511²×128 where 2 passes ≈ 0.65 ms); these kernels fuse
a whole degree-ν smoothing sweep — 2ν stencil applications and all the
recurrence updates — into one pass over (x, b).

Structure mirrors ops/kron_pallas.py (same Mosaic constraints):

- grid over (time blocks, y blocks); y halos come as 8-row slab operands
  with clamped index maps and in-kernel edge masking (= Dirichlet zeros);
  remaining spatial axes stay whole per block with in-kernel zero pad.
- there is NO time coupling: ω and the per-row Chebyshev coefficients
  (1/D, 1/θ, 1/δ — functions of the row's shift) enter as (T, 1, 128)
  column operands, broadcast inside the kernel.
- each chained Op application consumes one halo row per side, so the
  kernel computes on a shrinking window: x needs ν halo rows (ν−1 when
  the initial guess is zero — the V-cycle's pre-smoother), well within
  the 8-row slabs.

The smoother's arithmetic matches MultiShiftMultigrid._smooth exactly
(same recurrence, same σ = 5/3); f32 reassociation differs only inside the
fused stencil sums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kron_pallas as _kp
from .kron_pallas import _HALO, _live_factor, _stencil, _weight_groups

_SIGMA = 5.0 / 3.0  # theta/delta for the lmin = lmax/4 smoothing range


def _col_spec(TB):
    return pl.BlockSpec(
        (TB, 1, 128), lambda ti, yi: (ti, 0, 0), memory_space=pltpu.VMEM
    )


def _col(ref, dim):
    h = ref[:, 0, 0:1]
    return h.reshape((h.shape[0],) + (1,) * dim)


def _y_specs(TB, YB, gs, blocked):
    """BlockSpecs for one spatial field: mid (+ 8-row up/dn slabs when y is
    blocked). Time axis is aligned TB blocks (no time coupling here)."""
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    zeros = (0,) * len(rest)
    nyb8 = pl.cdiv(ny, _HALO)

    def spec(yb, ymap):
        return pl.BlockSpec(
            (TB,) + rest + (yb, nx),
            lambda ti, yi, ymap=ymap: (ti,) + zeros + (ymap(yi), 0),
            memory_space=pltpu.VMEM,
        )

    if not blocked:
        return [spec(ny, lambda yi: 0)]
    s = YB // _HALO
    return [
        spec(YB, lambda yi: yi),
        spec(_HALO, lambda yi: jnp.maximum(yi * s - 1, 0)),
        spec(_HALO, lambda yi: jnp.minimum(yi * s + s, nyb8 - 1)),
    ]


def _window(refs, yi, YB, ny, halo, blocked):
    """Assemble a (TB, …, YB+2·halo, nx) window with ``halo`` valid rows on
    each side of the y block (zero beyond the domain / block padding)."""
    if not blocked:
        return refs[0][...]
    mid, up, dn = (r[...] for r in refs)
    y0 = yi * YB
    rows = jax.lax.broadcasted_iota(jnp.int32, (YB, 1), 0)
    mask = (y0 + rows < ny).reshape((1,) * (mid.ndim - 2) + (YB, 1))
    mid = jnp.where(mask, mid, 0.0)
    if halo == 0:
        return mid
    hrow = jax.lax.broadcasted_iota(jnp.int32, (halo, 1), 0)
    um = ((y0 - halo + hrow) >= 0).reshape((1,) * (mid.ndim - 2) + (halo, 1))
    dm = ((y0 + YB + hrow) <= ny - 1).reshape((1,) * (mid.ndim - 2) + (halo, 1))
    u = jnp.where(um, up[..., _HALO - halo :, :], 0.0)
    d = jnp.where(dm, dn[..., :halo, :], 0.0)
    return jnp.concatenate([u, mid, d], axis=-2)


def _crop(A, k):
    """Drop k rows from each side of the blocked axis (no-op if k == 0)."""
    if k == 0:
        return A
    return A[..., k:-k, :]


def _domain_mask(A, yi, YB, ny, g):
    """Zero the rows of a halo-g window that fall outside [0, ny): the
    shrinking-window recurrence computes values at virtual out-of-domain
    rows near the domain edges, but anything fed back into Op must be zero
    there (Dirichlet) — exactly what the unblocked zero-pad does."""
    y0 = yi * YB
    rows = jax.lax.broadcasted_iota(jnp.int32, (YB + 2 * g, 1), 0)
    gid = y0 - g + rows
    ok = ((gid >= 0) & (gid < ny)).reshape((1,) * (A.ndim - 2) + (YB + 2 * g, 1))
    return jnp.where(ok, A, 0.0)


def _op_rows(X, omega, groups_A, groups_M, gs, yb):
    """A(X) + ω·M(X) on the interior rows of a haloed window.

    ``yb``: number of output rows along the blocked axis; None = unblocked
    (zero-pad the blocked axis like the others)."""
    return _stencil(X, groups_A, gs, yb) + omega * _stencil(X, groups_M, gs, yb)


@functools.partial(
    jax.jit,
    static_argnames=(
        "groups_A", "groups_M", "gs", "TB", "YB", "nu", "zero_init", "interpret"
    ),
)
def _smooth_call(
    x, b, omega, invD, invT, invDel, *, groups_A, groups_M, gs, TB, YB, nu,
    zero_init=False, interpret=False,
):
    """One degree-ν Chebyshev–Jacobi sweep: returns the smoothed x.

    zero_init=True computes the x = 0 pre-smoother (x operand ignored;
    callers pass b twice)."""
    T = b.shape[0]
    dim = len(gs)
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    zeros = (0,) * len(rest)
    blocked = YB < ny
    # r and d carry halo G = nu-1 right after initialization in both modes;
    # each chained Op application then consumes one halo row per side.
    G = nu - 1
    if blocked and G + 1 > _HALO:
        raise ValueError(f"nu={nu} needs {G + 1} halo rows > slab {_HALO}")
    n_f = 3 if blocked else 1

    def yb_rows(halo):
        """Blocked-axis row count of a window with the given halo."""
        return (YB + 2 * halo) if blocked else None

    def kernel(om_ref, iD_ref, iT_ref, iDel_ref, *refs):
        out_ref = refs[-1]
        yi = pl.program_id(1)
        om = _col(om_ref, dim)
        iD = _col(iD_ref, dim)
        iT = _col(iT_ref, dim)
        iDel = _col(iDel_ref, dim)
        Bw = _window(refs[n_f : 2 * n_f], yi, YB, ny, G, blocked)
        if zero_init:
            r = iD * Bw
            x_acc = None
        else:
            Xw = _window(refs[:n_f], yi, YB, ny, G + 1, blocked)
            r = iD * (Bw - _op_rows(Xw, om, groups_A, groups_M, gs, yb_rows(G)))
            x_acc = _crop(Xw, 1 if blocked else 0)
        d = r * iT
        x_acc = d if x_acc is None else x_acc + d
        rho = 1.0 / _SIGMA
        for k in range(1, nu):
            rho_new = 1.0 / (2.0 * _SIGMA - rho)
            if blocked:
                d = _domain_mask(d, yi, YB, ny, G - k + 1)
            Opd = _op_rows(d, om, groups_A, groups_M, gs, yb_rows(G - k))
            c = 1 if blocked else 0
            r = _crop(r, c) - iD * Opd
            d = rho_new * rho * _crop(d, c) + (2.0 * rho_new) * iDel * r
            x_acc = _crop(x_acc, c) + d
            rho = rho_new
        out_ref[...] = x_acc

    specs = (
        [_col_spec(TB)] * 4
        + _y_specs(TB, YB, gs, blocked)  # x
        + _y_specs(TB, YB, gs, blocked)  # b
    )
    out_spec = pl.BlockSpec(
        (TB,) + rest + (YB, nx),
        lambda ti, yi: (ti,) + zeros + (yi, 0),
        memory_space=pltpu.VMEM,
    )
    kwargs = {}
    if not interpret:
        vol = int(np.prod(gs, dtype=int))
        taps = len(groups_A) + len(groups_M)
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * taps * nu * T * vol,
                bytes_accessed=b.dtype.itemsize * T * vol * 3,
                transcendentals=0,
            ),
        )
    # Ragged time is safe here (no time coupling): tail-block garbage rows
    # never mix into valid rows and their writes are masked.
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((T,) + gs, b.dtype),
        interpret=interpret,
        **kwargs,
    )(omega, invD, invT, invDel, *([x] * n_f), *([b] * n_f))


@functools.partial(
    jax.jit,
    static_argnames=("groups_A", "groups_M", "gs", "TB", "YB", "alpha", "interpret"),
)
def _residual_call(
    x, b, omega, *, groups_A, groups_M, gs, TB, YB, alpha=1.0, interpret=False
):
    """out = α·b − (A(x) + ω⊙M(x)) in one fused pass (α static)."""
    T = b.shape[0]
    dim = len(gs)
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    zeros = (0,) * len(rest)
    blocked = YB < ny
    n_f = 3 if blocked else 1

    def kernel(om_ref, *refs):
        out_ref = refs[-1]
        yi = pl.program_id(1)
        om = _col(om_ref, dim)
        Xw = _window(refs[:n_f], yi, YB, ny, 1 if blocked else 0, blocked)
        Bw = _window(refs[n_f : 2 * n_f], yi, YB, ny, 0, blocked)
        op = _op_rows(Xw, om, groups_A, groups_M, gs, YB if blocked else None)
        out_ref[...] = alpha * Bw - op

    specs = (
        [_col_spec(TB)]
        + _y_specs(TB, YB, gs, blocked)
        + _y_specs(TB, YB, gs, blocked)
    )
    out_spec = pl.BlockSpec(
        (TB,) + rest + (YB, nx),
        lambda ti, yi: (ti,) + zeros + (yi, 0),
        memory_space=pltpu.VMEM,
    )
    kwargs = {}
    if not interpret:
        vol = int(np.prod(gs, dtype=int))
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * (len(groups_A) + len(groups_M)) * T * vol,
                bytes_accessed=b.dtype.itemsize * T * vol * 3,
                transcendentals=0,
            ),
        )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((T,) + gs, b.dtype),
        interpret=interpret,
        **kwargs,
    )(omega, *([x] * n_f), *([b] * n_f))


def _pick_blocks_mg(T, gs, itemsize):
    """(TB, YB) for the smoother kernels; same budget model as kron_pallas
    but with a live set of ~6 windows."""
    ny, nx = gs[-2], gs[-1]
    rest = int(np.prod(gs[:-2], dtype=int)) if len(gs) > 2 else 1
    budget = _kp._VMEM_BUDGET  # dynamic: tests shrink it to force blocking
    lf = _live_factor(len(gs)) - 2  # one field fewer live than the kron pair
    per_row = rest * nx * itemsize
    TB = 1
    for cand in (32, 16, 8, 4, 2):  # ragged time is fine; prefer big blocks
        if cand * (ny + 2) * per_row * lf <= budget:
            TB = cand
            break
    TB = min(TB, max(T, 1))
    if TB * (ny + 2) * per_row * lf <= budget:
        return TB, ny
    TB = min(8, max(T, 1))
    # Halved in blocked mode (larger live set; see kron_pallas._pick_blocks).
    YB = max(_HALO, (budget // (2 * TB * per_row * lf)) // _HALO * _HALO)
    return TB, min(YB, ny)


class MSPallasLevel:
    """Pallas smoother/residual for one multigrid level of
    MultiShiftMultigrid. Per-row Chebyshev columns are built host-side from
    the same formulas as MultiShiftMultigrid.row_params and live in the
    params pytree."""

    def __init__(self, A_st, M_st, T: int, dtype, nu: int, interpret=False):
        self.gs = tuple(A_st.grid_shape)
        self.groups_A = _weight_groups(A_st.disps, A_st.weights)
        self.groups_M = _weight_groups(M_st.disps, M_st.weights)
        self.nu = nu
        self.interpret = interpret
        self.TB, self.YB = _pick_blocks_mg(T, self.gs, jnp.dtype(dtype).itemsize)

    @staticmethod
    def columns(lev, omega_rows: np.ndarray, dtype):
        """(T,1,128) per-row coefficient columns for level ``lev``
        (an ops.multigrid._MSLevel)."""
        inv_diag = 1.0 / (lev.cA + omega_rows * lev.cM)
        lam_max = 1.1 * (lev.gA + omega_rows * lev.gM) * inv_diag
        cols = {
            "omega": omega_rows,
            "invD": inv_diag,
            "invT": 1.0 / (0.625 * lam_max),
            "invDel": 1.0 / (0.375 * lam_max),
        }
        to128 = lambda a: jnp.broadcast_to(
            jnp.asarray(a, dtype)[:, None, None], (a.shape[0], 1, 128)
        ).copy()
        return {k: to128(v) for k, v in cols.items()}

    def smooth(self, x, b, cols, zero_init=False):
        return _smooth_call(
            b if zero_init else x, b,
            cols["omega"], cols["invD"], cols["invT"], cols["invDel"],
            groups_A=self.groups_A, groups_M=self.groups_M, gs=self.gs,
            TB=self.TB, YB=self.YB, nu=self.nu, zero_init=zero_init,
            interpret=self.interpret,
        )

    def residual(self, x, b, cols):
        return _residual_call(
            x, b, cols["omega"],
            groups_A=self.groups_A, groups_M=self.groups_M, gs=self.gs,
            TB=self.TB, YB=self.YB, interpret=self.interpret,
        )
