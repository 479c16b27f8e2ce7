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
from .kron_pallas import (
    _HALO, _hcol, _i32_specs, _live_factor, _stencil, _weight_groups,
)

_SIGMA = 5.0 / 3.0  # theta/delta for the lmin = lmax/4 smoothing range

# Hardware engagement of the BLOCKED sharded semi-fused transfer stages
# (round-5): the blocked layout is the same kernel family the serial
# hardware path runs (the 255²+ unblocked fault class never applies).
# PROBED on the real chip (results_tpu/r5_sh_blocked_probe.jsonl): all
# four production slab shapes — 2-D 1023² at own 512/256/128 (h=2 and the
# odd-h slice path) and 3-D z-sharded 127³ — compile, dispatch stably
# (3 steady dispatches each, ~24-27 ms/stage), and match the XLA
# reference to ~7e-6 (the bf16-split transfer-dot tolerance). Interpret
# mode ignores this flag.
SH_BLOCKED_HW = True


def _col_spec(TB):
    return pl.BlockSpec(
        (TB, 1, 128), lambda ti, yi: (ti, 0, 0), memory_space=pltpu.VMEM
    )


_col = _hcol  # same (TT, 1, 128) -> (TT, 1, …, 1) column convention


def _y_specs(TB, YB, gs, blocked, t_map=None):
    """BlockSpecs for one spatial field: mid (+ 8-row up/dn slabs when y is
    blocked). Time axis is aligned TB blocks (no time coupling here).
    ``t_map``: time index map override (e.g. ``lambda ti: 0`` for a field
    broadcast over time, like the sharded-slab validity mask)."""
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    zeros = (0,) * len(rest)
    nyb8 = pl.cdiv(ny, _HALO)
    tm = (lambda ti: ti) if t_map is None else t_map

    def spec(yb, ymap):
        return pl.BlockSpec(
            (TB,) + rest + (yb, nx),
            lambda ti, yi, ymap=ymap: (tm(ti),) + zeros + (ymap(yi), 0),
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


@functools.lru_cache(maxsize=None)
def _pair_groups(groups_A, groups_M):
    """Regroup two same-support stencils by their (wA, wM) weight PAIR.

    A and M are P1 forms on the same mesh — identical tap displacements —
    so applying them as two separate grouped stencils loads every tap
    twice. Grouping by the weight pair shares the tap sums: each pair
    group costs its tap adds once plus two scalar multiplies (one into the
    A accumulator, one into the M accumulator). For the 7-point 2D P1 pair
    this roughly halves the smoother's VPU work — the fused V-cycle stages
    are compute-bound, not DMA-bound (measured 228 GB/s effective at
    1023²×129 vs the kron kernels' ~580)."""
    wA = {d: w for w, ds in groups_A for d in ds}
    wM = {d: w for w, ds in groups_M for d in ds}
    pairs: dict[tuple[float, float], list] = {}
    for d in {**wA, **wM}:
        key = (wA.get(d, 0.0), wM.get(d, 0.0))
        if key != (0.0, 0.0):
            pairs.setdefault(key, []).append(d)
    return tuple((k, tuple(ds)) for k, ds in pairs.items())


def _op_rows(X, omega, groups_A, groups_M, gs, yb):
    """A(X) + ω·M(X) on the interior rows of a haloed window, with the tap
    loads shared between the two stencils (see _pair_groups) and the two
    weights folded into ONE per-row combined weight per group:
    (wa + ω·wm)·Σtaps. The fold happens on the (T, 1, …) ω column —
    negligible — and saves the separate A/M accumulators' full-tile
    multiply-adds (measured VPU-bound: ~12 → ~7 beyond-tap ops per 3D Op
    application). Pure 2-term reassociation vs the XLA form (~1 ulp).

    ``yb``: number of output rows along the blocked axis; None = unblocked
    (zero-pad the blocked axis like the others)."""
    tap = _kp._tap_fn(X, gs, yb)
    out = None
    for (wa, wm), ds in _pair_groups(groups_A, groups_M):
        acc = None
        for disp in ds:
            t = tap(disp)
            acc = t if acc is None else acc + t
        if wm == 0.0:
            w = wa
        elif wa == 0.0:
            w = omega * wm
        else:
            w = wa + omega * wm
        out = w * acc if out is None else out + w * acc
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "groups_A", "groups_M", "gs", "TB", "YB", "nu", "zero_init", "interpret"
    ),
)
def _smooth_call(
    x, b, omega, invD, invT, invDel, vmask=None, *, groups_A, groups_M, gs,
    TB, YB, nu, zero_init=False, interpret=False,
):
    """One degree-ν Chebyshev–Jacobi sweep: returns the smoothed x.

    zero_init=True computes the x = 0 pre-smoother (x operand ignored;
    callers pass b twice).

    ``vmask``: optional (1, *gs) 0/1 validity field for SHARDED slabs
    (parallel/explicit2d): planes marked 0 (grid padding past the physical
    boundary, halo planes beyond the global domain) get every residual
    update zeroed — the in-kernel twin of the sharded XLA smoother's
    zero-scale padding discipline, which is what keeps V-cycle outputs
    exactly zero there. Costs one elementwise multiply per recurrence step;
    zero cost when None (the operand is not wired in)."""
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
    has_mask = vmask is not None

    def yb_rows(halo):
        """Blocked-axis row count of a window with the given halo."""
        return (YB + 2 * halo) if blocked else None

    # zero_init ignores x entirely — drop its operand group so the pipeline
    # does not DMA a second full copy of the input per grid step (the
    # pre-smoother of every V-cycle is zero-init; measured memory-bound).
    n_x = 0 if zero_init else n_f

    def kernel(om_ref, iD_ref, iT_ref, iDel_ref, *refs):
        out_ref = refs[-1]
        yi = pl.program_id(1)
        om = _col(om_ref, dim)
        iD = _col(iD_ref, dim)
        iT = _col(iT_ref, dim)
        iDel = _col(iDel_ref, dim)
        Bw = _window(refs[n_x : n_x + n_f], yi, YB, ny, G, blocked)
        Mw = (
            _window(refs[n_x + n_f : n_x + 2 * n_f], yi, YB, ny, G, blocked)
            if has_mask else None
        )
        if zero_init:
            r = iD * Bw
            x_acc = None
        else:
            Xw = _window(refs[:n_f], yi, YB, ny, G + 1, blocked)
            r = iD * (Bw - _op_rows(Xw, om, groups_A, groups_M, gs, yb_rows(G)))
            x_acc = _crop(Xw, 1 if blocked else 0)
        if has_mask:
            r = Mw * r
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
            if has_mask:
                Mw = _crop(Mw, c)
                r = Mw * r
            d = rho_new * rho * _crop(d, c) + (2.0 * rho_new) * iDel * r
            x_acc = _crop(x_acc, c) + d
            rho = rho_new
        out_ref[...] = x_acc

    specs = (
        [_col_spec(TB)] * 4
        + _y_specs(TB, YB, gs, blocked) * (0 if zero_init else 1)  # x
        + _y_specs(TB, YB, gs, blocked)  # b
        + (
            _y_specs(1, YB, gs, blocked, t_map=lambda ti: 0)
            if has_mask else []
        )
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
                bytes_accessed=b.dtype.itemsize * T * vol * (2 if zero_init else 3),
                transcendentals=0,
            ),
        )
    # Ragged time is safe here (no time coupling): tail-block garbage rows
    # never mix into valid rows and their writes are masked.
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([out_spec])[0],
        out_shape=jax.ShapeDtypeStruct((T,) + gs, b.dtype),
        interpret=interpret,
        **kwargs,
    )(
        omega, invD, invT, invDel, *([x] * n_x), *([b] * n_f),
        *([vmask] * n_f if has_mask else []),
    )


@functools.partial(
    jax.jit,
    static_argnames=("groups_A", "groups_M", "gs", "TB", "YB", "interpret"),
)
def _residual_call(
    x, b, omega, *, groups_A, groups_M, gs, TB, YB, interpret=False
):
    """out = b − (A(x) + ω⊙M(x)) in one fused pass."""
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
        out_ref[...] = Bw - op

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
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([out_spec])[0],
        out_shape=jax.ShapeDtypeStruct((T,) + gs, b.dtype),
        interpret=interpret,
        **kwargs,
    )(omega, *([x] * n_f), *([b] * n_f))


@functools.partial(
    jax.jit,
    static_argnames=("groups", "gs", "TB", "YB", "interpret"),
)
def _apply_stencil_call(x, *, groups, gs, TB, YB, interpret=False):
    """out = Op(x) for a single constant stencil, one fused pass.

    Used for the plain A application between the two shifted solves of the
    K_X sandwich (solver.apply_KX): the XLA stencil form costs ~6 memory
    passes there (pad materializations + separate fusions, measured ~3x a
    fused pass at 511²×128)."""
    T = x.shape[0]
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    zeros = (0,) * len(rest)
    blocked = YB < ny
    n_f = 3 if blocked else 1

    def kernel(*refs):
        out_ref = refs[-1]
        yi = pl.program_id(1)
        Xw = _window(refs[:n_f], yi, YB, ny, 1 if blocked else 0, blocked)
        out_ref[...] = _stencil(Xw, groups, gs, YB if blocked else None)

    specs = _y_specs(TB, YB, gs, blocked)
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
                flops=2 * len(groups) * T * vol,
                bytes_accessed=x.dtype.itemsize * T * vol * 2,
                transcendentals=0,
            ),
        )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([out_spec])[0],
        out_shape=jax.ShapeDtypeStruct((T,) + gs, x.dtype),
        interpret=interpret,
        **kwargs,
    )(*([x] * n_f))


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
    # Blocked mode: walk TB down until the blocked live-set estimate fits a
    # measured-safe cap. In 3D the estimate tracks Mosaic's actual scoped
    # VMEM closely: at (64,127³) f32 the fixed TB=8 choice estimated 113.5M
    # and the real smoother request was 117.89M — over the 110M limit
    # (measured big-3D compile OOM); TB=4 fits with ~2× margin. 2D blocked
    # shapes sit far below the cap, so their TB=8 choice is unchanged.
    cap = 64 * 1024 * 1024
    for TB in (8, 4, 2, 1):
        if TB > max(T, 1):
            continue
        # Halved budget in blocked mode (larger live set; see
        # kron_pallas._pick_blocks).
        yb_fit = (budget // (2 * TB * per_row * lf))
        # Prefer 16-aligned YB: _fused_supported requires YB % 16 == 0
        # (coarse slab alignment), and an 8-only-aligned choice silently
        # dropped the fused V-cycle kernels at exactly the largest grids
        # (56 -> 48 etc.).
        YB = yb_fit // 16 * 16
        if YB == 0:
            YB = max(_HALO, yb_fit // _HALO * _HALO)
        YB = min(YB, ny)
        if TB == 1 or TB * (YB + 2) * per_row * lf <= cap:
            break
    return TB, YB


class MSPallasLevel:
    """Pallas smoother/residual for one multigrid level of
    MultiShiftMultigrid. Per-row Chebyshev columns are built host-side from
    the same formulas as MultiShiftMultigrid.row_params and live in the
    params pytree."""

    def __init__(self, A_st, M_st, T: int, dtype, nu: int, interpret=False,
                 nu_post: int | None = None):
        self.gs = tuple(A_st.grid_shape)
        self.groups_A = _weight_groups(A_st.disps, A_st.weights)
        self.groups_M = _weight_groups(M_st.disps, M_st.weights)
        self.nu = nu
        # Post-smoothing degree (V(nu, nu_post) cycles — see
        # ops/multigrid.MultiShiftMultigrid.nu_post). Separate kernel per
        # degree (the sweep is unrolled in the kernel body).
        self.nu_post = nu if nu_post is None else nu_post
        self.dtype = jnp.dtype(dtype)
        self.interpret = interpret
        self.TB, self.YB = _pick_blocks_mg(T, self.gs, jnp.dtype(dtype).itemsize)
        ny = self.gs[-2]
        if not interpret and self.YB >= ny and ny >= 33:
            # The fused kernels' unblocked layout is correct in interpret
            # mode but faults the TPU worker (measured at 255²); force a
            # blocked y layout so the fused path is hardware-safe.
            self.YB = max(16, ((ny + 1) // 2) // 16 * 16)
        if not interpret and self.YB < ny:
            # Mosaic compile time scales with the number of grid programs
            # (measured: 3D fused_pre at T=17 takes 625 s with TB=1 / 34
            # programs but 56 s with TB=4 / 10); push TB up within a
            # conservative VMEM model (~10 live windows, 40 MB — TB=8 at
            # 63³ standalone fits, but inside the full solve module XLA's
            # VMEM accounting hit 192 MB, measured OOM). Applies to any
            # blocked layout: the 255²+ unblocked->blocked override above
            # otherwise leaves 2D at the TB the (larger) unblocked estimate
            # picked, with the same program-count blowup.
            per_win = (
                int(np.prod(self.gs[:-2], dtype=int))
                * (self.YB + 8) * self.gs[-1] * jnp.dtype(dtype).itemsize
            )
            for cand in (4, 2):
                if cand <= T and cand * per_win * 10 <= 40 * 1024 * 1024:
                    self.TB = max(self.TB, cand)
                    break
        # Transfer-stage blocks (semi-fused residual+restrict /
        # prolong+correct): blocked YB must be 16-aligned for the coarse
        # slab math, so the smoother's VMEM-capped blocked-3D YB=8 pick
        # rises to 16 here — these kernels hold far fewer live windows
        # (one stencil application + two banded dots, no nu-sweep); TB
        # walks down under the same style of live-set estimate.
        self.TBt, self.YBt = self.TB, self.YB
        if self.YBt < ny and self.YBt % 16:
            self.YBt = 16
        if self.YBt < ny:
            per_t = (
                int(np.prod(self.gs[:-2], dtype=int))
                * (self.YBt + 16) * self.gs[-1] * jnp.dtype(dtype).itemsize
            )
            while self.TBt > 1 and self.TBt * per_t * 12 > 64 * 1024 * 1024:
                self.TBt //= 2

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

    def smooth(self, x, b, cols, zero_init=False, post=False, vmask=None):
        return _smooth_call(
            b if zero_init else x, b,
            cols["omega"], cols["invD"], cols["invT"], cols["invDel"],
            vmask,
            groups_A=self.groups_A, groups_M=self.groups_M, gs=self.gs,
            TB=self.TB, YB=self.YB,
            nu=self.nu_post if post else self.nu, zero_init=zero_init,
            interpret=self.interpret,
        )

    def residual(self, x, b, cols):
        return _residual_call(
            x, b, cols["omega"],
            groups_A=self.groups_A, groups_M=self.groups_M, gs=self.gs,
            TB=self.TB, YB=self.YB, interpret=self.interpret,
        )

    def apply_A(self, x):
        """Plain stiffness application A(x) as one fused pass (the middle
        step of the K_X sandwich)."""
        return _apply_stencil_call(
            x, groups=self.groups_A, gs=self.gs, TB=self.TB, YB=self.YB,
            interpret=self.interpret,
        )

    # ------------------------------------------------- fused V-cycle stages

    @property
    def fused_ok(self) -> bool:
        # The fully fused stages bake ONE nu; asymmetric V(nu, nu_post)
        # rides the semi/plain paths instead.
        return self.nu_post == self.nu and _fused_supported(
            self.gs, self.nu, self.YB, self.gs[-2]
        )

    @property
    def semi_ok(self) -> bool:
        """Semi-fused transfer stages (residual+restrict, prolong+correct)
        are available: the V-cycle uses them when the fully fused stages
        are not (blocked-3D compile wall)."""
        if len(self.gs) not in (2, 3):
            return False
        ny = self.gs[-2]
        if self.YBt < ny and (self.YBt % 16 or (self.YBt // 2) % _HALO):
            return False
        if self.interpret:
            # CPU interpret mode (tests): exercise both dims and dtypes.
            return True
        # Hardware gate: only the configuration the kernels were built for —
        # blocked-3D f32 levels, where the fully fused stages are compile-
        # prohibitive (DESIGN.md §8) and the XLA separated transfer pair
        # costs 5x the single-pass byte minimum. Everything else keeps its
        # measured path (2D: fully fused or plain+XLA transfers; f64/bf16:
        # exact XLA forms) until scripts/probe_semi_transfer.py clears it.
        return (
            len(self.gs) == 3
            and self.dtype == jnp.dtype(jnp.float32)
            and self.YBt < ny
        )

    def residual_restrict(self, x, b, cols, tx):
        """r_c = R(b − Op(x)) — the fine residual never touches HBM."""
        return _residual_restrict_call(
            x, b, cols["omega"], tx["Ux"], tx["Wx"],
            groups_A=self.groups_A, groups_M=self.groups_M, gs=self.gs,
            TB=self.TBt, YB=self.YBt, interpret=self.interpret,
        )

    def prolong_correct(self, x, ec, tx):
        """x + P(e_c) — the prolonged field never touches HBM."""
        return _prolong_correct_call(
            x, ec, tx["UxT"], tx["WxT"], gs=self.gs, TB=self.TBt,
            YB=self.YBt, interpret=self.interpret,
        )

    def transfers(self, dtype):
        """Banded 1-D transfer factors as device arrays (params pytree)."""
        Ux, Wx = _transfer_mats_np(self.gs[-1])
        return {
            "Ux": jnp.asarray(Ux, dtype),
            "Wx": jnp.asarray(Wx, dtype),
            "UxT": jnp.asarray(Ux.T, dtype),
            "WxT": jnp.asarray(Wx.T, dtype),
        }

    def fused_pre(self, b, cols, tx):
        return _fused_pre_call(
            b, cols["omega"], cols["invD"], cols["invT"], cols["invDel"],
            tx["Ux"], tx["Wx"],
            groups_A=self.groups_A, groups_M=self.groups_M, gs=self.gs,
            TB=self.TB, YB=self.YB, nu=self.nu, interpret=self.interpret,
        )

    def fused_post(self, x, b, ec, cols, tx):
        return _fused_post_call(
            x, b, ec, cols["omega"], cols["invD"], cols["invT"],
            cols["invDel"], tx["UxT"], tx["WxT"],
            groups_A=self.groups_A, groups_M=self.groups_M, gs=self.gs,
            TB=self.TB, YB=self.YB, nu=self.nu, interpret=self.interpret,
        )

    # -------------------------------- sharded-slab transfer stages
    # (parallel/explicit2d: the instance's gs is the HALO-EXTENDED local
    # slab (own + 2·kw planes on the sharded leading axis); the transfer
    # stages run the same fused kernels with even-extent chain offsets.)

    def _sh_blocked(self) -> bool:
        """Do the semi-fused sharded transfer stages run in the BLOCKED
        layout on this instance? (YBt < the extended-slab y extent — the
        hardware-safe family; the unblocked fused layout faults the worker
        at 255²+, see __init__.)"""
        return self.YBt < self.gs[-2]

    def sh_transfer_ok(self, own: int, h: int | None = None) -> bool:
        """Sharded semi-fused transfer stages available for an
        ``own``-plane slab. Two layouts:

        - UNBLOCKED (round 4): interpret-mode only — portable arithmetic,
          parity-tested on CPU, but the unblocked layout faults the TPU
          worker at scale.
        - BLOCKED (round 5): the serial blocked machinery on the extended
          slab (crop / pad-and-crop tricks, see _residual_restrict_call /
          _prolong_correct_call lead docstrings). In 2-D the effective
          leading halo must be even >= 2 (odd h slabs drop one front
          plane, so odd h needs h >= 3 — any caller halo >= 2 works
          except the bare odd h = 1). Hardware engagement keyed on
          SH_BLOCKED_HW (the single-chip kernel-family probe,
          results_tpu/r5_sh_blocked_probe)."""
        if len(self.gs) not in (2, 3) or own % 2 or own < 2:
            return False
        if not self._sh_blocked():
            return self.interpret and self.YB >= self.gs[-2]
        if len(self.gs) == 2 and h is not None and h - (h % 2) < 2:
            return False
        return self.interpret or SH_BLOCKED_HW

    def sh_fused_ready(self, own: int, kw: int) -> bool:
        """Fully fused pre/post stages additionally bake one nu and need
        the kw >= nu+1 halo contract. Unblocked-layout only (no blocked
        variant exists for the fused sweeps), hence interpret-only."""
        return (
            self.interpret
            and not self._sh_blocked()
            and self.sh_transfer_ok(own)
            and self.nu_post == self.nu
            and 2 <= self.nu <= 3
            and kw >= self.nu + 1
        )

    def sh_residual_restrict(self, x, b, cols, tx, own: int, h: int):
        """r_c = R(b − Op(x)) on a halo-``h`` extended slab; returns the
        owned coarse planes."""
        gs = self.gs
        if self._sh_blocked():
            if len(gs) == 2 and h % 2:
                # Blocked 2-D chain parity needs an even leading halo:
                # drop one front plane (residual validity needs h-1 >= 2,
                # which sh_transfer_ok guarantees).
                x, b = x[:, 1:, :], b[:, 1:, :]
                gs = (gs[0] - 1,) + gs[1:]
                h = h - 1
            YB = self.YBt
        else:
            YB = gs[-2]
        return _residual_restrict_call(
            x, b, cols["omega"], tx["Ux"], tx["Wx"],
            groups_A=self.groups_A, groups_M=self.groups_M, gs=gs,
            TB=self.TBt, YB=YB, lead=(own, h),
            interpret=self.interpret,
        )

    def sh_prolong_correct(self, x, ec, tx, own: int, hc: int):
        """x + P(e_c) on the OWNED slab (x unhaloed); ec carries hc coarse
        halo planes."""
        gs_own = (own,) + self.gs[1:]
        if self._sh_blocked():
            if len(gs_own) == 2:
                # Pad-and-crop (see _prolong_correct_call lead docstring):
                # 2·hc zero fine planes each side align the slab with the
                # serial blocked window lattice.
                pad = [(0, 0)] * x.ndim
                pad[1] = (2 * hc, 2 * hc)
                x = jnp.pad(x, pad)
                gs_own = (own + 4 * hc,) + gs_own[1:]
                out = _prolong_correct_call(
                    x, ec, tx["UxT"], tx["WxT"], gs=gs_own, TB=self.TBt,
                    YB=self.YBt, lead=(own, hc), interpret=self.interpret,
                )
                return out[:, 2 * hc : 2 * hc + own, :]
            return _prolong_correct_call(
                x, ec, tx["UxT"], tx["WxT"], gs=gs_own, TB=self.TBt,
                YB=self.YBt, lead=(own, hc), interpret=self.interpret,
            )
        return _prolong_correct_call(
            x, ec, tx["UxT"], tx["WxT"], gs=gs_own, TB=self.TBt,
            YB=gs_own[-2], lead=(own, hc), interpret=self.interpret,
        )

    def sh_fused_pre(self, b, cols, tx, vmask, own: int, h: int):
        """(x_ext, r_c): x at the full extended extent (caller crops)."""
        return _fused_pre_call(
            b, cols["omega"], cols["invD"], cols["invT"], cols["invDel"],
            tx["Ux"], tx["Wx"], vmask,
            groups_A=self.groups_A, groups_M=self.groups_M, gs=self.gs,
            TB=self.TB, YB=self.gs[-2], nu=self.nu, lead=(own, h),
            interpret=self.interpret,
        )

    def sh_fused_post(self, x, b, ec, cols, tx, vmask, own: int, h: int,
                      hc: int):
        return _fused_post_call(
            x, b, ec, cols["omega"], cols["invD"], cols["invT"],
            cols["invDel"], tx["UxT"], tx["WxT"], vmask,
            groups_A=self.groups_A, groups_M=self.groups_M, gs=self.gs,
            TB=self.TB, YB=self.gs[-2], nu=self.nu, lead=(own, h, hc),
            interpret=self.interpret,
        )


# ---------------------------------------------- variable-coefficient kernels
#
# The weighted spatial forms (fem/assembly with κ/c; GalerkinMultiShift-
# Multigrid levels) keep the stencil displacement structure but carry
# per-node tap WEIGHT ARRAYS (ntaps, *gs). These kernels mirror the
# constant-weight smoother/residual/apply above; the weight field travels
# as one more y-blocked operand (tiny: no time axis — ~2 MB per block at
# 511²), and the node-dependent Jacobi diagonal 1/(W_center + ω·cM) is
# formed in-kernel (zeroed outside the domain via a where, so ω = 0 rows
# cannot divide by the masked-out zeros).


def _w_specs(ntaps, YB, gs, blocked):
    """BlockSpecs for the (ntaps, *gs) weight field: mid (+ 8-row up/dn
    slabs when y is blocked); no time axis — the same block serves every
    time block."""
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    zeros = (0,) * len(rest)
    nyb8 = pl.cdiv(ny, _HALO)

    def spec(yb, ymap):
        return pl.BlockSpec(
            (ntaps,) + rest + (yb, nx),
            lambda ti, yi, ymap=ymap: (0,) + zeros + (ymap(yi), 0),
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


def _stencil_var(X, Wc, disps, gs, yb):
    """Variable-weight stencil on a haloed window: X (TT, …, yb+2, nx)
    blocked (or unblocked, zero-padded), Wc = weights at the OUTPUT rows
    (ntaps, …, yb or ny, nx). Returns (TT, …, yb or ny, nx)."""
    tap = _kp._tap_fn(X, gs, yb)
    out = None
    for k, disp in enumerate(disps):
        term = Wc[k] * tap(disp)
        out = term if out is None else out + term
    return out


def _op_rows_var(X, Wc, disps, omega, groups_M, gs, yb):
    """A_w(X) + ω·M(X) on the interior rows of a haloed window, sharing
    the tap loads between the weighted-A and constant-M stencils (the P1
    forms have identical displacements — same idea as _pair_groups for the
    constant-coefficient kernels, with A's weights as arrays)."""
    tap = _kp._tap_fn(X, gs, yb)
    wM = {d: w for w, ds in groups_M for d in ds}
    outA = None
    accM: dict[float, object] = {}
    for k, disp in enumerate(disps):
        t = tap(disp)
        termA = Wc[k] * t
        outA = termA if outA is None else outA + termA
        w = wM.pop(tuple(disp), 0.0)
        if w != 0.0:
            accM[w] = t if w not in accM else accM[w] + t
    outM = None
    for w, acc in accM.items():
        term = w * acc
        outM = term if outM is None else outM + term
    if wM:  # M taps outside A's support (not the P1 case, but stay correct)
        extra = _stencil(
            X, tuple((w, (d,)) for d, w in wM.items() if w != 0.0), gs, yb
        )
        outM = extra if outM is None else outM + extra
    return outA if outM is None else outA + omega * outM


def _inv_diag_var(Wc_center, omega, cM):
    """Node-dependent Jacobi diagonal, zeroed at masked-out rows (the
    domain mask zeroes W there; ω = 0 rows must not divide by it)."""
    den = Wc_center + cM * omega
    return jnp.where(den > 0, 1.0 / den, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "disps", "kc", "cM", "groups_M", "gs", "TB", "YB", "nu",
        "zero_init", "interpret",
    ),
)
def _smooth_var_call(
    x, b, W, omega, invT, invDel, *, disps, kc, cM, groups_M, gs, TB, YB,
    nu, zero_init=False, interpret=False,
):
    """Degree-ν Chebyshev–Jacobi sweep for the weighted operator; mirrors
    _smooth_call with per-node A weights (and therefore per-node 1/D)."""
    T = b.shape[0]
    dim = len(gs)
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    zeros = (0,) * len(rest)
    blocked = YB < ny
    G = nu - 1
    if blocked and G + 1 > _HALO:
        raise ValueError(f"nu={nu} needs {G + 1} halo rows > slab {_HALO}")
    n_f = 3 if blocked else 1
    n_x = 0 if zero_init else n_f

    def yb_rows(halo):
        return (YB + 2 * halo) if blocked else None

    def kernel(om_ref, iT_ref, iDel_ref, *refs):
        out_ref = refs[-1]
        yi = pl.program_id(1)
        om = _col(om_ref, dim)
        iT = _col(iT_ref, dim)
        iDel = _col(iDel_ref, dim)
        Bw = _window(refs[n_x : n_x + n_f], yi, YB, ny, G, blocked)
        Ww = _window(refs[n_x + n_f : n_x + 2 * n_f], yi, YB, ny, G, blocked)
        iD = _inv_diag_var(Ww[kc], om, cM)
        if zero_init:
            r = iD * Bw
            x_acc = None
        else:
            Xw = _window(refs[:n_f], yi, YB, ny, G + 1, blocked)
            r = iD * (
                Bw - _op_rows_var(Xw, Ww, disps, om, groups_M, gs, yb_rows(G))
            )
            x_acc = _crop(Xw, 1 if blocked else 0)
        d = r * iT
        x_acc = d if x_acc is None else x_acc + d
        rho = 1.0 / _SIGMA
        for k in range(1, nu):
            rho_new = 1.0 / (2.0 * _SIGMA - rho)
            c = 1 if blocked else 0
            if blocked:
                d = _domain_mask(d, yi, YB, ny, G - k + 1)
            Wk = _crop(Ww, k) if blocked else Ww
            iDk = _crop(iD, k) if blocked else iD
            Opd = _op_rows_var(d, Wk, disps, om, groups_M, gs, yb_rows(G - k))
            r = _crop(r, c) - iDk * Opd
            d = rho_new * rho * _crop(d, c) + (2.0 * rho_new) * iDel * r
            x_acc = _crop(x_acc, c) + d
            rho = rho_new
        out_ref[...] = x_acc

    specs = (
        [_col_spec(TB)] * 3
        + _y_specs(TB, YB, gs, blocked) * (0 if zero_init else 1)  # x
        + _y_specs(TB, YB, gs, blocked)  # b
        + _w_specs(len(disps), YB, gs, blocked)  # A weights
    )
    out_spec = pl.BlockSpec(
        (TB,) + rest + (YB, nx),
        lambda ti, yi: (ti,) + zeros + (yi, 0),
        memory_space=pltpu.VMEM,
    )
    kwargs = {}
    if not interpret:
        vol = int(np.prod(gs, dtype=int))
        taps = len(disps) + len(groups_M)
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * taps * nu * T * vol,
                bytes_accessed=b.dtype.itemsize * vol * (
                    T * (2 if zero_init else 3)
                    + pl.cdiv(T, TB) * len(disps)
                ),
                transcendentals=0,
            ),
        )
    wfields = 3 if blocked else 1
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([out_spec])[0],
        out_shape=jax.ShapeDtypeStruct((T,) + gs, b.dtype),
        interpret=interpret,
        **kwargs,
    )(omega, invT, invDel, *([x] * n_x), *([b] * n_f), *([W] * wfields))


@functools.partial(
    jax.jit,
    static_argnames=("disps", "groups_M", "gs", "TB", "YB", "interpret"),
)
def _residual_var_call(
    x, b, W, omega, *, disps, groups_M, gs, TB, YB, interpret=False
):
    """out = b − (A_w(x) + ω⊙M(x)) in one fused pass."""
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
        Ww = _window(refs[2 * n_f : 3 * n_f], yi, YB, ny, 0, blocked)
        op = _op_rows_var(Xw, Ww, disps, om, groups_M, gs, YB if blocked else None)
        out_ref[...] = Bw - op

    specs = (
        [_col_spec(TB)]
        + _y_specs(TB, YB, gs, blocked)
        + _y_specs(TB, YB, gs, blocked)
        + _w_specs(len(disps), YB, gs, blocked)
    )
    out_spec = pl.BlockSpec(
        (TB,) + rest + (YB, nx),
        lambda ti, yi: (ti,) + zeros + (yi, 0),
        memory_space=pltpu.VMEM,
    )
    kwargs = {}
    if not interpret:
        vol = int(np.prod(gs, dtype=int))
        taps = len(disps) + len(groups_M)
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * taps * T * vol,
                bytes_accessed=b.dtype.itemsize * vol * (
                    3 * T + pl.cdiv(T, TB) * len(disps)
                ),
                transcendentals=0,
            ),
        )
    wfields = 3 if blocked else 1
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([out_spec])[0],
        out_shape=jax.ShapeDtypeStruct((T,) + gs, b.dtype),
        interpret=interpret,
        **kwargs,
    )(omega, *([x] * n_f), *([b] * n_f), *([W] * wfields))


@functools.partial(
    jax.jit, static_argnames=("disps", "gs", "TB", "YB", "interpret")
)
def _apply_var_call(x, W, *, disps, gs, TB, YB, interpret=False):
    """out = A_w(x) for the weighted stencil, one fused pass (the middle
    step of the K_X sandwich on the weighted path)."""
    T = x.shape[0]
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    zeros = (0,) * len(rest)
    blocked = YB < ny
    n_f = 3 if blocked else 1

    def kernel(*refs):
        out_ref = refs[-1]
        yi = pl.program_id(1)
        Xw = _window(refs[:n_f], yi, YB, ny, 1 if blocked else 0, blocked)
        Ww = _window(refs[n_f : 2 * n_f], yi, YB, ny, 0, blocked)
        out_ref[...] = _stencil_var(Xw, Ww, disps, gs, YB if blocked else None)

    specs = _y_specs(TB, YB, gs, blocked) + _w_specs(len(disps), YB, gs, blocked)
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
                flops=2 * len(disps) * T * vol,
                bytes_accessed=x.dtype.itemsize * vol * (
                    2 * T + pl.cdiv(T, TB) * len(disps)
                ),
                transcendentals=0,
            ),
        )
    wfields = 3 if blocked else 1
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([out_spec])[0],
        out_shape=jax.ShapeDtypeStruct((T,) + gs, x.dtype),
        interpret=interpret,
        **kwargs,
    )(*([x] * n_f), *([W] * wfields))


class VarMSPallasLevel:
    """Pallas smoother/residual for one GalerkinMultiShiftMultigrid level
    (variable-coefficient A, constant-stencil mass). API mirrors
    MSPallasLevel; the A weight array rides in the level params ("Aw")
    and is passed per call. No fused transfer stages (deferred)."""

    needs_weights = True

    def __init__(self, lev, T: int, dtype, nu: int, interpret=False,
                 nu_post: int | None = None):
        self.gs = tuple(lev.gs)
        self.disps = tuple(lev.A_vs.disps)
        self.kc = int(lev.kc)
        self.cM = float(lev.cM)
        self.groups_M = _weight_groups(lev.M_st.disps, lev.M_st.weights)
        self.nu = nu
        self.nu_post = nu if nu_post is None else nu_post
        self.dtype = jnp.dtype(dtype)
        self.interpret = interpret
        itemsize = jnp.dtype(dtype).itemsize
        self.TB, self.YB = _pick_blocks_mg(T, self.gs, itemsize)
        ny = self.gs[-2]
        if self.YB < ny:
            # The constant-path chooser budgets only the x/b windows; the
            # weighted kernels also hold the (ntaps, …, YB+slabs, nx)
            # weight windows. Mosaic's actual scoped-VMEM request runs
            # ~2x this model for the var smoother (measured at varcoef3d
            # 129³ blocked: model 61.5 MiB at the constant pick (4, 8) →
            # real request 119.69 MB > the 110 MB limit), so the cap is
            # half the constant path's 64 MiB: this shape walks to TB=2 —
            # ~272 grid programs, the body class DESIGN.md §8 records as
            # compiling fine.
            rest = int(np.prod(self.gs[:-2], dtype=int))
            per_win = rest * (self.YB + 8) * self.gs[-1] * itemsize
            wbytes = (
                len(self.disps) * rest * (self.YB + 16) * self.gs[-1]
                * itemsize
            )
            while (
                self.TB > 1
                and self.TB * per_win * 10 + wbytes > 48 * 1024 * 1024
            ):
                self.TB //= 2
        # Transfer-stage blocks: same 16-alignment + live-set walk as
        # MSPallasLevel (the transfer kernels are coefficient-independent
        # except for one weighted residual, whose weight slabs add ~1
        # window to the live set).
        self.TBt, self.YBt = self.TB, self.YB
        if self.YBt < ny and self.YBt % 16:
            self.YBt = 16
        if self.YBt < ny:
            per_t = (
                int(np.prod(self.gs[:-2], dtype=int))
                * (self.YBt + 16) * self.gs[-1] * jnp.dtype(dtype).itemsize
            )
            while self.TBt > 1 and self.TBt * per_t * 13 > 64 * 1024 * 1024:
                self.TBt //= 2

    @staticmethod
    def columns(lev, omega_rows: np.ndarray, dtype):
        """(T,1,128) per-row Chebyshev columns — EXACTLY the formulas of
        GalerkinMultiShiftMultigrid.row_params (per-unique-ω Gershgorin),
        so the XLA and Pallas paths smooth with identical scalars."""
        omega_rows = np.asarray(omega_rows, np.float64)
        uniq, inv = np.unique(omega_rows, return_inverse=True)
        lam_u = np.array(
            [((lev.rsA + w * lev.rsM) / (lev.dA + w * lev.dM)).max()
             for w in uniq]
        )
        lam = 1.1 * lam_u[inv]
        cols = {
            "omega": omega_rows,
            "invT": 1.0 / (0.625 * lam),
            "invDel": 1.0 / (0.375 * lam),
        }
        to128 = lambda a: jnp.broadcast_to(
            jnp.asarray(a, dtype)[:, None, None], (a.shape[0], 1, 128)
        ).copy()
        return {k: to128(v) for k, v in cols.items()}

    def smooth(self, x, b, cols, W, zero_init=False, post=False):
        return _smooth_var_call(
            b if zero_init else x, b, W,
            cols["omega"], cols["invT"], cols["invDel"],
            disps=self.disps, kc=self.kc, cM=self.cM,
            groups_M=self.groups_M, gs=self.gs, TB=self.TB, YB=self.YB,
            nu=self.nu_post if post else self.nu, zero_init=zero_init,
            interpret=self.interpret,
        )

    def residual(self, x, b, cols, W):
        return _residual_var_call(
            x, b, W, cols["omega"],
            disps=self.disps, groups_M=self.groups_M, gs=self.gs,
            TB=self.TB, YB=self.YB, interpret=self.interpret,
        )

    def apply_A(self, x, W):
        return _apply_var_call(
            x, W, disps=self.disps, gs=self.gs, TB=self.TB, YB=self.YB,
            interpret=self.interpret,
        )

    # -------------------------------------------------- fused V-cycle stages
    # The transfer stages are coefficient-independent, so the banded 0/1
    # factors and the support gate are shared with the constant path.

    @property
    def fused_ok(self) -> bool:
        return self.nu_post == self.nu and _fused_supported(
            self.gs, self.nu, self.YB, self.gs[-2]
        )

    # Same availability gate as the constant-coefficient levels: the
    # stages exist for 2D/3D in interpret mode (tests) and are
    # hardware-gated to blocked-3D f32, where the fully fused stages are
    # compile-prohibitive and the XLA transfer pair costs 5x the
    # single-pass byte minimum (the varcoef3d case of VERDICT r1 weak #4).
    semi_ok = MSPallasLevel.semi_ok
    transfers = MSPallasLevel.transfers
    # Coefficient-independent: x + P(e_c) reuses the constant kernel.
    prolong_correct = MSPallasLevel.prolong_correct

    def residual_restrict(self, x, b, cols, tx, W):
        """r_c = R(b − Op_w(x)) — weighted residual fused with restrict."""
        return _residual_restrict_var_call(
            x, b, W, cols["omega"], tx["Ux"], tx["Wx"],
            disps=self.disps, groups_M=self.groups_M, gs=self.gs,
            TB=self.TBt, YB=self.YBt, interpret=self.interpret,
        )

    def fused_pre(self, b, cols, tx, W):
        return _fused_pre_var_call(
            b, W, cols["omega"], cols["invT"], cols["invDel"],
            tx["Ux"], tx["Wx"], disps=self.disps, kc=self.kc, cM=self.cM,
            groups_M=self.groups_M, gs=self.gs, TB=self.TB, YB=self.YB,
            nu=self.nu, interpret=self.interpret,
        )

    def fused_post(self, x, b, ec, cols, tx, W):
        return _fused_post_var_call(
            x, b, ec, W, cols["omega"], cols["invT"], cols["invDel"],
            tx["UxT"], tx["WxT"], disps=self.disps, kc=self.kc, cM=self.cM,
            groups_M=self.groups_M, gs=self.gs, TB=self.TB, YB=self.YB,
            nu=self.nu, interpret=self.interpret,
        )


# ----------------------------------------------------- fused V-cycle kernels
#
# The V-cycle's fine-level chain (pre-smooth -> residual -> restrict, and
# prolong -> correct -> post-smooth) costs ~6 separate memory passes plus
# per-op dispatch overhead when left to XLA (measured: transfers alone are
# ~3 ms at 511²×128 f32 even in the separated repeat/pairsum form, because
# nothing fuses on this backend). These kernels collapse each chain into ONE
# pass over the fine arrays:
#
#   fused_pre(b)        -> (x, r_c): x = smooth(0, b); r = b - Op(x);
#                          r_c = R(r)            [reads b, writes x + ¼]
#   fused_post(x, b, e) -> smooth(x + P(e), b)   [reads x,b,¼; writes x]
#
# The P1 transfer kernel factors exactly as K = ½(u^⊗2 + w^⊗2) with
# u = [1,1,0], w = [0,1,1] (see ops/multigrid._transfer_fast), so inside the
# kernel the x-direction transfer is a banded-matrix MXU matmul (Ux/Wx are
# (nx, nxc) 0/1 operands) and the y/z directions sublane pair-sums / offset
# repeats — no gathers, no lane-strided ops. Both 2D and 3D (the `if rest:`
# branches; _fused_supported gates on dims, nu, and YB alignment).


def _transfer_mats_np(nx: int):
    """0/1 banded factors of the 1-D P1 transfer: Ux[f,c]=1 at f ∈ {2c,2c+1},
    Wx[f,c]=1 at f ∈ {2c+1,2c+2} (fine size nx = 2·nxc+1)."""
    nxc = (nx - 1) // 2
    Ux = np.zeros((nx, nxc), np.float64)
    Wx = np.zeros((nx, nxc), np.float64)
    c = np.arange(nxc)
    Ux[2 * c, c] = 1.0
    Ux[2 * c + 1, c] = 1.0
    Wx[2 * c + 1, c] = 1.0
    Wx[2 * c + 2, c] = 1.0
    return Ux, Wx


def _dot_last(a, mat):
    """Contract the last (lane) axis with a matrix on the MXU, at ~f32
    accuracy in two bf16 passes (hi + lo mantissa split).

    Mosaic's dot lowering only offers DEFAULT (one bf16 pass, ~4e-3 relative
    — too coarse even for transfers) or HIGHEST (six passes, ~1 ms extra per
    fused stage at 511²×128, measured). The transfer matrices are 0/1 — exact
    in bf16 — so splitting only the data side gives ≤ ~2⁻¹⁶ relative error at
    a third of the HIGHEST cost."""
    if a.dtype == jnp.float32:
        a2 = a.reshape(-1, a.shape[-1])
        hi = a2.astype(jnp.bfloat16)
        lo = (a2 - hi.astype(a2.dtype)).astype(jnp.bfloat16)
        mb = mat.astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        d = lambda v: jax.lax.dot_general(
            v, mb, dimension_numbers=dn, preferred_element_type=jnp.float32
        )
        return (d(hi) + d(lo)).reshape(a.shape[:-1] + (mat.shape[1],))
    return jax.lax.dot_general(
        a, mat, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=a.dtype, precision=jax.lax.Precision.HIGHEST,
    )


def _pairsum_rows(A, start: int, npairs: int, axis: int = -2):
    """out[k] = A[start+2k] + A[start+2k+1] along ``axis``."""
    axis = axis % A.ndim
    sl = [slice(None)] * A.ndim
    sl[axis] = slice(start, start + 2 * npairs)
    W = A[tuple(sl)]
    shape = W.shape[:axis] + (npairs, 2) + W.shape[axis + 1 :]
    Wp = W.reshape(shape)
    i0 = [slice(None)] * Wp.ndim
    i1 = list(i0)
    i0[axis + 1] = 0
    i1[axis + 1] = 1
    return Wp[tuple(i0)] + Wp[tuple(i1)]


def _repeat_rows(A, start: int, nrows: int, axis: int = -2):
    """out[l] = A[(start+l)//2] along ``axis`` (offset 2x element repeat;
    note pltpu.repeat TILES copies — jnp.repeat is the element-wise one).
    Out-of-range rows (``start`` < 0 or the slice running past the repeat)
    read the Dirichlet zero ghost."""
    axis = axis % A.ndim
    R = jnp.repeat(A, 2, axis=axis)
    lo = max(0, -start)
    hi = max(0, start + nrows - R.shape[axis])
    if lo or hi:
        pad = [(0, 0)] * R.ndim
        pad[axis] = (lo, hi)
        R = jnp.pad(R, pad)
        start += lo
    sl = [slice(None)] * R.ndim
    sl[axis] = slice(start, start + nrows)
    return R[tuple(sl)]


@functools.partial(
    jax.jit,
    static_argnames=(
        "groups_A", "groups_M", "gs", "TB", "YB", "nu", "lead", "interpret"
    ),
)
def _fused_pre_call(
    b, omega, invD, invT, invDel, Ux, Wx, vmask=None, *, groups_A, groups_M,
    gs, TB, YB, nu, lead=None, interpret=False,
):
    """(x, r_c) with x = zero-init degree-ν sweep on b, r = b − Op(x),
    r_c = R(r).

    ``lead``: optional ``(own, h)`` sharded-slab layout (explicit2d): b and
    vmask carry ``h >= nu+1`` halo planes each side of the even
    ``own``-plane owned slab of the leading grid axis; the x output keeps
    the FULL extended extent (slab-edge rows are sweep-contaminated — the
    caller crops to the owned planes and re-halos), while r_c holds the
    ``own//2`` owned coarse planes. ``vmask`` is the (1, *gs) validity
    field of _smooth_call — required with lead (the zero-scale padding
    discipline), unsupported serial."""
    T = b.shape[0]
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    restc = tuple((g - 1) // 2 for g in rest)
    nyc, nxc = (ny - 1) // 2, (nx - 1) // 2
    YB = min(YB, ny)
    blocked = YB < ny
    YBc = YB // 2 if blocked else nyc
    G = nu - 1
    E = 2  # extra halo carried so the residual is valid on 1 halo row
    if blocked and (G + E + 1 > _HALO or YB % 16):
        raise ValueError("fused_pre needs halo G+3 <= 8 and YB % 16 == 0")
    n_f = 3 if blocked else 1
    off = 1 if blocked else 0
    dim = len(gs)
    z0 = 0
    if lead is not None:
        own, h = lead
        if blocked or own % 2 or h < nu + 1:
            raise ValueError(
                "sharded lead layout needs the unblocked form, an even "
                "owned extent, and halo >= nu+1 (the zero-init sweep "
                "contaminates nu-1 edge planes and the residual must stay "
                "valid one plane past the owned slab)"
            )
        if dim == 2:
            nyc = YBc = own // 2
            off = h
        else:
            restc = (own // 2,) + restc[1:]
            z0 = h
    has_mask = vmask is not None
    if has_mask and blocked:
        raise ValueError("fused_pre vmask rides the unblocked layout only")

    def kernel(om_ref, iD_ref, iT_ref, iDel_ref, Ux_ref, Wx_ref, *refs):
        x_ref, rc_ref = refs[-2], refs[-1]
        yi = pl.program_id(1)
        om, iD = _col(om_ref, dim), _col(iD_ref, dim)
        iT, iDel = _col(iT_ref, dim), _col(iDel_ref, dim)
        Bw = _window(refs[:n_f], yi, YB, ny, G + E, blocked)
        Mw = refs[n_f][...] if has_mask else None

        def rows(h):
            return (YB + 2 * h) if blocked else None

        # zero-init Chebyshev-Jacobi sweep, carrying E extra halo rows
        r = iD * Bw
        if has_mask:
            r = Mw * r
        d = r * iT
        x = d
        rho = 1.0 / _SIGMA
        for k in range(1, nu):
            rho_new = 1.0 / (2.0 * _SIGMA - rho)
            if blocked:
                d = _domain_mask(d, yi, YB, ny, G + E - k + 1)
            Opd = _op_rows(d, om, groups_A, groups_M, gs, rows(G + E - k))
            c = 1 if blocked else 0
            r = _crop(r, c) - iD * Opd
            if has_mask:
                r = Mw * r
            d = rho_new * rho * _crop(d, c) + (2.0 * rho_new) * iDel * r
            x = _crop(x, c) + d
            rho = rho_new
        # x now carries halo E; residual on 1 halo row
        if blocked:
            x = _domain_mask(x, yi, YB, ny, E)
        Opx = _op_rows(x, om, groups_A, groups_M, gs, rows(E - 1))
        Bw1 = _crop(Bw, G + 1 if blocked else 0)
        rr = Bw1 - Opx  # halo 1 (blocked) / full (unblocked)
        x_ref[...] = _crop(x, E if blocked else 0)
        # restriction: x-direction on the MXU, y as sublane pairsums, z (3D)
        # as whole-axis pairsums — the CP split K = 0.5(u^d + w^d) keeps the
        # u-chain (A) and w-chain (B) separate across ALL axes.
        A = _dot_last(rr, Ux_ref[...])
        B = _dot_last(rr, Wx_ref[...])
        A = _pairsum_rows(A, off, YBc)
        B = _pairsum_rows(B, off + 1, YBc)
        if rest:
            A = _pairsum_rows(A, z0, restc[0], axis=-3)
            B = _pairsum_rows(B, z0 + 1, restc[0], axis=-3)
        rc_ref[...] = 0.5 * (A + B)

    mat_spec = pl.BlockSpec(
        (nx, nxc), lambda ti, yi: (0, 0), memory_space=pltpu.VMEM
    )
    specs = (
        [_col_spec(TB)] * 4
        + [mat_spec, mat_spec]
        + _y_specs(TB, YB, gs, blocked)  # b
        + (
            _y_specs(1, YB, gs, blocked, t_map=lambda ti: 0)
            if has_mask else []
        )
    )
    zeros = (0,) * len(rest)
    x_spec = pl.BlockSpec(
        (TB,) + rest + (YB, nx),
        lambda ti, yi: (ti,) + zeros + (yi, 0),
        memory_space=pltpu.VMEM,
    )
    rc_spec = pl.BlockSpec(
        (TB,) + restc + (YBc, nxc),
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
                flops=2 * T * (taps * (nu + 1) * vol + 2 * vol * nxc),
                bytes_accessed=b.dtype.itemsize * T * vol * 9 // 4,
                transcendentals=0,
            ),
        )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([x_spec, rc_spec]),
        out_shape=[
            jax.ShapeDtypeStruct((T,) + rest + (ny, nx), b.dtype),
            jax.ShapeDtypeStruct((T,) + restc + (nyc, nxc), b.dtype),
        ],
        interpret=interpret,
        **kwargs,
    )(omega, invD, invT, invDel, Ux, Wx, *([b] * n_f),
      *([vmask] if has_mask else []))


@functools.partial(
    jax.jit,
    static_argnames=(
        "groups_A", "groups_M", "gs", "TB", "YB", "nu", "lead", "interpret"
    ),
)
def _fused_post_call(
    x, b, ec, omega, invD, invT, invDel, UxT, WxT, vmask=None, *, groups_A,
    groups_M, gs, TB, YB, nu, lead=None, interpret=False,
):
    """smooth(x + P(ec), b): prolongation + correction + degree-ν sweep in
    one pass.

    ``lead``: optional ``(own, h, hc)`` sharded-slab layout (explicit2d):
    x, b and vmask carry ``h >= nu`` halo planes each side of the even
    ``own``-plane owned slab of the leading grid axis; ec carries ``hc``
    halo planes around its ``own//2`` owned coarse planes (hc >= ceil((h+1)/2)
    so the prolonged field is valid on every window row the sweep keeps).
    The output keeps the FULL extended extent (edge rows contaminated —
    caller crops). ``vmask`` as in _fused_pre_call."""
    T = b.shape[0]
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    restc = tuple((g - 1) // 2 for g in rest)
    nyc, nxc = (ny - 1) // 2, (nx - 1) // 2
    YB = min(YB, ny)
    blocked = YB < ny
    YBc = YB // 2 if blocked else nyc
    G = nu - 1
    if blocked and (YB % 16 or YBc % _HALO):
        raise ValueError("fused_post needs YB % 16 == 0")
    n_f = 3 if blocked else 1
    dim = len(gs)
    hc = None
    if lead is not None:
        own, h, hc = lead
        if blocked or own % 2 or h < nu or 2 * hc < h + 1:
            raise ValueError(
                "sharded lead layout needs the unblocked form, an even "
                "owned extent, fine halo >= nu and coarse halo >= "
                "ceil((h+1)/2)"
            )
        if dim == 2:
            nyc = own // 2 + 2 * hc  # ec extent incl. its halo planes
        else:
            restc = (own // 2 + 2 * hc,) + restc[1:]
    gsc = restc + (nyc, nxc)
    has_mask = vmask is not None
    if has_mask and blocked:
        raise ValueError("fused_post vmask rides the unblocked layout only")

    def kernel(om_ref, iD_ref, iT_ref, iDel_ref, UxT_ref, WxT_ref, *refs):
        out_ref = refs[-1]
        yi = pl.program_id(1)
        om, iD = _col(om_ref, dim), _col(iD_ref, dim)
        iT, iDel = _col(iT_ref, dim), _col(iDel_ref, dim)
        Xw = _window(refs[:n_f], yi, YB, ny, G + 1, blocked)
        Bw = _window(refs[n_f : 2 * n_f], yi, YB, ny, G, blocked)
        Mw = refs[3 * n_f][...] if has_mask else None
        if blocked:
            Cw = _window(refs[2 * n_f : 3 * n_f], yi, YBc, nyc, 2, blocked)
        elif lead is not None and dim == 2:
            # Sharded lead axis == the y axis: ec's halo planes ride in the
            # operand itself (no Dirichlet zero-pad).
            Cw = refs[2 * n_f][...]
        else:
            Cw = jnp.pad(
                refs[2 * n_f][...],
                [(0, 0)] + [(0, 0)] * len(rest) + [(2, 2), (0, 0)],
            )
        # prolongation on the window rows of Xw (halo G+1 = nu)
        A = _dot_last(Cw, UxT_ref[...])
        B = _dot_last(Cw, WxT_ref[...])
        nrows = YB + 2 * (G + 1) if blocked else ny
        # Local fine row l sits at global f = l - halo_f; the matching
        # repeat-index is j = f + 2·halo_c = l + (2·halo_c - halo_f), with
        # coarse halo 2 in both modes and fine halo G+1 (blocked) / 0.
        # Sharded-y lead: coarse halo hc, fine halo h (2·hc − h may be
        # negative — _repeat_rows zero-fills, reaching only edge rows the
        # halo-depth contract already discards).
        if lead is not None and dim == 2:
            start = 2 * hc - lead[1]
        else:
            start = 4 - (G + 1) if blocked else 4
        if rest:
            if lead is not None:
                # Sharded z at fine halo h: repeat starts 2·hc − h.
                A = _repeat_rows(A, 2 * hc - lead[1], rest[0], axis=-3)
                B = _repeat_rows(B, 2 * hc - lead[1] - 1, rest[0], axis=-3)
            else:
                # z-direction: whole axis, no halo — Pu: zf <- C[zf//2]
                # (repeat slice at 0), Pw: zf <- C[(zf-1)//2] (repeat slice
                # at -1, the missing first row reading the Dirichlet zero).
                A = _repeat_rows(A, 0, rest[0], axis=-3)
                B = _repeat_rows(B, -1, rest[0], axis=-3)
        P = 0.5 * (
            _repeat_rows(A, start, nrows) + _repeat_rows(B, start - 1, nrows)
        )
        Xc = Xw + P
        # standard non-zero-init sweep (mirrors _smooth_call)
        if blocked:
            Xc = _domain_mask(Xc, yi, YB, ny, G + 1)

        def rows(h):
            return (YB + 2 * h) if blocked else None

        r = iD * (Bw - _op_rows(Xc, om, groups_A, groups_M, gs, rows(G)))
        if has_mask:
            r = Mw * r
        x_acc = _crop(Xc, 1 if blocked else 0)
        d = r * iT
        x_acc = x_acc + d
        rho = 1.0 / _SIGMA
        for k in range(1, nu):
            rho_new = 1.0 / (2.0 * _SIGMA - rho)
            if blocked:
                d = _domain_mask(d, yi, YB, ny, G - k + 1)
            Opd = _op_rows(d, om, groups_A, groups_M, gs, rows(G - k))
            c = 1 if blocked else 0
            r = _crop(r, c) - iD * Opd
            if has_mask:
                r = Mw * r
            d = rho_new * rho * _crop(d, c) + (2.0 * rho_new) * iDel * r
            x_acc = _crop(x_acc, c) + d
            rho = rho_new
        out_ref[...] = x_acc

    matT_spec = pl.BlockSpec(
        (nxc, nx), lambda ti, yi: (0, 0), memory_space=pltpu.VMEM
    )
    zeros = (0,) * len(rest)
    if blocked:
        c_specs = _y_specs(TB, YBc, gsc, True)
    else:
        c_specs = [
            pl.BlockSpec(
                (TB,) + restc + (nyc, nxc),
                lambda ti, yi: (ti,) + zeros + (0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    specs = (
        [_col_spec(TB)] * 4
        + [matT_spec, matT_spec]
        + _y_specs(TB, YB, gs, blocked)  # x
        + _y_specs(TB, YB, gs, blocked)  # b
        + c_specs  # ec
        + (
            _y_specs(1, YB, gs, blocked, t_map=lambda ti: 0)
            if has_mask else []
        )
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
                flops=2 * T * (taps * nu * vol + 2 * vol * nxc),
                bytes_accessed=b.dtype.itemsize * T * vol * 13 // 4,
                transcendentals=0,
            ),
        )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([out_spec])[0],
        out_shape=jax.ShapeDtypeStruct((T,) + rest + (ny, nx), b.dtype),
        interpret=interpret,
        **kwargs,
    )(omega, invD, invT, invDel, UxT, WxT, *([x] * n_f), *([b] * n_f),
      *([ec] * len(c_specs)), *([vmask] if has_mask else []))


def _fused_supported(gs, nu: int, YB: int, ny: int) -> bool:
    """Fused pre/post kernels: 2D/3D, nu small enough for the slab halos and
    the prolongation repeat offsets, blocked YB aligned for the coarse
    slabs."""
    if len(gs) not in (2, 3) or not (2 <= nu <= 3):
        return False
    if YB < ny and (YB % 16 or (YB // 2) % _HALO):
        return False
    return True


# ------------------------------------------------ semi-fused V-cycle stages
#
# Where the FULLY fused pre/post kernels are compile-prohibitive (blocked-3D:
# the nu-sweep body x hundreds of grid programs — DESIGN.md §8), the V-cycle
# falls back to separate smooth/residual kernels plus XLA transfers. The XLA
# separated-form transfer pair is multi-pass (~6 GB of traffic per fine level
# at the 3D flagship — measured 19.4 ms of a 51.2 ms cycle, at the copy
# ceiling but 5x the single-pass minimum). These two kernels fuse just the
# transfer with its adjacent cheap op — residual+restrict reads (x, b) and
# writes ONLY the coarse r_c; prolong+correct reads (e_c, x) and writes the
# corrected fine x — with tiny bodies (one stencil application + two banded
# dots) that keep Mosaic compile time in the smoother-kernel class.


@functools.partial(
    jax.jit,
    static_argnames=(
        "groups_A", "groups_M", "gs", "TB", "YB", "lead", "interpret"
    ),
)
def _residual_restrict_call(
    x, b, omega, Ux, Wx, *, groups_A, groups_M, gs, TB, YB, lead=None,
    interpret=False,
):
    """r_c = R(b − Op(x)) in one pass: the fine residual never touches HBM.

    Transfer indexing mirrors _fused_pre_call: x-direction on the MXU via
    the banded 0/1 factors (CP split K = ½(u^d + w^d), u/w chains kept
    separate across ALL axes), y as sublane pair-sums on a halo-1 residual
    window, z (3D) as whole-axis pair-sums.

    ``lead``: optional ``(own, h)`` sharded-slab layout of the LEADING grid
    axis (parallel/explicit2d): the operands carry ``h`` ppermute-halo
    planes each side of an even ``own``-plane owned slab (gs[0] == own+2h),
    and the coarse output holds the ``own//2`` owned coarse planes (shard
    offsets are even at every sharded level, so local parity == global and
    the u/w chains simply start ``h`` rows in). Needs h >= 2 (the residual
    must be valid one plane past the owned slab).

    BLOCKED sharded layout (round-5, the hardware-engageable form — the
    unblocked fused layout faults the TPU worker at 255²+): in 3-D the
    sharded z axis is orthogonal to the blocked y axis, so the z-offset
    pair-sums compose with the serial blocked machinery unchanged. In 2-D
    the sharded axis IS the blocked axis; the serial blocked chain lattice
    (window off=1 with the −1-row halo shift pairs GLOBAL fine rows
    (2j, 2j+1)) coincides with the slab's owned-coarse lattice (fine rows
    h+2j) exactly when h is EVEN, so the kernel runs the plain serial
    blocked path over the extended slab with a grid-covered coarse extent
    and the owned planes h/2 .. h/2+own/2 are cropped after the call
    (MSPallasLevel.sh_residual_restrict slices one leading plane off
    odd-h slabs first)."""
    T = b.shape[0]
    dim = len(gs)
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    restc = tuple((g - 1) // 2 for g in rest)
    nyc, nxc = (ny - 1) // 2, (nx - 1) // 2
    blocked = YB < ny
    YBc = YB // 2 if blocked else nyc
    if blocked and (YB % 16 or YBc % _HALO):
        raise ValueError("residual_restrict needs YB % 16 == 0")
    off = 1 if blocked else 0
    z0 = 0
    crop_c = None
    if lead is not None:
        own, h = lead
        if own % 2 or h < 2:
            raise ValueError(
                "sharded lead layout needs an even owned extent and "
                "halo >= 2"
            )
        if dim == 2:
            if blocked:
                if h % 2:
                    raise ValueError(
                        "blocked 2-D sharded slab needs an even leading halo"
                    )
                nyc = pl.cdiv(ny, YB) * YBc
                crop_c = h // 2
            else:
                nyc = YBc = own // 2
                off = h
        else:
            restc = (own // 2,) + restc[1:]
            z0 = h
    n_f = 3 if blocked else 1
    zeros = (0,) * len(rest)

    def kernel(om_ref, Ux_ref, Wx_ref, *refs):
        rc_ref = refs[-1]
        yi = pl.program_id(1)
        om = _col(om_ref, dim)
        Xw = _window(refs[:n_f], yi, YB, ny, 2 if blocked else 0, blocked)
        Bw = _window(refs[n_f : 2 * n_f], yi, YB, ny, off if blocked else 0,
                     blocked)
        op = _op_rows(
            Xw, om, groups_A, groups_M, gs, (YB + 2 * off) if blocked else None
        )
        rr = Bw - op  # halo 1 (blocked) / full (unblocked); virtual halo
        # rows beyond the domain hold garbage but are never paired into a
        # valid coarse row (chain offsets start at `off` — cf. fused_pre).
        A = _dot_last(rr, Ux_ref[...])
        B = _dot_last(rr, Wx_ref[...])
        A = _pairsum_rows(A, off, YBc)
        B = _pairsum_rows(B, off + 1, YBc)
        if rest:
            A = _pairsum_rows(A, z0, restc[0], axis=-3)
            B = _pairsum_rows(B, z0 + 1, restc[0], axis=-3)
        rc_ref[...] = 0.5 * (A + B)

    mat_spec = pl.BlockSpec(
        (nx, nxc), lambda ti, yi: (0, 0), memory_space=pltpu.VMEM
    )
    specs = (
        [_col_spec(TB), mat_spec, mat_spec]
        + _y_specs(TB, YB, gs, blocked)  # x
        + _y_specs(TB, YB, gs, blocked)  # b
    )
    rc_spec = pl.BlockSpec(
        (TB,) + restc + (YBc, nxc),
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
                flops=2 * T * (taps * vol + 2 * vol * nxc),
                bytes_accessed=b.dtype.itemsize * T * vol * 9 // 4,
                transcendentals=0,
            ),
        )
    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([rc_spec])[0],
        out_shape=jax.ShapeDtypeStruct(
            (T,) + restc + (nyc, nxc), b.dtype
        ),
        interpret=interpret,
        **kwargs,
    )(omega, Ux, Wx, *([x] * n_f), *([b] * n_f))
    if crop_c is not None:
        out = jax.lax.slice_in_dim(
            out, crop_c, crop_c + lead[0] // 2, axis=-2
        )
    return out


@functools.partial(
    jax.jit,
    static_argnames=("disps", "groups_M", "gs", "TB", "YB", "interpret"),
)
def _residual_restrict_var_call(
    x, b, W, omega, Ux, Wx, *, disps, groups_M, gs, TB, YB, interpret=False
):
    """r_c = R(b − (A_w(x) + ω⊙M(x))) in one pass — the weighted twin of
    _residual_restrict_call (the restrict tail is coefficient-independent;
    only the residual op swaps to the per-node-weight form, with the
    weight field windowed at the op's output rows like _smooth_var_call)."""
    T = b.shape[0]
    dim = len(gs)
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    restc = tuple((g - 1) // 2 for g in rest)
    nyc, nxc = (ny - 1) // 2, (nx - 1) // 2
    blocked = YB < ny
    YBc = YB // 2 if blocked else nyc
    if blocked and (YB % 16 or YBc % _HALO):
        raise ValueError("residual_restrict needs YB % 16 == 0")
    n_f = 3 if blocked else 1
    off = 1 if blocked else 0
    zeros = (0,) * len(rest)

    def kernel(om_ref, Ux_ref, Wx_ref, *refs):
        rc_ref = refs[-1]
        yi = pl.program_id(1)
        om = _col(om_ref, dim)
        Xw = _window(refs[:n_f], yi, YB, ny, 2 if blocked else 0, blocked)
        Bw = _window(refs[n_f : 2 * n_f], yi, YB, ny, off, blocked)
        Ww = _window(refs[2 * n_f : 3 * n_f], yi, YB, ny, off, blocked)
        op = _op_rows_var(
            Xw, Ww, disps, om, groups_M, gs,
            (YB + 2 * off) if blocked else None,
        )
        rr = Bw - op  # halo 1 (blocked); garbage halo rows never pair into
        # a valid coarse row (chain offsets start at `off`)
        A = _dot_last(rr, Ux_ref[...])
        B = _dot_last(rr, Wx_ref[...])
        A = _pairsum_rows(A, off, YBc)
        B = _pairsum_rows(B, off + 1, YBc)
        if rest:
            A = _pairsum_rows(A, 0, restc[0], axis=-3)
            B = _pairsum_rows(B, 1, restc[0], axis=-3)
        rc_ref[...] = 0.5 * (A + B)

    mat_spec = pl.BlockSpec(
        (nx, nxc), lambda ti, yi: (0, 0), memory_space=pltpu.VMEM
    )
    specs = (
        [_col_spec(TB), mat_spec, mat_spec]
        + _y_specs(TB, YB, gs, blocked)  # x
        + _y_specs(TB, YB, gs, blocked)  # b
        + _w_specs(len(disps), YB, gs, blocked)  # A weights
    )
    rc_spec = pl.BlockSpec(
        (TB,) + restc + (YBc, nxc),
        lambda ti, yi: (ti,) + zeros + (yi, 0),
        memory_space=pltpu.VMEM,
    )
    kwargs = {}
    if not interpret:
        vol = int(np.prod(gs, dtype=int))
        taps = len(disps) + len(groups_M)
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * T * (taps * vol + 2 * vol * nxc),
                bytes_accessed=b.dtype.itemsize * vol * (
                    T * 9 // 4 + pl.cdiv(T, TB) * len(disps)
                ),
                transcendentals=0,
            ),
        )
    wfields = 3 if blocked else 1
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([rc_spec])[0],
        out_shape=jax.ShapeDtypeStruct(
            (T,) + restc + (nyc, nxc), b.dtype
        ),
        interpret=interpret,
        **kwargs,
    )(omega, Ux, Wx, *([x] * n_f), *([b] * n_f), *([W] * wfields))


@functools.partial(
    jax.jit,
    static_argnames=("gs", "TB", "YB", "lead", "interpret"),
)
def _prolong_correct_call(
    x, ec, UxT, WxT, *, gs, TB, YB, lead=None, interpret=False
):
    """x + P(e_c) in one pass (the coarse-grid correction): the prolonged
    fine field never touches HBM. Transfer indexing mirrors
    _fused_post_call with fine halo 0 (no smoother follows in-kernel).

    ``lead``: optional ``(own, hc)`` sharded-slab layout (explicit2d): x
    and the output hold the even ``own``-plane OWNED slab of the leading
    grid axis (gs[0] == own), while ec carries ``hc >= 1`` halo planes per
    side of its ``own//2`` owned coarse planes (fine local plane f reads
    coarse local f//2 and (f-1)//2, so only one LEFT halo plane is truly
    consumed; the symmetric exchange keeps one code path).

    BLOCKED sharded layout (round-5): 3-D composes directly (sharded z ⊥
    blocked y). In 2-D the fine operand arrives ZERO-PADDED by 2·hc
    planes each side (MSPallasLevel.sh_prolong_correct pads and crops):
    padded fine row f = j + 2·hc reads coarse f//2 = j//2 + hc — exactly
    the ec-local row — so the kernel body is the plain serial blocked
    path with ec as the full coarse array."""
    T = x.shape[0]
    dim = len(gs)
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    restc = tuple((g - 1) // 2 for g in rest)
    nyc, nxc = (ny - 1) // 2, (nx - 1) // 2
    blocked = YB < ny
    YBc = YB // 2 if blocked else nyc
    if blocked and (YB % 16 or YBc % _HALO):
        raise ValueError("prolong_correct needs YB % 16 == 0")
    hc = None
    if lead is not None:
        own, hc = lead
        if own % 2 or hc < 1:
            raise ValueError(
                "sharded lead layout needs an even owned extent and "
                "coarse halo >= 1"
            )
        if dim == 2:
            if blocked:
                if gs[0] != own + 4 * hc:
                    raise ValueError(
                        "blocked 2-D sharded prolong needs the fine "
                        "operand zero-padded by 2*hc planes each side"
                    )
            elif own != gs[0]:
                raise ValueError("unblocked sharded lead needs gs[0]==own")
            nyc = own // 2 + 2 * hc  # ec extent incl. its halo planes
        else:
            if own != gs[0]:
                raise ValueError("3-D sharded lead needs gs[0]==own")
            restc = (own // 2 + 2 * hc,) + restc[1:]
    n_c = 3 if blocked else 1
    gsc = restc + (nyc, nxc)
    zeros = (0,) * len(rest)

    def kernel(UxT_ref, WxT_ref, *refs):
        out_ref = refs[-1]
        yi = pl.program_id(1)
        Xm = refs[0][...]
        if blocked:
            Cw = _window(refs[1 : 1 + n_c], yi, YBc, nyc, 2, True)
        elif lead is not None and dim == 2:
            # Sharded lead axis == the y axis: the halo planes ride in the
            # operand itself (no Dirichlet zero-pad).
            Cw = refs[1][...]
        else:
            Cw = jnp.pad(
                refs[1][...],
                [(0, 0)] + [(0, 0)] * len(rest) + [(2, 2), (0, 0)],
            )
        A = _dot_last(Cw, UxT_ref[...])
        B = _dot_last(Cw, WxT_ref[...])
        if rest:
            if lead is not None:
                # Sharded z: fine local f reads stored coarse f//2 + hc
                # (u) / (f-1)//2 + hc (w) — repeat starts 2·hc − hf with
                # fine halo hf = 0 here.
                A = _repeat_rows(A, 2 * hc, rest[0], axis=-3)
                B = _repeat_rows(B, 2 * hc - 1, rest[0], axis=-3)
            else:
                A = _repeat_rows(A, 0, rest[0], axis=-3)
                B = _repeat_rows(B, -1, rest[0], axis=-3)
        # Local fine row l is global f = yi·YB + l; its repeat index into
        # the halo-2 coarse window is l + 2·halo_c = l + 4 (cf. fused_post
        # with fine halo 0). Unblocked sharded-y lead: halo_c = hc, fine
        # halo 0; BLOCKED sharded-y rides the serial window lattice (the
        # fine operand is pre-padded by 2·hc — see the lead docstring).
        nrows = YB if blocked else ny
        y_start = (
            2 * hc if (lead is not None and dim == 2 and not blocked) else 4
        )
        P = 0.5 * (
            _repeat_rows(A, y_start, nrows)
            + _repeat_rows(B, y_start - 1, nrows)
        )
        out_ref[...] = Xm + P

    matT_spec = pl.BlockSpec(
        (nxc, nx), lambda ti, yi: (0, 0), memory_space=pltpu.VMEM
    )
    x_spec = pl.BlockSpec(
        (TB,) + rest + (YB, nx),
        lambda ti, yi: (ti,) + zeros + (yi, 0),
        memory_space=pltpu.VMEM,
    )
    if blocked:
        c_specs = _y_specs(TB, YBc, gsc, True)
    else:
        c_specs = [
            pl.BlockSpec(
                (TB,) + restc + (nyc, nxc),
                lambda ti, yi: (ti,) + zeros + (0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    specs = [matT_spec, matT_spec, x_spec] + c_specs
    kwargs = {}
    if not interpret:
        vol = int(np.prod(gs, dtype=int))
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * T * 2 * vol * nxc,
                bytes_accessed=x.dtype.itemsize * T * vol * 9 // 4,
                transcendentals=0,
            ),
        )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([x_spec])[0],
        out_shape=jax.ShapeDtypeStruct((T,) + gs, x.dtype),
        interpret=interpret,
        **kwargs,
    )(UxT, WxT, x, *([ec] * n_c))


# ------------------------------------- fused V-cycle kernels, weighted forms
#
# Mirrors _fused_pre_call/_fused_post_call for the variable-coefficient
# operator of GalerkinMultiShiftMultigrid (per-node A tap weights, constant
# mass stencil): the weighted stencil replaces _op_rows with _op_rows_var
# and the Jacobi diagonal is formed in-kernel from the weight window at the
# matching halo extent (cf. _smooth_var_call). The transfer stages are
# coefficient-independent (nested-P1 interpolation), so the restriction/
# prolongation machinery is shared unchanged.


@functools.partial(
    jax.jit,
    static_argnames=(
        "disps", "kc", "cM", "groups_M", "gs", "TB", "YB", "nu", "interpret"
    ),
)
def _fused_pre_var_call(
    b, W, omega, invT, invDel, Ux, Wx, *, disps, kc, cM, groups_M, gs, TB,
    YB, nu, interpret=False,
):
    """(x, r_c) with x = zero-init degree-ν sweep on b, r = b − Op_w(x),
    r_c = R(r), for the weighted operator."""
    T = b.shape[0]
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    restc = tuple((g - 1) // 2 for g in rest)
    nyc, nxc = (ny - 1) // 2, (nx - 1) // 2
    YB = min(YB, ny)
    blocked = YB < ny
    YBc = YB // 2 if blocked else nyc
    G = nu - 1
    E = 2  # extra halo carried so the residual is valid on 1 halo row
    if blocked and (G + E + 1 > _HALO or YB % 16):
        raise ValueError("fused_pre needs halo G+3 <= 8 and YB % 16 == 0")
    n_f = 3 if blocked else 1
    off = 1 if blocked else 0
    dim = len(gs)

    def kernel(om_ref, iT_ref, iDel_ref, Ux_ref, Wx_ref, *refs):
        x_ref, rc_ref = refs[-2], refs[-1]
        yi = pl.program_id(1)
        om = _col(om_ref, dim)
        iT, iDel = _col(iT_ref, dim), _col(iDel_ref, dim)
        Bw = _window(refs[:n_f], yi, YB, ny, G + E, blocked)
        Ww = _window(refs[n_f : 2 * n_f], yi, YB, ny, G + E, blocked)
        iD = _inv_diag_var(Ww[kc], om, cM)

        def rows(h):
            return (YB + 2 * h) if blocked else None

        # zero-init Chebyshev-Jacobi sweep, carrying E extra halo rows
        r = iD * Bw
        d = r * iT
        x = d
        rho = 1.0 / _SIGMA
        for k in range(1, nu):
            rho_new = 1.0 / (2.0 * _SIGMA - rho)
            c = 1 if blocked else 0
            if blocked:
                d = _domain_mask(d, yi, YB, ny, G + E - k + 1)
            Wk = _crop(Ww, k) if blocked else Ww
            iDk = _crop(iD, k) if blocked else iD
            Opd = _op_rows_var(d, Wk, disps, om, groups_M, gs, rows(G + E - k))
            r = _crop(r, c) - iDk * Opd
            d = rho_new * rho * _crop(d, c) + (2.0 * rho_new) * iDel * r
            x = _crop(x, c) + d
            rho = rho_new
        # x now carries halo E; residual on 1 halo row
        if blocked:
            x = _domain_mask(x, yi, YB, ny, E)
        W1 = _crop(Ww, G + E - 1) if blocked else Ww
        Opx = _op_rows_var(x, W1, disps, om, groups_M, gs, rows(E - 1))
        Bw1 = _crop(Bw, G + 1 if blocked else 0)
        rr = Bw1 - Opx  # halo 1 (blocked) / full (unblocked)
        x_ref[...] = _crop(x, E if blocked else 0)
        A = _dot_last(rr, Ux_ref[...])
        B = _dot_last(rr, Wx_ref[...])
        A = _pairsum_rows(A, off, YBc)
        B = _pairsum_rows(B, off + 1, YBc)
        if rest:
            A = _pairsum_rows(A, 0, restc[0], axis=-3)
            B = _pairsum_rows(B, 1, restc[0], axis=-3)
        rc_ref[...] = 0.5 * (A + B)

    mat_spec = pl.BlockSpec(
        (nx, nxc), lambda ti, yi: (0, 0), memory_space=pltpu.VMEM
    )
    specs = (
        [_col_spec(TB)] * 3
        + [mat_spec, mat_spec]
        + _y_specs(TB, YB, gs, blocked)  # b
        + _w_specs(len(disps), YB, gs, blocked)  # A weights
    )
    zeros = (0,) * len(rest)
    x_spec = pl.BlockSpec(
        (TB,) + rest + (YB, nx),
        lambda ti, yi: (ti,) + zeros + (yi, 0),
        memory_space=pltpu.VMEM,
    )
    rc_spec = pl.BlockSpec(
        (TB,) + restc + (YBc, nxc),
        lambda ti, yi: (ti,) + zeros + (yi, 0),
        memory_space=pltpu.VMEM,
    )
    kwargs = {}
    if not interpret:
        vol = int(np.prod(gs, dtype=int))
        taps = len(disps) + len(groups_M)
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * T * (taps * (nu + 1) * vol + 2 * vol * nxc),
                bytes_accessed=b.dtype.itemsize * vol * (
                    T * 9 // 4 + pl.cdiv(T, TB) * len(disps)
                ),
                transcendentals=0,
            ),
        )
    wfields = 3 if blocked else 1
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([x_spec, rc_spec]),
        out_shape=[
            jax.ShapeDtypeStruct((T,) + rest + (ny, nx), b.dtype),
            jax.ShapeDtypeStruct((T,) + restc + (nyc, nxc), b.dtype),
        ],
        interpret=interpret,
        **kwargs,
    )(omega, invT, invDel, Ux, Wx, *([b] * n_f), *([W] * wfields))


@functools.partial(
    jax.jit,
    static_argnames=(
        "disps", "kc", "cM", "groups_M", "gs", "TB", "YB", "nu", "interpret"
    ),
)
def _fused_post_var_call(
    x, b, ec, W, omega, invT, invDel, UxT, WxT, *, disps, kc, cM, groups_M,
    gs, TB, YB, nu, interpret=False,
):
    """smooth(x + P(ec), b) for the weighted operator: prolongation +
    correction + degree-ν sweep in one pass."""
    T = b.shape[0]
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    restc = tuple((g - 1) // 2 for g in rest)
    nyc, nxc = (ny - 1) // 2, (nx - 1) // 2
    YB = min(YB, ny)
    blocked = YB < ny
    YBc = YB // 2 if blocked else nyc
    G = nu - 1
    if blocked and (YB % 16 or YBc % _HALO):
        raise ValueError("fused_post needs YB % 16 == 0")
    n_f = 3 if blocked else 1
    n_c = 3 if blocked else 1
    gsc = restc + (nyc, nxc)
    dim = len(gs)

    def kernel(om_ref, iT_ref, iDel_ref, UxT_ref, WxT_ref, *refs):
        out_ref = refs[-1]
        yi = pl.program_id(1)
        om = _col(om_ref, dim)
        iT, iDel = _col(iT_ref, dim), _col(iDel_ref, dim)
        Xw = _window(refs[:n_f], yi, YB, ny, G + 1, blocked)
        Bw = _window(refs[n_f : 2 * n_f], yi, YB, ny, G, blocked)
        if blocked:
            Cw = _window(refs[2 * n_f : 2 * n_f + n_c], yi, YBc, nyc, 2, True)
        else:
            Cw = jnp.pad(
                refs[2 * n_f][...],
                [(0, 0)] + [(0, 0)] * len(rest) + [(2, 2), (0, 0)],
            )
        Ww = _window(
            refs[2 * n_f + n_c : 2 * n_f + 2 * n_c], yi, YB, ny, G, blocked
        )
        iD = _inv_diag_var(Ww[kc], om, cM)
        # prolongation on the window rows of Xw (halo G+1 = nu)
        A = _dot_last(Cw, UxT_ref[...])
        B = _dot_last(Cw, WxT_ref[...])
        nrows = YB + 2 * (G + 1) if blocked else ny
        start = 4 - (G + 1) if blocked else 4
        if rest:
            A = _repeat_rows(A, 0, rest[0], axis=-3)
            B = _repeat_rows(B, -1, rest[0], axis=-3)
        P = 0.5 * (
            _repeat_rows(A, start, nrows) + _repeat_rows(B, start - 1, nrows)
        )
        Xc = Xw + P
        # standard non-zero-init sweep (mirrors _smooth_var_call)
        if blocked:
            Xc = _domain_mask(Xc, yi, YB, ny, G + 1)

        def rows(h):
            return (YB + 2 * h) if blocked else None

        r = iD * (Bw - _op_rows_var(Xc, Ww, disps, om, groups_M, gs, rows(G)))
        x_acc = _crop(Xc, 1 if blocked else 0)
        d = r * iT
        x_acc = x_acc + d
        rho = 1.0 / _SIGMA
        for k in range(1, nu):
            rho_new = 1.0 / (2.0 * _SIGMA - rho)
            c = 1 if blocked else 0
            if blocked:
                d = _domain_mask(d, yi, YB, ny, G - k + 1)
            Wk = _crop(Ww, k) if blocked else Ww
            iDk = _crop(iD, k) if blocked else iD
            Opd = _op_rows_var(d, Wk, disps, om, groups_M, gs, rows(G - k))
            r = _crop(r, c) - iDk * Opd
            d = rho_new * rho * _crop(d, c) + (2.0 * rho_new) * iDel * r
            x_acc = _crop(x_acc, c) + d
            rho = rho_new
        out_ref[...] = x_acc

    matT_spec = pl.BlockSpec(
        (nxc, nx), lambda ti, yi: (0, 0), memory_space=pltpu.VMEM
    )
    zeros = (0,) * len(rest)
    if blocked:
        c_specs = _y_specs(TB, YBc, gsc, True)
    else:
        c_specs = [
            pl.BlockSpec(
                (TB,) + restc + (nyc, nxc),
                lambda ti, yi: (ti,) + zeros + (0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    specs = (
        [_col_spec(TB)] * 3
        + [matT_spec, matT_spec]
        + _y_specs(TB, YB, gs, blocked)  # x
        + _y_specs(TB, YB, gs, blocked)  # b
        + c_specs  # ec
        + _w_specs(len(disps), YB, gs, blocked)  # A weights
    )
    out_spec = pl.BlockSpec(
        (TB,) + rest + (YB, nx),
        lambda ti, yi: (ti,) + zeros + (yi, 0),
        memory_space=pltpu.VMEM,
    )
    kwargs = {}
    if not interpret:
        vol = int(np.prod(gs, dtype=int))
        taps = len(disps) + len(groups_M)
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * T * (taps * nu * vol + 2 * vol * nxc),
                bytes_accessed=b.dtype.itemsize * vol * (
                    T * 13 // 4 + pl.cdiv(T, TB) * len(disps)
                ),
                transcendentals=0,
            ),
        )
    wfields = 3 if blocked else 1
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(ny, YB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([out_spec])[0],
        out_shape=jax.ShapeDtypeStruct((T,) + rest + (ny, nx), b.dtype),
        interpret=interpret,
        **kwargs,
    )(omega, invT, invDel, UxT, WxT, *([x] * n_f), *([b] * n_f),
      *([ec] * len(c_specs)), *([W] * wfields))
