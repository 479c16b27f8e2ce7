"""Fused banded-DIA smoother/residual kernels for the flat-dof multigrid.

The unstructured inner solvers (ops/multigrid.NestedMultiShiftMultigrid /
SAMultiShiftMultigrid — L-shape nested hierarchies, AMG) run their level
operators as XLA DIA matvecs over the flat (T, m) layout. Measured at the
25.2 MDoF L-shape (results_tpu/r2_profile_lshape_nested.jsonl) the PCG
iteration is ~93% V-cycles, and per-DoF the unstructured solve sits ~2.4x
behind the structured path — whose smoothers are fused Pallas kernels
(ops/mg_pallas.py). This module is the flat-layout twin of those kernels:

- operators are BANDED on lex-sorted meshes (fem.sort_vertices_lex: 11
  diagonals at the L-shape vs 12365 in raw refinement order), so a tap is a
  static shifted slice along the LANE (dof) axis — bounded by the bandwidth
  bw = max|offset| (~n_x+1), not a generic gather;
- A and M share a union offset set (host-prepared, zero-padded values), so
  one tap load serves both operators;
- the degree-ν Chebyshev–Jacobi recurrence runs in one pass per sweep with
  the shrinking-window scheme of mg_pallas._smooth_call, in lane units:
  each chained Op application consumes one (128-aligned) bandwidth of halo;
- the Jacobi diagonal 1/(dA + ω·dM) is per-NODE (unstructured), built
  in-kernel from windowed diagonal fields, with the reciprocal guarded to 0
  on out-of-domain lanes — which pins every recurrence update there to 0.0
  exactly (the same zero-scale discipline the sharded paths use), so no
  in-loop domain masks are needed.

Blocking: grid (T/TB, m/MB) with MB a multiple of the aligned max halo
HS = ν·⌈bw/128⌉·128; halos ride explicit up/dn slab operands (BlockSpec
blocks are disjoint tiles). When one block covers the dof axis, windows are
zero-padded in-register to the same halo so the recurrence is uniform.
Engagement is gated on measured hardware behavior by the caller
(solver/heateq.py) exactly like the structured kernels. f32/bf16 only
(Pallas TPU has no f64); interpret mode on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kron_pallas import _i32_specs

_SIGMA = 5.0 / 3.0  # theta/delta for the lmin = lmax/4 smoothing range
_LANE = 128


def _union_offsets(offA, valsA, offM, valsM):
    """Host prep: union offset tuple + (ndu, m) value arrays for A and M
    (zero rows where an operator lacks the diagonal). vals inputs are the
    DiaMatrix (m, ndiag) layout."""
    union = tuple(sorted(set(offA) | set(offM)))
    m = valsA.shape[0]
    vA = np.zeros((len(union), m))
    vM = np.zeros((len(union), m))
    offA = tuple(offA)
    offM = tuple(offM)
    for k, off in enumerate(union):
        if off in offA:
            vA[k] = valsA[:, offA.index(off)]
        if off in offM:
            vM[k] = valsM[:, offM.index(off)]
    return union, vA, vM


def _col_spec1(TB):
    return pl.BlockSpec(
        (TB, 1, _LANE), lambda ti, mi: (ti, 0, 0), memory_space=pltpu.VMEM
    )


def _lane_specs(rows, MB, HS, m, blocked, t_map=None):
    """BlockSpecs for one lane-blocked field of ``rows`` leading rows:
    mid (+ up/dn halo slabs when blocked). ``t_map`` overrides the leading
    index map (fields without a time axis pass ``lambda ti: 0``)."""
    tm = (lambda ti: ti) if t_map is None else t_map
    Q = MB // HS if blocked else 0
    nHS = pl.cdiv(m, HS) if blocked else 0

    def spec(w, mmap):
        return pl.BlockSpec(
            (rows, w), lambda ti, mi, mmap=mmap: (tm(ti), mmap(mi)),
            memory_space=pltpu.VMEM,
        )

    if not blocked:
        return [spec(MB, lambda mi: 0)]
    return [
        spec(MB, lambda mi: mi),
        spec(HS, lambda mi: jnp.maximum(mi * Q - 1, 0)),
        spec(HS, lambda mi: jnp.minimum(mi * Q + Q, nHS - 1)),
    ]


def _lane_window(refs, mi, MB, HS, m, blocked):
    """(…, MB + 2·HS) window with out-of-domain lanes zeroed (the DIA
    matvec's zero-extension semantics). Unblocked fields are zero-padded
    in-register to the same halo extent so all callers share one halo
    bookkeeping."""
    if not blocked:
        W = refs[0][...]
        if W.shape[-1] > m:  # lane-aligned block past the array tail
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (1, W.shape[-1]), 1
            )
            W = jnp.where(lane < m, W, 0.0)
        pad = [(0, 0)] * (W.ndim - 1) + [(HS, HS)]
        return jnp.pad(W, pad)
    mid, up, dn = (r[...] for r in refs)
    m0 = mi * MB
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, MB), 1)
    mid = jnp.where(m0 + lane < m, mid, 0.0)
    laneh = jax.lax.broadcasted_iota(jnp.int32, (1, HS), 1)
    u = jnp.where(m0 - HS + laneh >= 0, up, 0.0)
    d = jnp.where(m0 + MB + laneh < m, dn, 0.0)
    return jnp.concatenate([u, mid, d], axis=-1)


def _crop_l(A, k: int):
    """Drop k lanes from each side (no-op at k == 0)."""
    if k == 0:
        return A
    return A[..., k:-k]


def _dia_op(yw, vAw, vMw, om, offsets, h_y: int, h_v: int, h_out: int,
            MB: int):
    """A(y) + ω·M(y) on lane windows: yw at halo h_y, value windows at
    halo h_v, output at halo h_out (requires h_y ≥ h_out + bw)."""
    W_out = MB + 2 * h_out
    by = h_y - h_out
    bv = h_v - h_out
    outA = None
    outM = None
    for k, off in enumerate(offsets):
        tap = yw[..., by + off: by + off + W_out]
        vA = vAw[k: k + 1, bv: bv + W_out]
        vM = vMw[k: k + 1, bv: bv + W_out]
        tA = vA * tap
        tM = vM * tap
        outA = tA if outA is None else outA + tA
        outM = tM if outM is None else outM + tM
    return outA + om * outM


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "m", "TB", "MB", "HS", "step", "nu", "zero_init",
        "interpret",
    ),
)
def _dia_smooth_call(
    x, b, vA, vM, dA, dM, omega, invT, invDel, *, offsets, m, TB, MB, HS,
    step, nu, zero_init=False, interpret=False,
):
    """One degree-ν Chebyshev–Jacobi sweep over (T, m) flat arrays.
    ``step``: 128-aligned bandwidth (lanes of halo one Op application
    consumes); HS = max(ν, ν_post)·step is the assembled window halo."""
    T = b.shape[0]
    blocked = MB < m
    n_f = 3 if blocked else 1
    n_x = 0 if zero_init else n_f
    G = nu - 1
    ndu = len(offsets)

    def kernel(om_ref, iT_ref, iDel_ref, *refs):
        out_ref = refs[-1]
        mi = pl.program_id(1)
        om = om_ref[..., 0]
        iT = iT_ref[..., 0]
        iDel = iDel_ref[..., 0]
        win = lambda rs: _lane_window(rs, mi, MB, HS, m, blocked)
        Bw = win(refs[n_x: n_x + n_f])
        o = n_x + n_f
        vAw = win(refs[o: o + n_f])
        vMw = win(refs[o + n_f: o + 2 * n_f])
        dAw = win(refs[o + 2 * n_f: o + 3 * n_f])
        dMw = win(refs[o + 3 * n_f: o + 4 * n_f])
        # Per-node Jacobi diagonal, reciprocal guarded to 0 outside the
        # domain (zeroed windows ⇒ den == 0 there): every recurrence update
        # on invalid lanes is then exactly 0.0 — no in-loop masks needed.
        den = dAw + om * dMw
        invd = jnp.where(
            den != 0.0, 1.0 / jnp.where(den != 0.0, den, 1.0), 0.0
        )
        cw = lambda A, h: _crop_l(A, HS - h)  # full-halo window -> halo h
        hG = G * step
        if zero_init:
            r = cw(invd, hG) * cw(Bw, hG)
            x_acc = None
        else:
            Xw = win(refs[:n_f])
            opx = _dia_op(Xw, vAw, vMw, om, offsets, HS, HS, hG, MB)
            r = cw(invd, hG) * (cw(Bw, hG) - opx)
            x_acc = cw(Xw, hG)
        d = r * iT
        x_acc = d if x_acc is None else x_acc + d
        rho = 1.0 / _SIGMA
        for k in range(1, nu):
            rho_new = 1.0 / (2.0 * _SIGMA - rho)
            h_in = (G - k + 1) * step
            h_out = (G - k) * step
            Opd = _dia_op(d, vAw, vMw, om, offsets, h_in, HS, h_out, MB)
            r = _crop_l(r, step) - cw(invd, h_out) * Opd
            d = rho_new * rho * _crop_l(d, step) + (2.0 * rho_new) * iDel * r
            x_acc = _crop_l(x_acc, step) + d
            rho = rho_new
        out_ref[...] = x_acc

    fspec = lambda rows, tm=None: _lane_specs(rows, MB, HS, m, blocked, tm)
    specs = (
        [_col_spec1(TB)] * 3
        + fspec(TB) * (0 if zero_init else 1)  # x
        + fspec(TB)  # b
        + fspec(ndu, lambda ti: 0) * 2  # vA, vM
        + fspec(1, lambda ti: 0) * 2  # dA, dM
    )
    out_spec = pl.BlockSpec(
        (TB, MB), lambda ti, mi: (ti, mi), memory_space=pltpu.VMEM
    )
    kwargs = {}
    if not interpret:
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=3 * ndu * nu * T * m,
                bytes_accessed=b.dtype.itemsize
                * (T * m * (2 if zero_init else 3) + 2 * ndu * m),
                transcendentals=0,
            ),
        )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(m, MB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([out_spec])[0],
        out_shape=jax.ShapeDtypeStruct(x.shape, b.dtype),
        interpret=interpret,
        **kwargs,
    )(
        omega, invT, invDel,
        *([x] * n_x), *([b] * n_f),
        *([vA] * n_f), *([vM] * n_f),
        *([dA] * n_f), *([dM] * n_f),
    )


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "m", "TB", "MB", "HS", "interpret"),
)
def _dia_residual_call(
    x, b, vA, vM, omega, *, offsets, m, TB, MB, HS, interpret=False
):
    """out = b − (A(x) + ω⊙M(x)) in one fused pass over (T, m)."""
    T = b.shape[0]
    blocked = MB < m
    n_f = 3 if blocked else 1
    ndu = len(offsets)

    def kernel(om_ref, *refs):
        out_ref = refs[-1]
        mi = pl.program_id(1)
        om = om_ref[..., 0]
        win = lambda rs: _lane_window(rs, mi, MB, HS, m, blocked)
        Xw = win(refs[:n_f])
        Bw = win(refs[n_f: 2 * n_f])
        vAw = win(refs[2 * n_f: 3 * n_f])
        vMw = win(refs[3 * n_f: 4 * n_f])
        op = _dia_op(Xw, vAw, vMw, om, offsets, HS, HS, 0, MB)
        out_ref[...] = _crop_l(Bw, HS) - op

    fspec = lambda rows, tm=None: _lane_specs(rows, MB, HS, m, blocked, tm)
    specs = (
        [_col_spec1(TB)]
        + fspec(TB) * 2
        + fspec(ndu, lambda ti: 0) * 2
    )
    out_spec = pl.BlockSpec(
        (TB, MB), lambda ti, mi: (ti, mi), memory_space=pltpu.VMEM
    )
    kwargs = {}
    if not interpret:
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=3 * ndu * T * m,
                bytes_accessed=b.dtype.itemsize * (3 * T * m + 2 * ndu * m),
                transcendentals=0,
            ),
        )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(m, MB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([out_spec])[0],
        out_shape=jax.ShapeDtypeStruct(x.shape, b.dtype),
        interpret=interpret,
        **kwargs,
    )(omega, *([x] * n_f), *([b] * n_f), *([vA] * n_f), *([vM] * n_f))


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "m", "TB", "MB", "HS", "interpret"),
)
def _dia_apply_call(
    x, vA, *, offsets, m, TB, MB, HS, interpret=False
):
    """out = A(x) in one fused banded pass (the plain stiffness application
    between the two shifted solves of the K_X sandwich)."""
    T = x.shape[0]
    blocked = MB < m
    n_f = 3 if blocked else 1
    ndu = len(offsets)

    def kernel(*refs):
        out_ref = refs[-1]
        mi = pl.program_id(1)
        win = lambda rs: _lane_window(rs, mi, MB, HS, m, blocked)
        Xw = win(refs[:n_f])
        vAw = win(refs[n_f: 2 * n_f])
        W_out = MB
        out = None
        for k, off in enumerate(offsets):
            tap = Xw[..., HS + off: HS + off + W_out]
            t = vAw[k: k + 1, HS: HS + W_out] * tap
            out = t if out is None else out + t
        out_ref[...] = out

    fspec = lambda rows, tm=None: _lane_specs(rows, MB, HS, m, blocked, tm)
    specs = fspec(TB) + fspec(ndu, lambda ti: 0)
    out_spec = pl.BlockSpec(
        (TB, MB), lambda ti, mi: (ti, mi), memory_space=pltpu.VMEM
    )
    kwargs = {}
    if not interpret:
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * ndu * T * m,
                bytes_accessed=x.dtype.itemsize * (2 * T * m + ndu * m),
                transcendentals=0,
            ),
        )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, TB), pl.cdiv(m, MB)),
        in_specs=_i32_specs(specs),
        out_specs=_i32_specs([out_spec])[0],
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        **kwargs,
    )(*([x] * n_f), *([vA] * n_f))


def _pick_blocks_dia(T, m, HS):
    """(TB, MB) — hardware-measured (results_tpu/r3_probe_dia.jsonl, real
    v5e at the L-shape fine level m=195585, T=129, HS=1024):

    - TB must be sublane-aligned: Mosaic requires 2-D block rows divisible
      by 8 (TB=4 fails lowering; TB=8 compiles). T < 8 uses TB=T (block
      equal to the array dimension is the other legal case).
    - MB=16384: 3.49 ms/fine-stage = 1.79x the XLA stage (MB=8192: 1.63x;
      the giant near-whole-axis window crashed the remote compile helper).
      MB stays a multiple of HS (the halo-slab index maps tile MB by HS).
    - Wide-band levels (HS >= 2048 — e.g. the 1.05M-dof L-shape fine
      level, bw=1184 -> HS=2560) scale the target to 16*HS: at MB=15360
      a quarter of every window is halo; the round-4 probe at m=1049025,
      T=33 (results_tpu/r4_probe_dia_1m.jsonl) measures MB=15360 at
      1.38x XLA, 20480 at 1.44x, (TB=8, MB=40960) at **1.55x** — all
      exact.
    """
    TB = 8 if T >= 8 else max(T, 1)
    mp = -(-m // _LANE) * _LANE
    target = 16 * HS if HS >= 2048 else 16384
    if mp <= target + 2 * HS:
        return TB, mp  # whole axis in one block (in-register halo pad)
    return TB, max(HS, (target // HS) * HS)


#: Smallest m at which a wide-band (step >= 640) kernel family is
#: measured solve-stable on hardware (results_tpu/r5_fault_sweep.jsonl).
DIA_WIDE_STABLE_M = 1_049_025


def dia_hardware_gate(pls: list, interpret: bool) -> list:
    """Per-hierarchy hardware engagement gate for DiaPallasLevel lists.

    Round-5 boundary sweep (scripts/dia_fault_bisect.py,
    results_tpu/r5_fault_sweep.jsonl + r5_dia_fault_bisect.jsonl): the
    worker-fault trigger tracks the level SIZE m, not the block MB and
    not multi-level interaction — at fixed geometry (bw=592 -> step 640,
    HS=1280) the family faults ALONE at m=261665 for every
    MB in {2560, 5120, 10240, 15360} and at m=523329, while m=1049025 is
    stable; the step-1280 family (bw=1184, MB=40960) likewise faults at
    m=261665 but is stable at m=1049025. Rule 1: wide-band families
    (step >= 640) engage on hardware only at m >= DIA_WIDE_STABLE_M, the
    measured-stable island (narrow families, steps <= 512, are round-3
    production-proven at 0.2-1.05M rows and stay unrestricted).

    Round-4 finding kept as rule 2 (results_tpu/r4_nested_bisect_*.log):
    MULTI-level engagement under a wide-band level also faults even when
    the partner is narrow (L0 step-1280 + L2 step-384 crashed), so any
    hierarchy with an engaged wide-band level runs kernels on ONE level
    only. The wide-band test is max(step) over ALL engaged levels (not
    just the first): if the hierarchy's fine level were ever excluded by
    the size gate while a coarser wide-band level stayed engaged, a
    first-level-only check would silently bypass the blocklist (round-4
    advisor finding). Interpret mode (CPU tests) is unaffected."""
    if interpret:
        return pls
    pls = [
        None
        if (p is not None and p.step >= 640 and p.m < DIA_WIDE_STABLE_M)
        else p
        for p in pls
    ]
    engaged = [p for p in pls if p is not None]
    if len(engaged) > 1 and max(p.step for p in engaged) >= 640:
        first = engaged[0]
        return [p if p is first else None for p in pls]
    return pls


class DiaPallasLevel:
    """Pallas smoother/residual for one flat-dof multigrid level (DIA
    storage — NestedMultiShiftMultigrid levels and the SA hierarchy's
    banded fine level). Mirrors ops.mg_pallas.MSPallasLevel's interface;
    per-row Chebyshev columns live in the params pytree (``columns``),
    kernel-layout operator values in ``values``."""

    # MSPallasLevel interface parity: no fused/semi-fused transfer stages
    # on the flat layout (transfers are gather passes; measured separately).
    fused_ok = False
    semi_ok = False
    flat_dia = True  # routes solver.apply_KX's middle apply_A(x, plv)

    def __init__(self, lev, T: int, dtype, nu: int, interpret=False,
                 nu_post: int | None = None):
        """``lev``: an ops.multigrid._NestedLevel / _SALevel with DIA
        storage (lev.fmt == 'dia' where the attribute exists)."""
        if getattr(lev, "fmt", "dia") != "dia":
            raise ValueError("DiaPallasLevel needs DIA level storage")
        self.m = int(lev.dA.shape[0])
        union, vA, vM = _union_offsets(lev.offA, lev.Av, lev.offM, lev.Mv)
        self.offsets = union
        self._vA_host = vA
        self._vM_host = vM
        self.bw = max(max(union), -min(union))
        self.nu = nu
        self.nu_post = nu if nu_post is None else nu_post
        self.step = -(-self.bw // _LANE) * _LANE
        self.HS = max(self.nu, self.nu_post) * self.step
        self.dtype = jnp.dtype(dtype)
        self.interpret = interpret
        self.TB, self.MB = _pick_blocks_dia(T, self.m, self.HS)

    @property
    def needs_weights(self) -> bool:
        return False

    @staticmethod
    def columns(lev, omega_rows: np.ndarray, dtype):
        """(T,1,128) per-row coefficient columns (exact per-ω Gershgorin
        bounds at the distinct shift values — same derivation as
        NestedMultiShiftMultigrid.row_params; invD is per-node and built
        in-kernel from the dA/dM fields)."""
        omega_rows = np.asarray(omega_rows, np.float64)
        uniq, inv = np.unique(omega_rows, return_inverse=True)
        lam_u = np.empty(uniq.size)
        for k, w in enumerate(uniq):
            lam_u[k] = ((lev.rsA + w * lev.rsM) / (lev.dA + w * lev.dM)).max()
        lam = 1.1 * lam_u[inv]
        cols = {
            "omega": omega_rows,
            "invT": 1.0 / (0.625 * lam),
            "invDel": 1.0 / (0.375 * lam),
        }
        to128 = lambda a: jnp.broadcast_to(
            jnp.asarray(a, dtype)[:, None, None], (a.shape[0], 1, _LANE)
        ).copy()
        return {k: to128(v) for k, v in cols.items()}

    def values(self, lev, dtype):
        """Kernel-layout operator arrays for the params pytree: union-offset
        (ndu, m) values + (1, m) diagonal fields."""
        return {
            "vA": jnp.asarray(self._vA_host, dtype),
            "vM": jnp.asarray(self._vM_host, dtype),
            "dA2": jnp.asarray(lev.dA, dtype)[None, :],
            "dM2": jnp.asarray(lev.dM, dtype)[None, :],
        }

    def _tb_for(self, T_actual: int) -> int:
        """Per-call time block: the constructor's T is N+1, but K_Y arrays
        have N time rows — when N+1 < 8 the cached TB=N+1 is neither
        divisible by 8 nor equal to the actual array dim, which fails
        Mosaic lowering (the measured sublane rule, _pick_blocks_dia).
        Keeps the configured TB when it is legal for the array actually
        being tiled (the probe script sweeps TB directly); clamps
        otherwise."""
        tb = self.TB
        if tb <= T_actual and (tb % 8 == 0 or tb == T_actual):
            return tb
        return 8 if T_actual >= 8 else max(T_actual, 1)

    def smooth(self, x, b, cols, vals, zero_init=False, post=False):
        return _dia_smooth_call(
            b if zero_init else x, b, vals["vA"], vals["vM"],
            vals["dA2"], vals["dM2"],
            cols["omega"], cols["invT"], cols["invDel"],
            offsets=self.offsets, m=self.m, TB=self._tb_for(b.shape[0]),
            MB=self.MB, HS=self.HS, step=self.step,
            nu=self.nu_post if post else self.nu, zero_init=zero_init,
            interpret=self.interpret,
        )

    def residual(self, x, b, cols, vals):
        return _dia_residual_call(
            x, b, vals["vA"], vals["vM"], cols["omega"],
            offsets=self.offsets, m=self.m, TB=self._tb_for(b.shape[0]),
            MB=self.MB, HS=self.HS, interpret=self.interpret,
        )

    def apply_A(self, x, vals):
        """Plain stiffness application A(x) (the middle step of the K_X
        sandwich) as one fused banded pass."""
        return _dia_apply_call(
            x, vals["vA"],
            offsets=self.offsets, m=self.m, TB=self._tb_for(x.shape[0]),
            MB=self.MB, HS=self.HS, interpret=self.interpret,
        )
