"""Fused Pallas TPU kernels for the space-time Kronecker operators B and Bᵀ.

The parabolic operator B = A_t⊗M_x + M_t⊗A_x and its adjoint are the hot
matvecs of every PCG iteration (SURVEY.md §3.1). The XLA stencil path
(ops/stencil.py) materializes the time differences/sums and the padded
stencil inputs as separate fusions, sustaining ~54% of HBM roofline on the
headline bench; these kernels fuse the whole application — time pairing,
both spatial stencils, and the h-scaling — into one pass over U, reading
each input row ~(1+1/TB) times.

Blocking layout (all via BlockSpec, no manual DMA):

- time axis: aligned blocks of TB rows plus a one-row "next" (B) / "prev"
  (Bᵀ) operand — overlapping windows are not expressible with a single
  BlockSpec, but a second single-row view of the same array is. Time is a
  leading (non-tiled) axis, so one-row blocks are Mosaic-legal there.
- spatial axes: kept whole per block when the working set fits VMEM; the
  stencil shifts then use an in-kernel zero pad (= the Dirichlet guard).
  For larger grids the second-to-last axis (y) is blocked in multiples of
  8 rows (Mosaic's sublane tile), with 8-row halo-slab operands (clamped
  index maps, one row used, edges masked to zero in-kernel) — one-row halo
  blocks are not Mosaic-legal on a tiled axis.

Bᵀ maps (T, …) → (T+1, …): the grid runs one extra time block whose only
valid output row is T (pallas masks the ragged write); that block reads the
clamped last V block and emits out[T] = M·V[T-1] + h·A·V[T-1].

f64 is not supported in Pallas on TPU — callers fall back to the XLA
stencil path (the f64 parity configs are latency- not bandwidth-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Workspace budget for picking (TB, YB): the kernel live set is ~8 blocks
# of (TB, …, YB+2, nx). Measured on the axon v5 chip: unblocked whole-grid
# kernels compile and run well past 16 MB (a TB=64, 127² kernel — live set
# ~35 MB — runs at 353 GDoF/s because input, output, and the chained-loop
# carry all stay VMEM-resident); at 511² a 267 MB request fails to compile.
_VMEM_BUDGET = 32 * 1024 * 1024
_HALO = 8  # Mosaic sublane tile: the minimum legal block on a tiled axis


def _weight_groups(disps, weights):
    """Drop zero taps and group displacements by weight (ops/stencil.py's
    measured-fast form: sum taps first, multiply once per distinct weight)."""
    groups: dict[float, list] = {}
    for d, w in zip(disps, weights):
        if w != 0.0:
            groups.setdefault(float(w), []).append(tuple(d))
    return tuple((w, tuple(ds)) for w, ds in groups.items())


def _tap_fn(V, gs, yb):
    """Shared tap extraction of the in-kernel stencils: zero-pads every
    unblocked spatial axis of V (the Dirichlet guard; the blocked axis
    already carries halo rows) and returns ``tap(disp)`` slicing one
    displaced window. The ONE copy of the halo/blocked-axis indexing
    convention — _stencil, _stencil_var, and the fused-Op forms of
    ops/mg_pallas all build on it."""
    dim = len(gs)
    blocked = dim - 2 if yb is not None else -1
    pad = [(0, 0)]
    for a in range(dim):
        pad.append((0, 0) if a == blocked else (1, 1))
    Vp = jnp.pad(V, pad)

    def tap(disp):
        idx = [slice(None)]
        for a, d in enumerate(disp):
            if a == blocked:
                idx.append(slice(1 + d, 1 + d + yb))
            else:
                idx.append(slice(1 + d, 1 + d + gs[a]))
        return Vp[tuple(idx)]

    return tap


def _stencil(V, groups, gs, yb):
    """In-kernel spatial stencil on (TT, *sp). When ``yb`` is None the
    blocked axis carries no halo rows and is zero-padded like the other
    axes; otherwise sp's axis -2 has yb+2 rows including halos. Returns
    (TT, …, yb or ny, nx)."""
    tap = _tap_fn(V, gs, yb)
    out = None
    for w, ds in groups:
        acc = None
        for disp in ds:
            t = tap(disp)
            acc = t if acc is None else acc + t
        term = w * acc
        out = term if out is None else out + term
    return out


def _assemble_y(up_slab, mid, dn_slab, yi, YB, ny):
    """Stack halo rows around a y block: takes the last row of the up slab
    and the first row of the dn slab, zeroing rows beyond the domain and
    the padded tail of a ragged last block (= Dirichlet zeros)."""
    y0 = yi * YB
    # jnp.where, not mask-multiply: out-of-bounds block reads may contain
    # NaN (pallas interpret mode pads with NaN) and 0*NaN = NaN.
    up = jnp.where(y0 > 0, up_slab[..., -1:, :], 0.0)
    dn = jnp.where(y0 + YB <= ny - 1, dn_slab[..., 0:1, :], 0.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (YB, 1), 0)
    mask = (y0 + rows < ny).reshape((1,) * (mid.ndim - 2) + (YB, 1))
    mid = jnp.where(mask, mid, 0.0)
    return jnp.concatenate([up, mid, dn], axis=-2)


def _hcol(h_ref, dim):
    """(TT, 1, 128) h block -> (TT, 1, …, 1) broadcastable column. The h
    array carries a dummy middle axis so that single-time-row blocks keep
    their last two dims at full extent (a Mosaic tiling requirement)."""
    h = h_ref[:, 0, 0:1]
    return h.reshape((h.shape[0],) + (1,) * dim)


def _live_factor(dim: int) -> int:
    """Working-set multiplier (blocks of the out size concurrently live):
    3D kernels hold far more stencil temporaries (15 taps, z and x both
    padded in-kernel) — a 2D-calibrated factor 8 OOM'd the chip's 128 MB
    VMEM on 65³×32 (measured 171 MB requested)."""
    return 8 if dim == 2 else 24


def _pick_blocks(T, gs, itemsize, extra: int = 0):
    """Returns (TB, YB); YB == gs[-2] means unblocked spatial axes.

    Measured (v5 axon, 2D): throughput rises monotonically with TB when the
    grid is unblocked (fewer, larger grid steps; at grid=(1,1) the whole
    problem stays VMEM-resident), so take the largest divisor of T that
    fits. When y-blocking is forced, (TB=16, YB=64) was the flat optimum —
    the kernel is DMA-bound there and block shape barely matters.

    ``extra``: additional live blocks beyond the plain-kernel working set
    (the stab-fused variants carry one more stencil temporary and one more
    output block). Halving TB doubles the grid-program count and with it
    the Mosaic compile time (see BASELINE.md caveats), so the unblocked
    branch relaxes the budget instead of shrinking TB.
    """
    ny, nx = gs[-2], gs[-1]
    rest = int(np.prod(gs[:-2], dtype=int)) if len(gs) > 2 else 1
    base_lf = _live_factor(len(gs))
    lf = base_lf + extra
    # Unblocked branch: relax the budget proportionally so the stab variants
    # keep the plain TB (same grid-program count, ~25% larger live set —
    # well under the 110 MB scoped limit at every unblocked shape).
    budget = _VMEM_BUDGET * lf // base_lf
    per_row = rest * nx * itemsize  # one y-row across the other axes
    TB = 1
    for cand in (64, 32, 16, 8, 4, 2):
        if T % cand == 0 and cand * (ny + 2) * per_row * lf <= budget:
            TB = cand
            break
    # An unblocked TB=1 "fit" is never trusted: the live-set model is a
    # per-block estimate and Mosaic's actual TB=1 Bᵀ live set blows it up
    # ~4× right at the budget edge — at 1023²×128 f32 the estimate fits the
    # 32 MB budget by 32 bytes (and the stab estimate fits its 40 MB budget
    # by 40) while the real kernel requests 123.8 MB of scoped VMEM and
    # fails to compile. Fall through to y-blocking instead; genuinely tiny
    # problems (T == 1) keep the unblocked form.
    if (TB >= 2 or T == 1) and TB * (ny + 2) * per_row * lf <= budget:
        return TB, ny
    if len(gs) == 3:
        # Blocked 3D: the live-set model is useless at this dim (Mosaic's
        # actual scoped-VMEM requests exceed the estimate ~4×), so the block
        # is the hardware-measured point, not a formula. Probe at 127³×32
        # f32 (scripts/probe_kron3d.py, results_tpu/probe_kron3d.jsonl):
        # (TB=4, YB=16) is the ONLY compiling candidate — exact vs the XLA
        # pair, 3.13 ms/apply = 3.0× the XLA pair — while (8,8), (8,16),
        # (4,32), (2,48), (2,64) and the stab-fused (4,16) all fail Mosaic
        # compile (scoped-VMEM over the limit via tpu_compile_helper).
        TB = 4 if T % 4 == 0 else (2 if T % 2 == 0 else 1)
        YB = 16 if ny > 16 else _HALO
        return TB, min(YB, ny)
    TB = 1
    for cand in (8, 4, 2):
        if T % cand == 0:
            TB = cand
            break
    # Blocked mode carries a larger live set (halo slabs, the assembled
    # Vext/VM/VA temporaries): budget half in this branch, and prefer TB=8
    # over 16 — measured at 1023²×128 f32: (TB=16, YB=32) requests 107.8 MB
    # of scoped VMEM and fails to compile, while (8, 64) compiles and runs
    # at 43.1 GDoF/s = 4.4× the XLA stencil pair at that shape ((4, 128)
    # 42.4, (4, 64) 41.4, (2, 128) 38.1 — DMA-bound, shape barely matters).
    YB = max(_HALO, (_VMEM_BUDGET // (2 * TB * per_row * lf)) // _HALO * _HALO)
    return TB, min(YB, ny)


def _u_specs(TB, YB, gs, time_idx, blocked, halo=True):
    """U-operand BlockSpecs: {aligned TB, single next/prev row} ×
    ({aligned YB, up slab, dn slab} if blocked else {full}). ``time_idx``:
    (aligned_map, single_map) on the time grid index. ``halo=False`` drops
    the up/dn slabs (pointwise operands need no spatial neighborhood)."""
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    zeros = (0,) * len(rest)
    al, sg = time_idx
    nyb8 = pl.cdiv(ny, _HALO)

    def spec(tb, yb, tmap, ymap):
        shape = (tb,) + rest + (yb, nx)
        return pl.BlockSpec(
            shape,
            lambda ti, yi, tmap=tmap, ymap=ymap: (tmap(ti),) + zeros + (ymap(yi), 0),
            memory_space=pltpu.VMEM,
        )

    if not blocked:
        full = lambda yi: 0
        return [spec(TB, ny, al, full), spec(1, ny, sg, full)]
    s = YB // _HALO  # y-slab stride of the aligned block, in 8-row units
    y_mid = lambda yi: yi
    if not halo:
        return [spec(TB, YB, al, y_mid), spec(1, YB, sg, y_mid)]
    y_up = lambda yi: jnp.maximum(yi * s - 1, 0)
    y_dn = lambda yi: jnp.minimum(yi * s + s, nyb8 - 1)
    return [
        spec(TB, YB, al, y_mid),
        spec(TB, _HALO, al, y_up),
        spec(TB, _HALO, al, y_dn),
        spec(1, YB, sg, y_mid),
        spec(1, _HALO, sg, y_up),
        spec(1, _HALO, sg, y_dn),
    ]


def _gather_window(urefs, yi, YB, ny, blocked):
    """Read one time-window's refs into a (TT, …, YB(+2), nx) array."""
    if not blocked:
        return urefs[0][...]
    mid, up, dn = urefs
    return _assemble_y(up[...], mid[...], dn[...], yi, YB, ny)


def _i32_map(map_fn):
    """Wrap an index map so literal components derive from the (i32) program
    index — see _i32_specs for the Mosaic legalization failure this avoids.
    Shared by the kron, multigrid, and blocked-ELL kernels."""

    def fixed(*ids):
        z = ids[0] * 0
        return tuple(z + v if isinstance(v, int) else v for v in map_fn(*ids))

    return fixed


def _i32_specs(specs):
    """Multi-output pallas_call + x64 workaround (measured on the axon
    backend): index maps whose non-leading components are Python literals
    lower those components as i64 constants under jax_enable_x64, and
    Mosaic then fails to legalize the map's func.return for multi-output
    calls ("failed to legalize operation 'func.return'", types
    (i32, i64, i64)). Deriving every literal from the (i32) program index
    keeps the whole return i32. No-op for traced components."""

    return [
        pl.BlockSpec(
            s.block_shape, _i32_map(s.index_map), memory_space=pltpu.VMEM
        )
        for s in specs
    ]


def _cost(T, gs, itemsize, n_stencil_rows, taps):
    vol = int(np.prod(gs, dtype=int))
    return pl.CostEstimate(
        flops=2 * taps * n_stencil_rows * vol,
        bytes_accessed=itemsize * vol * (n_stencil_rows + T) * 2,
        transcendentals=0,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "groups_M", "groups_A", "gs", "TB", "YB", "scale", "stab", "interpret"
    ),
)
def _apply_B_call(
    U, h128, hs128=None, *, groups_M, groups_A, gs, TB, YB, scale=1.0,
    stab=False, interpret=False
):
    """U (T+1, *gs), h128 (T, 128) -> (T, *gs):
    out[j] = M·(U[j+1]-U[j]) + h_j·A·(U[j+1]+U[j]).

    ``stab=True`` additionally emits the stabilization half-product
    W[j] = hs_j·A·(U[j+1]-U[j]) (hs = h/16) as a second output, reusing the
    time windows already in VMEM — one extra in-register stencil instead of
    a separate full pass over U (solver.apply_stab)."""
    T = U.shape[0] - 1
    dim = len(gs)
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    zeros = (0,) * len(rest)
    blocked = YB < ny
    yb = YB if blocked else None
    nyi = pl.cdiv(ny, YB)
    n_u = 3 if blocked else 1
    n_h = 2 if stab else 1

    def kernel(*refs):
        h_ref = refs[0]
        urefs = refs[n_h : n_h + 2 * n_u]
        yi = pl.program_id(1)
        U0 = _gather_window(urefs[:n_u], yi, YB, ny, blocked)
        U1r = _gather_window(urefs[n_u:], yi, YB, ny, blocked)
        # TB == 1: U0[1:] is zero-size, which Mosaic rejects as a vector type.
        U1 = U1r if TB == 1 else jnp.concatenate([U0[1:], U1r], axis=0)
        h = _hcol(h_ref, dim)
        DU = U1 - U0
        out = _stencil(DU, groups_M, gs, yb) + h * _stencil(
            U1 + U0, groups_A, gs, yb
        )
        if stab:
            out_ref, w_ref = refs[-2], refs[-1]
            hs = _hcol(refs[1], dim)
            w_ref[...] = hs * _stencil(DU, groups_A, gs, yb)
        else:
            out_ref = refs[-1]
        out_ref[...] = out if scale == 1.0 else scale * out

    time_idx = (lambda ti: ti, lambda ti: ti * TB + TB)  # row T is valid in U
    specs = _u_specs(TB, YB, gs, time_idx, blocked)
    h_spec = pl.BlockSpec(
        (TB, 1, 128), lambda ti, yi: (ti, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [h_spec] * n_h + specs
    out_spec = pl.BlockSpec(
        (TB,) + rest + (YB, nx),
        lambda ti, yi: (ti,) + zeros + (yi, 0),
        memory_space=pltpu.VMEM,
    )
    kwargs = {}
    if not interpret:
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            cost_estimate=_cost(
                T, gs, U.dtype.itemsize, T + 1 + (T if stab else 0),
                len(groups_M) + (2 if stab else 1) * len(groups_A),
            ),
        )
    n_ops = len(specs) // 2
    hs_args = (hs128,) if stab else ()
    out_shape = jax.ShapeDtypeStruct((T,) + gs, U.dtype)
    in_specs = _i32_specs(in_specs)
    out_specs = _i32_specs([out_spec] * (2 if stab else 1))
    return pl.pallas_call(
        kernel,
        grid=(T // TB, nyi),
        in_specs=in_specs,
        out_specs=out_specs if stab else out_specs[0],
        out_shape=[out_shape, out_shape] if stab else out_shape,
        interpret=interpret,
        **kwargs,
    )(h128, *hs_args, *([U] * n_ops), *([U] * n_ops))


@functools.partial(
    jax.jit,
    static_argnames=(
        "groups_M", "groups_A", "gs", "TB", "YB", "scale", "stab", "interpret"
    ),
)
def _apply_BT_call(
    V, h128, W=None, *, groups_M, groups_A, gs, TB, YB, scale=1.0,
    stab=False, interpret=False
):
    """V (T, *gs), h128 (T, 128) -> (T+1, *gs):
    out[i] = [i<T]·(-M·V[i] + h_i·A·V[i]) + [i≥1]·(M·V[i-1] + h_{i-1}·A·V[i-1]).

    ``stab=True`` takes the stabilization half-product W (T, *gs) from the
    stab-fused B application and folds the jump combine
    out[i] += W[i-1] − W[i] (W[-1] = W[T] = 0) into the same pass — W is
    pointwise in space, so its operands carry no y-halos."""
    T = V.shape[0]
    dim = len(gs)
    ny, nx = gs[-2], gs[-1]
    rest = tuple(gs[:-2])
    zeros = (0,) * len(rest)
    blocked = YB < ny
    yb = YB if blocked else None
    nti = T // TB
    nyi = pl.cdiv(ny, YB)
    n_u = 3 if blocked else 1

    def kernel(h_ref, hp_ref, *refs):
        out_ref = refs[-1]
        ti = pl.program_id(0)
        yi = pl.program_id(1)
        V0 = _gather_window(refs[:n_u], yi, YB, ny, blocked)

        @pl.when(ti < nti)
        def _():
            Vp = _gather_window(refs[n_u : 2 * n_u], yi, YB, ny, blocked)
            Vp = jnp.where(ti > 0, Vp, 0.0)  # row -1 of V is zero
            Vext = jnp.concatenate([Vp, V0], axis=0)  # rows i0-1 … i0+TB-1
            hext = jnp.concatenate(
                [jnp.where(ti > 0, _hcol(hp_ref, dim), 0.0), _hcol(h_ref, dim)],
                axis=0,
            )
            VM = _stencil(Vext, groups_M, gs, yb)
            VA = hext * _stencil(Vext, groups_A, gs, yb)
            out = (-VM[1:] + VA[1:]) + (VM[:-1] + VA[:-1])
            if stab:
                Wp = jnp.where(ti > 0, refs[2 * n_u + 1][...], 0.0)
                Wext = jnp.concatenate([Wp, refs[2 * n_u][...]], axis=0)
                out = out + (Wext[:-1] - Wext[1:])
            out_ref[...] = out if scale == 1.0 else scale * out

        @pl.when(ti == nti)
        def _():
            # Final block: only out row T is in-array (ragged write is
            # masked); it reads the clamped last V block's final row.
            last = V0[-1:]
            VM = _stencil(last, groups_M, gs, yb)
            VA = _hcol(h_ref, dim)[-1:] * _stencil(last, groups_A, gs, yb)
            out = VM + VA
            if stab:
                out = out + refs[2 * n_u][-1:]  # + W[T-1]
            out_ref[0:1] = out if scale == 1.0 else scale * out

    t_al = lambda ti: jnp.minimum(ti, nti - 1)
    t_pm = lambda ti: jnp.maximum(ti * TB - 1, 0)
    specs = _u_specs(TB, YB, gs, (t_al, t_pm), blocked)
    w_specs = _u_specs(TB, YB, gs, (t_al, t_pm), blocked, halo=False)
    in_specs = [
        pl.BlockSpec(
            (TB, 1, 128), lambda ti, yi: (t_al(ti), 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 1, 128), lambda ti, yi: (t_pm(ti), 0, 0), memory_space=pltpu.VMEM
        ),
    ] + specs + (w_specs if stab else [])
    out_spec = pl.BlockSpec(
        (TB,) + rest + (YB, nx),
        lambda ti, yi: (ti,) + zeros + (yi, 0),
        memory_space=pltpu.VMEM,
    )
    kwargs = {}
    if not interpret:
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            cost_estimate=_cost(
                T, gs, V.dtype.itemsize, T + 1 + (T if stab else 0),
                len(groups_M) + len(groups_A),
            ),
        )
    n_ops = len(specs) // 2
    w_args = (W, W) if stab else ()
    return pl.pallas_call(
        kernel,
        grid=(nti + 1, nyi),
        in_specs=_i32_specs(in_specs),
        out_specs=_i32_specs([out_spec])[0],
        out_shape=jax.ShapeDtypeStruct((T + 1,) + gs, V.dtype),
        interpret=interpret,
        **kwargs,
    )(h128, h128, *([V] * n_ops), *([V] * n_ops), *w_args)


class KronPallas:
    """Fused B / Bᵀ applications for one (M, A, time-grid) configuration.

    ``h128`` (the per-interval h/2 column broadcast to 128 lanes) lives in
    ``params`` so callers can thread it through jit (closed-over device
    constants are pathological on this backend; see ops/stencil.py).
    """

    def __init__(self, M_st, A_st, h: np.ndarray, dtype, interpret=False,
                 blocks: tuple[int, int] | None = None):
        """``h``: raw time-interval lengths (T,); the kernels consume h/2.
        ``blocks``: explicit (TB, YB) override of the measured block chooser
        (benchmarking/experiments only — YB must be a multiple of 8 when
        blocked; no VMEM feasibility check is applied)."""
        if M_st.grid_shape != A_st.grid_shape:
            raise ValueError("M/A grid mismatch")
        self.gs = tuple(M_st.grid_shape)
        self.groups_M = _weight_groups(M_st.disps, M_st.weights)
        self.groups_A = _weight_groups(A_st.disps, A_st.weights)
        self.T = int(h.shape[0])
        self.interpret = interpret
        itemsize = jnp.dtype(dtype).itemsize
        if blocks is not None:
            self.TB, self.YB = blocks
            if self.T % self.TB:
                raise ValueError(
                    f"blocks: TB={self.TB} must divide T={self.T} (the "
                    "kernel grid is T // TB; a remainder is silently lost)"
                )
            if self.YB < self.gs[-2] and self.YB % _HALO:
                raise ValueError(
                    f"blocks: blocked YB={self.YB} must be a multiple of "
                    f"{_HALO} (Mosaic sublane tile)"
                )
        else:
            self.TB, self.YB = _pick_blocks(self.T, self.gs, itemsize)
        # Stab-fused variants hold ~2 extra live blocks (AD temporary + W),
        # so they get their own, possibly smaller, blocking.
        self.TBs, self.YBs = _pick_blocks(self.T, self.gs, itemsize, extra=2)
        # Blocked-y stab kernels: 2D in (measured at 1023²×128 f32 with the
        # capped TB=8 chooser: (8,64)/(8,32)/(4,64) all compile, exact vs
        # the XLA forms, and the fused pair at 8.7 ms/iter beats plain pair
        # + separate XLA stab pass at 16.2 ms — the stab pass alone costs
        # ~7.5 ms at that shape). Blocked 3D stays OUT — twice measured:
        # the round-1 (4,16) chooser pick fails Mosaic compile, and the
        # round-2 probe cleared (2,16)/(4,8)/(2,8) for compile+run
        # (results_tpu/r2_probe_stab3d.jsonl) but the full-solve A/B at
        # the 3D flagship came back SLOWER with the (2,16) stab-fused
        # pair than plain (4,16) + the separate XLA stab pass (4.22 vs
        # 3.89 s steady, results_tpu/r2_stab3d_flagship.log): the stab
        # variants' extra W traffic cancels the saved pass and the
        # smaller blocks cost kernel efficiency. The plain blocked-3D
        # pair + XLA stab remains the measured best.
        self.stab_ok = self.YBs >= self.gs[-2] or len(self.gs) == 2
        self.params = self.params_for_h(h, dtype)

    @staticmethod
    def params_for_h(h, dtype):
        """The kernels' per-interval coefficient columns for a given h
        vector — h/2 for the B/Bᵀ pairing, h/16 for the fused stab term —
        broadcast to (len(h), 1, 128) (see _hcol for the layout). The ONE
        place this layout and the constants are defined: the explicit
        shard_map path builds its globally-sharded copy through here too."""
        h = np.asarray(h)
        bc = lambda v: jnp.broadcast_to(
            jnp.asarray(v, dtype)[:, None, None], (h.shape[0], 1, 128)
        ).copy()
        return {"h128": bc(0.5 * h), "hs128": bc(h / 16.0)}

    @classmethod
    def supported(cls, grid_shape, T, dtype) -> bool:
        if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
            return False
        if grid_shape is None or len(grid_shape) not in (2, 3):
            return False
        if T < 1 or min(grid_shape) < 3:
            return False
        # Unblocked shapes at the VMEM edge are out: at 1023²×128 an
        # unblocked TB=1 estimate fits the 32 MB budget by 32 bytes but
        # Mosaic's actual Bᵀ live set is 123.8 MB — over the 110 MB
        # scoped-VMEM limit (and a TB=1 grid is pathological to compile).
        # Require TB ≥ 2. Blocked-y 2D kernels are in: measured at
        # 1023²×128 f32, (TB=8, YB=64) compiles and runs 3.11 ms/apply vs
        # the XLA pair's 13.59 ms (4.4×).
        TB, YB = _pick_blocks(T, tuple(grid_shape), jnp.dtype(dtype).itemsize)
        if YB >= grid_shape[-2]:
            return TB >= 2
        if len(grid_shape) == 2:
            return TB >= 2
        # Blocked 3D: only the hardware-measured configuration is trusted —
        # (TB=4, YB=16) at f32 with rows no wider than the probed 127³ grid
        # (scripts/probe_kron3d.py: exact vs XLA, 3.0× faster; every larger
        # block fails Mosaic compile). Other dtypes / wider rows are
        # unmeasured at blocking-forcing sizes → XLA fallback.
        row_bytes = (
            int(np.prod(grid_shape[:-2], dtype=int))
            * grid_shape[-1]
            * jnp.dtype(dtype).itemsize
        )
        return (
            (TB, YB) == (4, 16)
            and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
            and row_bytes <= 127 * 127 * 4
        )

    def apply_B(self, U, p=None, scale: float = 1.0):
        """``scale``: static output scaling fused into the kernel (free);
        benchmark chains use it to stay contractive without an extra pass."""
        p = self.params if p is None else p
        return _apply_B_call(
            U, p["h128"], groups_M=self.groups_M, groups_A=self.groups_A,
            gs=self.gs, TB=self.TB, YB=self.YB, scale=scale,
            interpret=self.interpret,
        )

    def apply_BT(self, V, p=None, scale: float = 1.0):
        p = self.params if p is None else p
        return _apply_BT_call(
            V, p["h128"], groups_M=self.groups_M, groups_A=self.groups_A,
            gs=self.gs, TB=self.TB, YB=self.YB, scale=scale,
            interpret=self.interpret,
        )

    def apply_B_stab(self, U, p=None):
        """(B·U, W) with W[j] = (h_j/16)·A·(U[j+1]−U[j]) — the extra pass of
        solver.apply_stab folded into the B kernel."""
        p = self.params if p is None else p
        return _apply_B_call(
            U, p["h128"], p["hs128"], groups_M=self.groups_M,
            groups_A=self.groups_A, gs=self.gs, TB=self.TBs, YB=self.YBs,
            stab=True, interpret=self.interpret,
        )

    def apply_BT_stab(self, V, W, p=None):
        """Bᵀ·V plus the stabilization jump combine of W (see apply_B_stab):
        out[i] += W[i-1] − W[i], completing Bᵀ K_Y B + stab in two kernels."""
        p = self.params if p is None else p
        return _apply_BT_call(
            V, p["h128"], W, groups_M=self.groups_M, groups_A=self.groups_A,
            gs=self.gs, TB=self.TBs, YB=self.YBs, stab=True,
            interpret=self.interpret,
        )
