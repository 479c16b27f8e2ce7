"""Blocked-ELL Pallas SpMM for the AMG coarse levels (MXU gather removal).

Round-4 profiling (results_tpu/r4_profile_amg1m.jsonl) pinned the AMG
V-cycle at the 1.05M-spatial-dof L-shape to ~75-85% XLA ``take`` gathers on
the aggregated coarse levels: the smoother/residual ``_op`` unrolls K=15-33
full-width lane gathers per apply (ops/multigrid.SAMultiShiftMultigrid._op)
and the transfers another Kp/Kr-wide pass each (``_gather_apply``) — ~65 ms
of every ~84 ms cycle, while the banded fine level runs fused DIA-Pallas
kernels in ~12 ms. Arbitrary gathers are the slowest thing this hardware
does; dense MXU matmuls are the fastest. This module re-lays the coarse
operators out so the whole coarse stage is matmuls:

- aggregate numbering inherits the fine lex banding (measured round 4:
  L1 ndiag 1187 / bw 790 at natural order), so each 128-row block of the
  union A/M pattern touches only ~8-12 distinct 128-column blocks;
- the operator pair is stored blocked-ELL (ops/blocked_ell.BlockedEll
  layout) with ONE shared block-column index array for A and M — the
  per-slot input stripe is DMA'd once and feeds two MXU matmuls;
- transfers P / R = Pᵀ are the same layout (rectangular), applied by the
  existing single-matrix kernel (ops/spmv_pallas._spmm_call).

Measured structure at the production shape (L-shape n=1184, m=1049025,
/tmp then results_tpu/r5_ell_struct.log): L1 m=175231 K=15 → nslots=12 at
(128, 128) blocks, 1.08 GB/matrix f32 — ~3 ms/apply at HBM bandwidth vs
~16 ms for the gather form; L2 m=19941 nslots=9. The density cost (block
storage ≈ 6-8x the raw nnz) is the price of replacing gathers with
streaming reads + MXU work, exactly the blocked-ELL north-star trade
(SURVEY.md §2 "Spatial inner solver" / blocked-ELL SpMV).

Engagement is per-level from solver/heateq.py (same pallas_dia flag family
and interpret-on-CPU discipline as ops/dia_pallas.py); f32/bf16 only.

Measured on hardware (round 5): per-level stage probes at the 1.05M-dof
hierarchy (results_tpu/r5_probe_ell_1m.jsonl, br=bc=128) — L1 full
V-cycle stage 35.25 → 15.35 ms (2.30x), L2 5.37 → 1.32 ms (4.07x),
parity ~2e-7; full-solve same-process A/B (r5_amg_1m_ell_ab.log):
16.11 → 13.05 s @ 22 IDENTICAL iterations (−19%), closing the AMG-vs-
nested same-mesh ratio from 1.42x to 1.15x.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Literal index-map components must derive from the i32 program index
# (Mosaic i64 legalization failure under jax_enable_x64) — shared helper.
from .kron_pallas import _i32_map as _fix
from .spmv_pallas import _spmm_call


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def ell_to_blocked(eidx, vals, br: int, bc: int, ncols: int, valid=None,
                   out_dtype=None):
    """Re-lay fixed-width ELL gather rows as blocked-ELL with one shared
    block-column index array across all value arrays.

    ``eidx``: (m, K) column ids; ``vals``: list of (m, K) value arrays on
    the same pattern (the A/M union, or a single transfer matrix);
    ``ncols``: logical column count (rectangular transfers). ``valid``:
    optional (m, K) bool mask of live entries — defaults to any-nonzero
    across ``vals`` (ELL pad slots carry zero values and may alias column
    0; they must not force block column 0 into the slot set).

    Returns (colidx (nrb, nslots) int32, [blocks (nrb, nslots, br, bc)]).
    Pure vectorized re-layout (no scipy BSR detour: tobsr at the L1 shape
    materializes ~6.7 GB of dense f64 blocks on the 120 MB/s host).
    """
    eidx = np.asarray(eidx)
    m, K = eidx.shape
    if valid is None:
        valid = np.zeros((m, K), bool)
        for v in vals:
            valid |= np.asarray(v) != 0
    nrb = -(-m // br)
    ncb = max(1, -(-ncols // bc))
    rows, ks = np.nonzero(valid)
    cols = eidx[rows, ks]
    rb = rows // br
    bcol = cols // bc
    keys = rb.astype(np.int64) * ncb + bcol
    uk = np.unique(keys)
    urb = uk // ncb
    counts = np.bincount(urb, minlength=nrb)
    nslots = max(1, int(counts.max()))
    base = np.zeros(nrb + 1, np.int64)
    base[1:] = np.cumsum(counts)
    colidx = np.zeros((nrb, nslots), np.int32)
    colidx[urb, np.arange(uk.size) - base[urb]] = (uk % ncb).astype(np.int32)
    ent_u = np.searchsorted(uk, keys)
    slot = ent_u - base[rb]
    out = []
    for v in vals:
        v = np.asarray(v)
        blocks = np.zeros(
            (nrb, nslots, br, bc), v.dtype if out_dtype is None else out_dtype
        )
        # ELL rows have unique column ids (CSR provenance): plain scatter.
        blocks[rb, slot, rows % br, cols % bc] = v[rows, ks]
        out.append(blocks)
    return colidx, out


def _make_pair_kernel(nslots: int):
    def kernel(colidx_ref, *refs):
        x_refs = refs[:nslots]
        blkA_ref = refs[nslots]
        blkM_ref = refs[nslots + 1]
        outA_ref = refs[nslots + 2]
        outM_ref = refs[nslots + 3]
        dot = lambda x, b: jax.lax.dot_general(
            x, b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=outA_ref.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        accA = dot(x_refs[0][...], blkA_ref[0, 0])
        accM = dot(x_refs[0][...], blkM_ref[0, 0])
        for s in range(1, nslots):
            xs = x_refs[s][...]
            accA += dot(xs, blkA_ref[0, s])
            accM += dot(xs, blkM_ref[0, s])
        outA_ref[...] = accA
        outM_ref[...] = accM

    return kernel


@functools.partial(
    jax.jit, static_argnames=("nrb", "nslots", "br", "bc", "interpret")
)
def _spmm_pair_call(
    colidx, blkA, blkM, Xp, *, nrb, nslots, br, bc, interpret=False
):
    """(yA, yM) = (A·x, M·x) batched over rows of Xp (T, ncb·bc), with A
    and M sharing one blocked-ELL column structure: each slot's input
    stripe is DMA'd once and feeds both accumulations."""
    T = Xp.shape[0]

    def x_spec(s):
        return pl.BlockSpec(
            (T, bc), _fix(lambda rb, cidx, s=s: (0, cidx[rb, s]))
        )

    blk_spec = pl.BlockSpec(
        (1, nslots, br, bc), _fix(lambda rb, cidx: (rb, 0, 0, 0))
    )
    out_spec = pl.BlockSpec((T, br), _fix(lambda rb, cidx: (0, rb)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb,),
        in_specs=[x_spec(s) for s in range(nslots)] + [blk_spec, blk_spec],
        out_specs=[out_spec, out_spec],
    )
    itemsize = Xp.dtype.itemsize
    kwargs = {}
    if not interpret:
        # Cost estimate + explicit VMEM budget: same necessity as
        # ops/spmv_pallas._spmm_call (without them the stripe/block DMAs
        # never pipeline; measured ~200x there).
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * nrb * nslots * T * br * bc,
                bytes_accessed=nrb
                * itemsize
                * (nslots * T * bc + 2 * nslots * br * bc + 2 * T * br),
                transcendentals=0,
            ),
        )
    out_shape = jax.ShapeDtypeStruct((T, nrb * br), Xp.dtype)
    return pl.pallas_call(
        _make_pair_kernel(nslots),
        grid_spec=grid_spec,
        out_shape=[out_shape, out_shape],
        interpret=interpret,
        **kwargs,
    )(colidx, *([Xp] * nslots), blkA, blkM)


class EllPallasLevel:
    """Pallas blocked-ELL SpMM kernels for one aggregated (ELL-format)
    flat-dof multigrid level: the operator pair apply plus both transfer
    applies. The Chebyshev smoother arithmetic itself stays in XLA
    (ops/multigrid `_smooth` — elementwise, fused by XLA around the
    matmuls); only the gather passes move onto the MXU, which is where
    the measured time was.

    Protocol: carried in the same per-level ``pallas`` list as
    ops.dia_pallas.DiaPallasLevel; the V-cycle dispatches on
    ``kind == 'ell'`` and threads ``self`` into ``_op`` / transfers.
    Device arrays ride the params pytree under ``lp['ellv']`` (closed-over
    device constants are a measured 40x regression on this backend).
    """

    kind = "ell"
    fused_ok = False
    semi_ok = False
    flat_dia = False

    def __init__(self, lev, T: int, dtype, interpret: bool = False,
                 br: int = 128, bc: int = 128):
        if getattr(lev, "fmt", None) != "ell":
            raise ValueError("EllPallasLevel needs ELL level storage")
        self.m = int(lev.eidx.shape[0])
        self.mc = int(lev.Ridx.shape[0])
        self.br, self.bc = br, bc
        self.interpret = interpret
        self.dtype = jnp.dtype(dtype)
        # Host blocks stored directly at the kernel dtype (the f64 blocked
        # copies of the 1.05M L-shape L1 pair alone would be ~4.3 GB on the
        # 120 MB/s host; the cast to f32 here is the same one values()
        # would apply later).
        try:
            nd = np.dtype(self.dtype.name)
        except TypeError:  # bf16 has no numpy dtype; cast lands in values()
            nd = np.dtype(np.float32)
        valid = (np.asarray(lev.ewA) != 0) | (np.asarray(lev.ewM) != 0)
        self._colop, (self._bA, self._bM) = ell_to_blocked(
            lev.eidx, [lev.ewA, lev.ewM], br, bc, self.m, valid,
            out_dtype=nd,
        )
        self._colP, (self._bP,) = ell_to_blocked(
            lev.Pidx, [lev.Pw], br, bc, self.mc, out_dtype=nd
        )
        self._colR, (self._bR,) = ell_to_blocked(
            lev.Ridx, [lev.Rw], br, bc, self.m, out_dtype=nd
        )
        self.nslots_op = int(self._colop.shape[1])
        self.nslots_P = int(self._colP.shape[1])
        self.nslots_R = int(self._colR.shape[1])

    def values(self, lev, dtype):
        """Device params for lp['ellv'] (shared between the ms_ky and
        ms_kx subtrees — the L1 pair is ~2.1 GB at the 1.05M L-shape)."""
        cast = lambda a: jnp.asarray(a, dtype)
        return {
            "colop": jnp.asarray(self._colop),
            "bA": cast(self._bA),
            "bM": cast(self._bM),
            "colP": jnp.asarray(self._colP),
            "bP": cast(self._bP),
            "colR": jnp.asarray(self._colR),
            "bR": cast(self._bR),
        }

    # ---------------------------------------------------------- applies

    def _padded(self, x, ncols: int):
        pad = _round_up(ncols, self.bc) - ncols
        return jnp.pad(x, ((0, 0), (0, pad))) if pad else x

    def op_pair(self, x, plv):
        """(A·x, M·x) on (T, m) — one shared-stripe pair kernel."""
        yA, yM = _spmm_pair_call(
            plv["colop"], plv["bA"], plv["bM"], self._padded(x, self.m),
            nrb=self._bA.shape[0], nslots=self.nslots_op,
            br=self.br, bc=self.bc, interpret=self.interpret,
        )
        return yA[..., : self.m], yM[..., : self.m]

    def interp(self, e, plv):
        """P·e: (T, mc) -> (T, m)."""
        y = _spmm_call(
            plv["colP"], plv["bP"], self._padded(e, self.mc),
            nrb=self._bP.shape[0], nslots=self.nslots_P,
            br=self.br, bc=self.bc, interpret=self.interpret,
        )
        return y[..., : self.m]

    def restrict(self, r, plv):
        """Pᵀ·r: (T, m) -> (T, mc)."""
        y = _spmm_call(
            plv["colR"], plv["bR"], self._padded(r, self.m),
            nrb=self._bR.shape[0], nslots=self.nslots_R,
            br=self.br, bc=self.bc, interpret=self.interpret,
        )
        return y[..., : self.mc]
