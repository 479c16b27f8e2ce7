"""Pallas TPU kernel for batched blocked-ELL SpMM (see ops/blocked_ell.py).

Grid = (row-blocks,). The block-column index array is scalar-prefetched
(PrefetchScalarGridSpec) so each slot's (T, Bc) input stripe is selected by
BlockSpec index_map before the body runs; the body accumulates one MXU
matmul per slot into the resident output tile. Matmuls run at
Precision.HIGHEST — the MXU's default bf16 passes lose ~1e-3 relative
accuracy, far too coarse for a PCG residual.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blocked_ell import BlockedEll


def _make_kernel(nslots: int):
    def kernel(colidx_ref, *refs):
        x_refs = refs[:nslots]
        blk_ref = refs[nslots]
        out_ref = refs[nslots + 1]
        acc = jax.lax.dot_general(
            x_refs[0][...],
            blk_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=out_ref.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        for s in range(1, nslots):
            acc += jax.lax.dot_general(
                x_refs[s][...],
                blk_ref[0, s],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=out_ref.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
        out_ref[...] = acc

    return kernel


# Literal index-map components must derive from the i32 program index
# (Mosaic i64 legalization failure under jax_enable_x64) — one shared
# implementation in kron_pallas.
from .kron_pallas import _i32_map as _fix


@functools.partial(jax.jit, static_argnames=("nrb", "nslots", "br", "bc", "interpret"))
def _spmm_call(colidx, blocks, Xp, *, nrb, nslots, br, bc, interpret=False):
    T = Xp.shape[0]

    def x_spec(s):
        return pl.BlockSpec((T, bc), _fix(lambda rb, cidx, s=s: (0, cidx[rb, s])))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb,),
        in_specs=[x_spec(s) for s in range(nslots)]
        + [pl.BlockSpec((1, nslots, br, bc), _fix(lambda rb, cidx: (rb, 0, 0, 0)))],
        out_specs=pl.BlockSpec((T, br), _fix(lambda rb, cidx: (0, rb))),
    )
    itemsize = Xp.dtype.itemsize
    kwargs = {}
    if not interpret:
        # The cost estimate + explicit VMEM budget let Mosaic pipeline the
        # stripe DMAs; without them this kernel runs ~200x slower (measured).
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * nrb * nslots * T * br * bc,
                bytes_accessed=nrb
                * itemsize
                * (nslots * T * bc + nslots * br * bc + T * br),
                transcendentals=0,
            ),
        )
    return pl.pallas_call(
        _make_kernel(nslots),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, nrb * br), Xp.dtype),
        interpret=interpret,
        **kwargs,
    )(colidx, *([Xp] * nslots), blocks)


class EllOperator:
    """Device-side blocked-ELL operator with a Pallas SpMM apply.

    apply(U): U (T, m) -> (T, m), batched over the leading axis.
    Arrays live in ``self.params`` so callers can thread them through jit
    (this backend punishes closed-over constants; see ops/stencil.py).
    """

    def __init__(self, ell: BlockedEll, dtype=jnp.float32, interpret: bool = False):
        self.ell = ell
        self.m = ell.shape[0]
        self.mp = ell.padded_shape[1]
        self.nrb, self.nslots = ell.colidx.shape
        self.interpret = interpret
        self.params = {
            "blocks": jnp.asarray(ell.blocks, dtype),
            # int32: under x64 an int64 prefetch index would flow i64 into
            # the BlockSpec index maps, which Mosaic fails to legalize.
            "colidx": jnp.asarray(ell.colidx, jnp.int32),
        }

    def apply(self, U, p=None):
        """Convenience apply on (T, m): pads/slices around the kernel.

        The pad + slice copies dominate at scale — production callers should
        keep the (T, mp) padded layout end-to-end and use ``apply_padded``
        (kernel-only: ~0.03 ms for 1024×16k rows on v5e, ~50x faster than
        this wrapper)."""
        p = self.params if p is None else p
        T, m = U.shape
        Xp = jnp.pad(U, ((0, 0), (0, self.mp - m))) if m != self.mp else U
        Y = self.apply_padded(Xp, p)
        return Y[:, :m] if Y.shape[1] != m else Y

    def apply_padded(self, Xp, p=None):
        """Kernel-only apply on the padded layout: (T, mp) -> (T, nrb*br)\n        (equal to mp for the default square blocks; row- and\n        column-padded widths differ when br != bc)."""
        p = self.params if p is None else p
        return _spmm_call(
            p["colidx"], p["blocks"], Xp,
            nrb=self.nrb, nslots=self.nslots, br=self.ell.br, bc=self.ell.bc,
            interpret=self.interpret,
        )
