"""Headline benchmark: Kronecker space-time matvec throughput on TPU.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "GDoF/s", "vs_baseline": N}

Metric: sustained throughput of the space-time operator application
B = A_t⊗M_x + M_t⊗A_x on the ~10^6-DoF single-chip config (BASELINE.md
cfg2: 2D unit square, 129×129 P1 mesh × 64 timesteps, f32), in giga
degrees-of-freedom per second (output rows × m per apply).

Baseline (BASELINE.md): no published reference numbers exist (empty
reference mount, see SURVEY.md §0); the driver-defined target is 50% of the
HBM roofline. Minimal traffic per apply ≈ read U ((N+1)·m·4 B) + write
(N·m·4 B) + diagonals (14·m·4 B) ⇒ ≈ 8.3 B per output DoF at N=64. With
v5e HBM ≈ 819 GB/s the roofline is ≈ 98 GDoF/s, so target = 49 GDoF/s and
vs_baseline = value / 49. Human-readable details go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from spacetime_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

from spacetime_tpu.fem import P1System, unit_square_mesh, uniform_time_grid  # noqa: E402
from spacetime_tpu.fem.timegrid import time_matrices  # noqa: E402
from spacetime_tpu.ops.sparse import DiaMatrix  # noqa: E402
from spacetime_tpu.ops.stencil import StencilOperator, row_scale  # noqa: E402

SPACE_N = 128
TIME_LEVELS = 6  # 64 timesteps
DTYPE = jnp.float32
HBM_GBPS = 819.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")

    system = P1System.from_mesh(unit_square_mesh(SPACE_N))
    grid = uniform_time_grid(TIME_LEVELS)
    m = system.m
    N = grid.num_intervals
    log(f"config: {SPACE_N+1}x{SPACE_N+1} P1 mesh (m={m}) x {N} timesteps "
        f"-> {(N+1)*m/1e6:.2f} MDoF, dtype={DTYPE.__name__}")

    gs = system.mesh.grid_shape
    M_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.M), gs)
    A_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.A), gs)
    h_half = row_scale(0.5 * time_matrices(grid)["h"], gs, DTYPE)

    # h passed as an argument: closed-over array constants trigger a
    # pathological compile on this backend (see ops/stencil.py).
    @jax.jit
    def apply_B(U, hs):
        DU = U[1:] - U[:-1]
        SU = U[1:] + U[:-1]
        return M_st.apply(DU) + hs * A_st.apply(SU)

    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((N + 1,) + gs), DTYPE)

    t0 = time.perf_counter()
    V = apply_B(U, h_half).block_until_ready()
    log(f"compile+first apply: {time.perf_counter()-t0:.2f}s; out {V.shape}")

    # Steady-state timing: chain applications to amortize dispatch.
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        V = apply_B(U, h_half)
    V.block_until_ready()
    elapsed = time.perf_counter() - t0
    gdofs = reps * N * m / elapsed / 1e9

    bytes_per_apply = 4 * ((N + 1) * m + N * m + 14 * m)
    roofline = HBM_GBPS * 1e9 * (N * m) / bytes_per_apply / 1e9
    target = 0.5 * roofline
    log(f"sustained: {gdofs:.2f} GDoF/s over {reps} reps "
        f"({elapsed*1e3/reps:.3f} ms/apply); roofline={roofline:.1f} "
        f"target(50%)={target:.1f} GDoF/s; achieved BW "
        f"~{gdofs*bytes_per_apply/(N*m):.0f} GB/s")

    print(
        json.dumps(
            {
                "metric": "kron_matvec_throughput",
                "value": round(float(gdofs), 2),
                "unit": "GDoF/s",
                "vs_baseline": round(float(gdofs / target), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
