"""Headline benchmark: Kronecker space-time matvec throughput on TPU.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "GDoF/s", "vs_baseline": N, ...}

Primary metric: sustained throughput of the space-time operator pair B
then Bᵀ (B = A_t⊗M_x + M_t⊗A_x) on the ~10^6-DoF single-chip config
(BASELINE.md cfg2: 129×129 P1 mesh × 64 timesteps, f32), in giga
degrees-of-freedom per second (N_t·m DoF per operator application). Both
production implementations are measured — the XLA stencil pair and the
fused Pallas kernels of ops/kron_pallas.py — and the better one is
reported, mirroring the solver's size-based dispatch.

Secondary fields (driver metric, BASELINE.json: "time-to-1e-8 residual &
PCG iters"): `solve_steady_s`, `solve_iters`, `solve_config` from a
mixed-precision tol=1e-8 solve of the same cfg2 shape (steady = second
in-process solve; the first pays one-time device program load the
compilation cache cannot remove — CLAUDE.md). If the solve leg fails or
times out, the primary line still prints without these fields.

Reliability (the round-1 failure was a null BENCH artifact):
- The single TPU is guarded by .tpu.lock (utils/tpulock.py). The
  watchdog STEALS it — kills the recorded holder PID — so no queued
  measurement job can hold the device through the driver's window.
- A ~90 s tiny-op probe subprocess runs before each heavy leg; while the
  tunnel is down we retry the cheap probe, never a 20-minute leg.
- Each leg runs in a child process under its own timeout; the parent
  prints the merged JSON line. Worst case ends well inside the driver
  window (overall deadline 50 min).

Measurement notes (this backend, measured): ``block_until_ready`` does
not actually block through the axon tunnel and a synchronous host
round-trip costs ~170 ms regardless of device work, so naive timing
loops measure dispatch rate, not execution. The kron benchmark chains k
pair applications inside one jitted fori_loop returning a scalar — the
chain stays numerically bounded via a spectral-radius normalization
fused into the kernel (static ``scale``) — and reports the median slope
between k1 and k2 chains; fixed overheads cancel exactly.

Baseline: no published reference numbers exist (empty reference mount,
SURVEY.md §0); the driver-defined target is 50% of the HBM roofline.
Minimal traffic per B application ≈ 8.3 B per output DoF at N=64; with
v5e HBM ≈ 819 GB/s the roofline is ≈ 98 GDoF/s, so target = 49 GDoF/s
and vs_baseline = value / 49. (The kernel beats the HBM roofline by
keeping the working set VMEM-resident — the roofline target is kept as
the fixed yardstick for cross-round comparability.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SPACE_N = 128
TIME_LEVELS = 6  # 64 timesteps
HBM_GBPS = 819.0
K1, K2, REPS = 512, 4096, 7

PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "print(float(jnp.ones((8,8)).sum()), jax.devices())"
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- kron leg


def run_kron(out_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacetime_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from spacetime_tpu.fem import P1System, unit_square_mesh, uniform_time_grid
    from spacetime_tpu.fem.timegrid import time_matrices
    from spacetime_tpu.ops.kron_pallas import KronPallas
    from spacetime_tpu.ops.sparse import DiaMatrix
    from spacetime_tpu.ops.stencil import StencilOperator, row_scale

    DTYPE = jnp.float32
    dev = jax.devices()[0]
    log(f"device: {dev}")

    system = P1System.from_mesh(unit_square_mesh(SPACE_N))
    grid = uniform_time_grid(TIME_LEVELS)
    m = system.m
    N = grid.num_intervals
    gs = tuple(system.mesh.grid_shape)
    log(f"config: {SPACE_N+1}x{SPACE_N+1} P1 mesh (m={m}) x {N} timesteps "
        f"-> {(N+1)*m/1e6:.2f} MDoF, dtype={DTYPE.__name__}")

    M_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.M), gs)
    A_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.A), gs)
    h = time_matrices(grid)["h"]
    kp = KronPallas(M_st, A_st, h, DTYPE)
    log(f"pallas blocks: TB={kp.TB} YB={kp.YB} (ny={gs[0]})")

    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((N + 1,) + gs), DTYPE)

    # Spectral normalization: estimate rho(BT∘B) by power iteration so the
    # k2-link chain neither overflows nor vanishes in f32.
    X = U
    rho = 1.0
    for _ in range(12):
        Y = kp.apply_BT(kp.apply_B(X))
        rho = float(jnp.max(jnp.abs(Y)))
        X = Y / rho
    scale = float(1.0 / np.sqrt(rho))
    log(f"power iteration: rho≈{rho:.3e} -> fused scale {scale:.3e}")

    def chain(k):
        @jax.jit
        def f(V, p):
            def body(i, V):
                W = kp.apply_B(V, p, scale=scale)
                return kp.apply_BT(W, p, scale=scale)

            V = jax.lax.fori_loop(0, k, body, V)
            return V[(0,) * V.ndim]

        return f

    def timed(f, args):
        t0 = time.perf_counter()
        float(f(*args))  # compile + warm
        log(f"  compile+warm: {time.perf_counter()-t0:.1f}s")
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(*args))  # scalar host read forces completion
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def slope(mk, args):
        t1 = timed(mk(K1), args)
        t2 = timed(mk(K2), args)
        return (t2 - t1) / (K2 - K1) / 2.0  # pair = 2 applications

    per_pallas = slope(chain, (U, kp.params))

    # XLA stencil pair (the solver's choice at small sizes), same chain
    # methodology; the scale multiplies fuse into the stencil fusions.
    hh = row_scale(0.5 * h, gs, DTYPE)
    z = jnp.zeros((1,) + gs, DTYPE)

    def xla_pair(V, hs):
        DU, SU = V[1:] - V[:-1], V[1:] + V[:-1]
        W = scale * (M_st.apply(DU) + hs * A_st.apply(SU))
        VM, VA = M_st.apply(W), hs * A_st.apply(W)
        return scale * (
            jnp.concatenate([-VM + VA, z]) + jnp.concatenate([z, VM + VA])
        )

    def xla_chain(k):
        @jax.jit
        def f(V, hs):
            V = jax.lax.fori_loop(0, k, lambda i, V: xla_pair(V, hs), V)
            return V[(0,) * V.ndim]

        return f

    per_xla = slope(xla_chain, (U, hh))
    log(f"pallas: {per_pallas*1e3:.4f} ms/apply; xla: {per_xla*1e3:.4f} ms/apply")
    per_apply = min(per_pallas, per_xla)
    # In-session drift bracket (BASELINE.md notes ~10% steady-time drift
    # ACROSS sessions with tunnel conditions; this quantifies the
    # within-session repeatability of the reported number — re-measure the
    # winning implementation's slope once, compiled functions cache-hit).
    win = (chain, (U, kp.params)) if per_pallas <= per_xla else (
        xla_chain, (U, hh)
    )
    per_repeat = slope(*win)
    drift_pct = abs(per_repeat - per_apply) / per_apply * 100.0
    log(f"repeat slope: {per_repeat*1e3:.4f} ms/apply "
        f"(in-session drift {drift_pct:.1f}%)")
    gdofs = N * m / per_apply / 1e9

    bytes_per_apply = 4 * ((N + 1) * m + N * m + 14 * m)
    roofline = HBM_GBPS * 1e9 * (N * m) / bytes_per_apply / 1e9
    target = 0.5 * roofline
    log(f"{per_apply*1e3:.4f} ms/apply, {gdofs:.2f} GDoF/s; "
        f"roofline={roofline:.1f}, target(50%)={target:.1f} GDoF/s; "
        f"effective BW ~{gdofs*bytes_per_apply/(N*m):.0f} GB/s")

    with open(out_path, "w") as f:
        json.dump(
            {
                "metric": "kron_matvec_throughput",
                "value": round(float(gdofs), 2),
                "unit": "GDoF/s",
                "vs_baseline": round(float(gdofs / target), 3),
                "in_session_drift_pct": round(float(drift_pct), 1),
            },
            f,
        )


# --------------------------------------------------------------- solve leg


def run_solve(out_path):
    import jax

    from spacetime_tpu.utils import enable_compile_cache

    enable_compile_cache()
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from spacetime_tpu.fem import P1System, unit_square_mesh, uniform_time_grid
    from spacetime_tpu.models import get_problem
    from spacetime_tpu.solver.heateq import HeatSolver

    problem = get_problem("smooth2d")
    solver = HeatSolver(
        problem,
        P1System.from_mesh(unit_square_mesh(SPACE_N)),
        uniform_time_grid(TIME_LEVELS),
        dtype=jnp.float32,
    )
    best = None
    for i in range(2):
        t0 = time.perf_counter()
        r = solver.solve_refined(tol=1e-8, compute_error=False)
        log(f"solve{i}: wall {time.perf_counter()-t0:.1f}s, "
            f"solve_seconds {r.solve_seconds:.3f}, iters {r.iterations}, "
            f"rel {r.residuals[-1]/r.residuals[0]:.2e}")
        best = r
    with open(out_path, "w") as f:
        json.dump(
            {
                "solve_steady_s": round(float(best.solve_seconds), 3),
                "solve_iters": int(best.iterations),
                "solve_rel_residual": float(
                    best.residuals[-1] / best.residuals[0]
                ),
                "solve_config": (
                    f"smooth2d {SPACE_N+1}x{SPACE_N+1}x"
                    f"{2**TIME_LEVELS}ts f32 mixed-precision tol=1e-8"
                ),
            },
            f,
        )


# ---------------------------------------------------------------- watchdog


def probe_tunnel(timeout_s=90.0):
    """True iff a tiny device op completes in a fresh subprocess."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE_SRC],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
        ok = out.returncode == 0 and "64.0" in out.stdout
        if not ok:
            msg = (out.stderr or out.stdout).strip().splitlines()
            log(f"probe: rc={out.returncode} {msg[-1][:120] if msg else ''}")
        return ok
    except subprocess.TimeoutExpired:
        log(f"probe: hung >{timeout_s:.0f}s (tunnel down/busy)")
        return False


def run_leg(flag, out_path, timeout_s):
    import subprocess

    try:
        os.unlink(out_path)
    except FileNotFoundError:
        pass
    try:
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag, out_path],
            timeout=timeout_s,
        ).returncode
    except subprocess.TimeoutExpired:
        log(f"{flag} leg timed out after {timeout_s:.0f}s")
        return None
    if rc != 0:
        log(f"{flag} leg failed rc={rc}")
        return None
    try:
        with open(out_path) as f:
            return json.load(f)
    except (OSError, ValueError) as e:
        log(f"{flag} leg wrote no result: {e}")
        return None


def watchdog():
    from spacetime_tpu.utils import tpulock

    t_start = time.time()
    deadline = t_start + 50 * 60  # stay well inside the driver window

    h = tpulock.holder()
    if h:
        log(f"TPU lock held by pid {h['pid']} ({h.get('tag')}); stealing "
            "(bench has priority)")
    tpulock.acquire("bench", steal=True)
    try:
        # Fast probe loop: never start a heavy leg while the tunnel is down.
        while not probe_tunnel():
            if time.time() > deadline - 10 * 60:
                log("tunnel never came up inside the bench window")
                return 1
            time.sleep(30)
        log(f"tunnel up after {time.time()-t_start:.0f}s; starting kron leg")

        kron = None
        for attempt in (1, 2):
            kron = run_leg("--run-kron", "/tmp/bench_kron.json", 480)
            if kron is not None:
                break
            if time.time() > deadline - 12 * 60 or not probe_tunnel():
                break
            log(f"kron retry {attempt+1}")
        if kron is None:
            log("bench: kron leg failed — no metric to report")
            return 1

        # Optional solve leg: merge on success, never block the primary.
        budget = deadline - time.time() - 60
        if budget > 180 and probe_tunnel():
            solve = run_leg(
                "--run-solve", "/tmp/bench_solve.json", min(600, budget)
            )
            if solve:
                kron.update(solve)
        print(json.dumps(kron), flush=True)
        return 0
    finally:
        tpulock.release()


if __name__ == "__main__":
    if "--run-kron" in sys.argv:
        run_kron(sys.argv[sys.argv.index("--run-kron") + 1])
    elif "--run-solve" in sys.argv:
        run_solve(sys.argv[sys.argv.index("--run-solve") + 1])
    else:
        sys.exit(watchdog())
