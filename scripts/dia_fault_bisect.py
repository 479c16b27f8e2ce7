"""Orchestrator for the wide-band multi-level DIA-Pallas fault bisection
(round-5 verdict task 2): runs scripts/dia_fault_case.py cases in isolated
subprocesses under ONE TPU lock hold, probing tunnel health between cases
(a worker fault takes the tunnel down briefly; retry with backoff).

    timeout 7200 python scripts/lockrun.py --tag dia_bisect -- \
        timeout 7000 python scripts/dia_fault_bisect.py

JSONL to stdout; stderr tails captured per case.
"""

import json
import subprocess
import sys
import time

CASES = [
    ("l0_only", "control: round-4-stable fine-level-only engagement"),
    ("l1_only", "is the second family faulty ALONE?"),
    ("both_one_jit", "both families in one executable (solve shape)"),
    ("both_sep_jits", "both families, separate executables"),
    ("both_nu1", "one jit, nu=1 (HS=step: halves every window)"),
    ("both_mb_small", "one jit, L1 MB=HS (minimal window)"),
]


def tunnel_ok(timeout_s=120):
    code = (
        "import sys; sys.path.insert(0, '.');"
        "import jax, jax.numpy as jnp;"
        "print(float(jnp.ones((8,8)).sum()))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    # Optional argv override: each argument is a case name (the CASES
    # table's or a custom:M:BW:MB spec) — the round-5 MB/m boundary sweep.
    cases = (
        [(c, "argv sweep") for c in sys.argv[1:]]
        if len(sys.argv) > 1 else CASES
    )
    for case, why in cases:
        # wait for tunnel health (worker restart after a fault)
        for attempt in range(8):
            if tunnel_ok():
                break
            print(json.dumps({"event": "tunnel_down", "attempt": attempt}),
                  flush=True)
            time.sleep(60)
        else:
            print(json.dumps({"event": "tunnel_dead", "abort": True}),
                  flush=True)
            return 1
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "scripts/dia_fault_case.py", case],
                timeout=1500, capture_output=True, text=True,
            )
            rec = {"case": case, "why": why, "rc": r.returncode,
                   "wall_s": round(time.time() - t0, 1)}
            if r.stdout.strip():
                try:
                    rec["result"] = json.loads(r.stdout.strip().splitlines()[-1])
                except ValueError:
                    rec["stdout_tail"] = r.stdout[-300:]
            if r.returncode != 0:
                rec["stderr_tail"] = r.stderr[-600:]
                rec["fault"] = (
                    "kernel fault" in r.stderr.lower()
                    or r.returncode < 0
                    or "dead" in r.stderr.lower()
                )
        except subprocess.TimeoutExpired as e:
            rec = {"case": case, "why": why, "rc": "TIMEOUT",
                   "wall_s": round(time.time() - t0, 1),
                   "stderr_tail": (e.stderr or b"")[-600:].decode(
                       "utf-8", "replace") if e.stderr else ""}
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
