"""Poll the axon TPU tunnel until it answers a tiny device op.

The tunnel goes down for hours at a time (CLAUDE.md); every probe must be
its own subprocess because a hung backend init can never be interrupted
in-process. Exits 0 the moment a probe succeeds, 1 when the deadline
passes.

    python scripts/wait_tunnel.py --hours 6 --interval 300
"""

import argparse
import subprocess
import sys
import time

PROBE = (
    "import jax, jax.numpy as jnp;"
    "print(float(jnp.ones((8,8)).sum()), jax.devices())"
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hours", type=float, default=6.0)
    p.add_argument("--interval", type=float, default=300.0)
    p.add_argument("--probe-timeout", type=float, default=90.0)
    args = p.parse_args()
    deadline = time.time() + args.hours * 3600
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-c", PROBE],
                timeout=args.probe_timeout,
                capture_output=True,
                text=True,
            )
            if out.returncode == 0 and "64.0" in out.stdout:
                print(
                    f"tunnel UP after {attempt} probes: {out.stdout.strip()}",
                    flush=True,
                )
                return 0
            msg = (out.stderr or out.stdout).strip().splitlines()
            print(
                f"probe {attempt}: rc={out.returncode} "
                f"{msg[-1][:120] if msg else ''}",
                flush=True,
            )
        except subprocess.TimeoutExpired:
            print(
                f"probe {attempt}: hung >{args.probe_timeout:.0f}s "
                f"(tunnel down), {time.time() - t0:.0f}s elapsed",
                flush=True,
            )
        time.sleep(max(0.0, args.interval - (time.time() - t0)))
    print("deadline passed; tunnel still down", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
