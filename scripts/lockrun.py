"""Run a command under the single-TPU job lock.

    python scripts/lockrun.py [--tag NAME] [--wait SECONDS] -- cmd args...

Acquires /root/repo/.tpu.lock with THIS process's PID, starts the
command in its own process group, and forwards termination: if the lock
is stolen (bench.py sends SIGTERM to the recorded PID), the whole child
process group is killed, freeing the TPU immediately. Every queued
measurement script must launch its TPU stages through this wrapper —
round 1's null BENCH artifact was a queued job straddling the driver's
bench window (VERDICT.md weak #1).
"""

import argparse
import os
import signal
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spacetime_tpu.utils.tpulock import acquire, release  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="lockrun")
    ap.add_argument("--wait", type=float, default=6 * 3600,
                    help="seconds to wait for the lock (default 6h)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd[:1] == ["--"] else args.cmd
    if not cmd:
        ap.error("no command given")

    if not acquire(args.tag, wait_s=args.wait):
        print(f"lockrun: TPU lock not acquired within {args.wait:.0f}s",
              file=sys.stderr)
        return 75  # EX_TEMPFAIL

    proc = subprocess.Popen(cmd, start_new_session=True)

    def _forward(signum, frame):
        try:
            os.killpg(proc.pid, signal.SIGTERM)
        except ProcessLookupError:
            pass

    signal.signal(signal.SIGTERM, _forward)
    signal.signal(signal.SIGINT, _forward)
    try:
        rc = proc.wait()
    finally:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        release()
    return rc


if __name__ == "__main__":
    sys.exit(main())
