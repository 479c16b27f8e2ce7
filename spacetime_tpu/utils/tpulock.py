"""Single-TPU job lock.

This machine sees exactly one TPU chip through the axon tunnel; a long
builder job holding the device makes every other process's ops queue
behind it (observed round 1: a queued measurement script straddled the
driver's bench window and BENCH_r01 recorded nothing). Every TPU-using
job must hold this lock; the driver-facing benchmark (bench.py) has
priority and may *steal* it — kill the recorded holder PID (an exact
PID from the lockfile, never a pattern match) and take over.

Lockfile: ``/root/repo/.tpu.lock`` — JSON ``{"pid": int, "tag": str,
"time": float}``. A lock whose PID is dead is stale and silently
reclaimed. Use ``scripts/lockrun.py`` to run shell-launched TPU jobs
under the lock (it puts the child in its own process group so a steal
kills the whole job, not just a wrapper).
"""

from __future__ import annotations

import json
import os
import signal
import time

# Overridable for hermetic tests: running the suite while a real queued
# TPU job holds the repo lock must neither fail the tests nor let their
# cleanup delete the live lock file.
LOCK_PATH = os.environ.get("SPACETIME_TPU_LOCK") or os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", ".tpu.lock")
)


def _read() -> dict | None:
    try:
        with open(LOCK_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _alive(pid: int) -> bool:
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        pass
    # A kill(pid, 0) success includes zombies (killed but not yet reaped
    # by their parent) — a zombie holds no device and must read as dead,
    # or steal loops forever re-killing it.
    try:
        with open(f"/proc/{pid}/stat") as f:
            state = f.read().rsplit(") ", 1)[1].split()[0]
        return state != "Z"
    except (OSError, IndexError):
        return False


def holder() -> dict | None:
    """Current live holder, or None (stale locks are reported as None)."""
    info = _read()
    if info and _alive(int(info.get("pid", -1))):
        return info
    return None


def acquire(tag: str, pid: int | None = None, wait_s: float = 0.0,
            steal: bool = False, kill_grace_s: float = 45.0) -> bool:
    """Take the lock for `pid` (default: this process).

    wait_s: poll this long for a live holder to finish before giving up.
    steal: kill the live holder (SIGTERM, then SIGKILL after
    kill_grace_s) instead of waiting. Returns True on success.
    """
    pid = pid if pid is not None else os.getpid()
    deadline = time.time() + wait_s
    while True:
        try:
            fd = os.open(LOCK_PATH, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                json.dump({"pid": pid, "tag": tag, "time": time.time()}, f)
            return True
        except FileExistsError:
            pass
        info = _read()
        hpid = int(info.get("pid", -1)) if info else -1
        if info is None or not _alive(hpid):
            # stale — reclaim
            try:
                os.unlink(LOCK_PATH)
            except FileNotFoundError:
                pass
            continue
        if steal:
            try:
                os.kill(hpid, signal.SIGTERM)
            except ProcessLookupError:
                continue
            t0 = time.time()
            while _alive(hpid) and time.time() - t0 < kill_grace_s:
                time.sleep(1.0)
            if _alive(hpid):
                try:
                    os.kill(hpid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                time.sleep(2.0)
            continue
        if time.time() >= deadline:
            return False
        time.sleep(min(10.0, max(0.5, deadline - time.time())))


def release(pid: int | None = None) -> None:
    """Drop the lock if `pid` (default: this process) owns it."""
    pid = pid if pid is not None else os.getpid()
    info = _read()
    if info and int(info.get("pid", -1)) == pid:
        try:
            os.unlink(LOCK_PATH)
        except FileNotFoundError:
            pass


class tpu_lock:
    """Context manager: ``with tpu_lock("bench", steal=True): ...``."""

    def __init__(self, tag: str, wait_s: float = 0.0, steal: bool = False):
        self.tag, self.wait_s, self.steal = tag, wait_s, steal

    def __enter__(self):
        if not acquire(self.tag, wait_s=self.wait_s, steal=self.steal):
            raise TimeoutError(
                f"TPU lock held by {holder()} after {self.wait_s:.0f}s")
        return self

    def __exit__(self, *exc):
        release()
        return False
