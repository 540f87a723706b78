"""Runtime tuning seams: the page-write throttle must actually bound
concurrency, release tokens on exit (including on error), and disable
cleanly via env."""

import os
import threading
import time

from moonlink_ray.runtime import page_write_throttle


def test_throttle_bounds_concurrency(monkeypatch):
    monkeypatch.setenv("MLRAY_WRITE_TOKENS", "3")
    active = []
    peak = []
    lock = threading.Lock()

    def worker():
        with page_write_throttle():
            with lock:
                active.append(1)
                peak.append(len(active))
            time.sleep(0.05)
            with lock:
                active.pop()

    threads = [threading.Thread(target=worker) for _ in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(peak) == 12
    assert max(peak) <= 3


def test_throttle_releases_on_error(monkeypatch):
    monkeypatch.setenv("MLRAY_WRITE_TOKENS", "1")
    try:
        with page_write_throttle():
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    # token must be free again: a second acquire succeeds instantly
    t0 = time.time()
    with page_write_throttle():
        pass
    assert time.time() - t0 < 1.0


def test_throttle_disabled(monkeypatch):
    monkeypatch.setenv("MLRAY_WRITE_TOKENS", "0")
    with page_write_throttle():
        pass  # no token files touched, no error
