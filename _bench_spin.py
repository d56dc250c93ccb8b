"""Spin-loop helper for bench.py's hardware-ceiling baseline (must be a
module-level function for multiprocessing.Pool)."""

import time


def spin(secs: float) -> int:
    t0 = time.time()
    n = 0
    while time.time() - t0 < secs:
        n += 1
    return n
