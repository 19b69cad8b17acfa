#!/usr/bin/env python
"""Pre-fault guest memory before benchmarking (environment mitigation).

This sandbox is a Firecracker microVM restored from a snapshot with lazily
populated memory: the FIRST touch of any guest-physical page exits to the
VMM and costs ~18 µs (measured), ~45× a warm touch, and the fault path is
serialized across threads (8 parallel writers aggregate ~100 MB/s, same as
1).  Any memory-hungry multi-threaded job therefore bottlenecks on the
fault queue and *anti-scales* with parallelism until the working set has
been touched once — we measured a Spark ingest at local[16] running 2×
SLOWER than local[4], with executor threads spending 80% of their CPU in
kernel mode, entirely from this effect.

A real cluster never runs in this regime (its memory is resident after
boot), so benchmarks pre-touch pages once per VM boot: fill tmpfs with
zeros, then delete.  Freed pages return to the guest free-pool already
VMM-backed, so all later allocations (JVM heap growth, shuffle files,
page cache) are warm.

``ensure_prefaulted(gb)`` probes first-touch latency on a fresh 256 MB
mapping and fills only when cold, so repeated calls within one boot are
~instant.
"""

from __future__ import annotations

import mmap
import os
import sys
import time

PROBE_BYTES = 256 * 1024 * 1024
PAGE = 4096
# Warmth is detected by PARALLEL touch rate, not single-thread latency:
# single-thread first-touch is ~1.5 GB/s warm vs ~0.2 GB/s cold, but noisy;
# 8 parallel touchers reach >10 GB/s warm while cold collapses to ~0.15 GB/s
# (the VMM fault path serializes).
WARM_PARALLEL_MBPS = 4000.0
REPORTING_KNOB = "/sys/module/page_reporting/parameters/page_reporting_order"


def disable_free_page_reporting() -> bool:
    """Raise page_reporting_order above MAX_ORDER so no free block ever
    qualifies for reporting — freed guest pages then stay VMM-backed and
    one prefault lasts for the whole VM boot.  Without this, virtio free-
    page reporting hands every ≥4 MB freed block back to the host and the
    next touch faults to the VMM again (measured: warmth did NOT survive a
    fill-and-free cycle until this was set)."""
    try:
        with open(REPORTING_KNOB) as fh:
            cur = int(fh.read())
        for order in (11, 10):
            if cur >= order:
                return True
            try:
                with open(REPORTING_KNOB, "w") as fh:
                    fh.write(str(order))
                return True
            except OSError:
                continue
    except OSError:
        pass
    return False


def first_touch_us_per_page(n_bytes: int = PROBE_BYTES) -> float:
    buf = mmap.mmap(-1, n_bytes)
    t0 = time.perf_counter()
    for i in range(0, n_bytes, PAGE):
        buf[i] = 1
    dt = time.perf_counter() - t0
    buf.close()
    return dt / (n_bytes / PAGE) * 1e6


def parallel_touch_mbps(workers: int = 8, gb_each: float = 1.0) -> float:
    import multiprocessing as mp

    barrier = mp.Barrier(workers)
    ps = [mp.Process(target=_touch_and_hold, args=(gb_each, barrier)) for _ in range(workers)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return workers * gb_each * 1024 / (time.perf_counter() - t0)


def _touch_and_hold(gb: float, barrier) -> None:
    n = int(gb * 1024**3)
    buf = mmap.mmap(-1, n)
    for i in range(0, n, PAGE):
        buf[i] = 1
    barrier.wait()  # hold until EVERY worker finished touching
    buf.close()  # freed pages stay VMM-backed once reporting is disabled


def prefault(target_gb: float, workers: int = 4) -> float:
    """Touch ``target_gb`` of guest memory with ``workers`` parallel anon
    mappings HELD simultaneously (a freed page is recycled warm by the buddy
    allocator, so only concurrently-held allocations are guaranteed to
    reach cold pages).  4 workers measured fastest: 1 is fault-queue bound,
    ≥16 concurrent cold-faulters collapse ~10× on VMM fault-path
    contention.  Caps at available-8 GB headroom."""
    import multiprocessing as mp

    with open("/proc/meminfo") as fh:
        avail_kb = next(int(l.split()[1]) for l in fh if l.startswith("MemAvailable"))
    target_gb = min(target_gb, avail_kb / 1024 / 1024 - 8.0)
    if target_gb <= 0:
        return 0.0
    t0 = time.perf_counter()
    barrier = mp.Barrier(workers)
    per = target_gb / workers
    ps = [mp.Process(target=_touch_and_hold, args=(per, barrier)) for _ in range(workers)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return time.perf_counter() - t0


def ensure_prefaulted(target_gb: float | None = None, verbose: bool = True) -> dict:
    """Probe; fill only if the memory subsystem is cold."""
    if target_gb is None:
        target_gb = float(os.environ.get("SPARK_GRAFT_PREFAULT_GB", "100"))
    disable_free_page_reporting()
    rate = parallel_touch_mbps()
    info = {"probe_parallel_mbps": round(rate), "prefaulted_gb": 0.0, "sec": 0.0}
    if rate < WARM_PARALLEL_MBPS and target_gb > 0:
        sec = prefault(target_gb)
        info["prefaulted_gb"] = target_gb
        info["sec"] = round(sec, 1)
        info["probe_after_mbps"] = round(parallel_touch_mbps())
    if verbose:
        print(f"# prefault: {info}", file=sys.stderr)
    return info


if __name__ == "__main__":
    gb = float(sys.argv[1]) if len(sys.argv) > 1 else None
    ensure_prefaulted(gb)
