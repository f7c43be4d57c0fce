"""Runtime knobs: persistent compilation cache, profiling hooks.

First-time XLA compiles through a remote TPU tunnel cost minutes; the
persistent cache makes every subsequent process start warm.
"""
from __future__ import annotations

import os
import time
from contextlib import contextmanager


def enable_compilation_cache(path: str = None):
    import jax
    path = path or os.environ.get(
        "NERF_SLAM_TPU_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # older jax versions
        print(f"compilation cache unavailable: {e}")
    return path


@contextmanager
def profile_trace(logdir: str = "/tmp/nerf_slam_tpu_trace"):
    """JAX profiler trace around a block (tensorboard-compatible)."""
    import jax
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"trace written to {logdir} ({time.perf_counter()-t0:.2f}s)")


# ---------------------------------------------------------------------------
# Device dispatch serialization.
#
# The remote-TPU (axon) client deadlocks when multiple host threads
# dispatch/sync concurrently (reproduced with two threads running tiny
# jits).  All pipeline stages that touch the device take this lock at
# spin granularity; on a single chip device work serializes anyway, so
# the throughput cost is limited to lost host/device overlap.
#
# On non-tunneled hardware the lock is unnecessary (PJRT clients are
# thread-safe): set NERF_SLAM_TPU_NO_LOCK=1 to replace it with a no-op
# so stages dispatch concurrently -- required for the two-device
# tracking||mapping split (--device_split) to actually overlap.
# ---------------------------------------------------------------------------
import os as _os
import threading


class _NullLock:
    """Reentrant no-op stand-in for DEVICE_LOCK."""

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def acquire(self, *a, **k):
        return True

    def release(self):
        pass


DEVICE_LOCK = (_NullLock() if _os.environ.get("NERF_SLAM_TPU_NO_LOCK")
               else threading.RLock())


def fusion_device(device_split: bool = False):
    """Device for the mapping stage: the second chip under
    --device_split (reference slam_demo.py:63-71 two-GPU placement;
    here the handoff rides ICI instead of a CPU bounce), else None
    (default device)."""
    import jax
    if not device_split:
        return None
    devs = jax.devices()
    if len(devs) < 2:
        print("device_split requested but only one device visible; "
              "falling back to shared-device scheduling")
        return None
    return devs[1]
