"""Runtime telemetry: device-memory/host-RAM monitor + profiler hooks.

TPU-native replacement for the reference's NVML `GpuMonitor` polling thread
(`/root/reference/test/inference.py:425-487`) and psutil RAM report
(`:841-855`). NVML concepts map as:

  peak VRAM        -> peak HBM bytes_in_use from `device.memory_stats()`
  GPU utilization  -> not exposed by libtpu through JAX; report duty cycle
                      as n/a and rely on profiler traces for utilization
  power/temp       -> host-level only; left None unless a platform agent
                      exposes them

Profiling replaces thop/nvidia-smi with `jax.profiler` traces
(SURVEY §5 tracing): `with trace(logdir): ...` then inspect in XProf.
"""

from __future__ import annotations

import contextlib
import threading
import time


class DeviceMonitor:
    """Background sampler of per-device memory stats + host RSS."""

    def __init__(self, sample_interval_seconds: float = 0.2):
        self.interval = sample_interval_seconds
        self.peak_device_bytes = 0
        self.peak_host_bytes = 0
        self.samples = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _sample_once(self):
        import jax

        total = 0
        for d in jax.local_devices():
            try:
                stats = d.memory_stats()
            except Exception:
                stats = None
            if stats:
                total += stats.get("bytes_in_use", 0)
        self.peak_device_bytes = max(self.peak_device_bytes, total)
        try:
            import psutil

            rss = psutil.Process().memory_info().rss
        except Exception:
            import resource

            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
        self.peak_host_bytes = max(self.peak_host_bytes, rss)
        self.samples += 1

    def _run(self):
        while not self._stop.is_set():
            self._sample_once()
            self._stop.wait(self.interval)

    def start(self):
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self._sample_once()

    def get_peak_hbm_gb(self) -> float:
        return self.peak_device_bytes / 1024**3

    def get_peak_ram_gb(self) -> float:
        return self.peak_host_bytes / 1024**3

    def report(self) -> dict:
        return {
            "peak_hbm_gb": round(self.get_peak_hbm_gb(), 3),
            "peak_ram_gb": round(self.get_peak_ram_gb(), 3),
            "samples": self.samples,
        }


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace scope; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_estimate(fn, *args, **kwargs) -> dict:
    """Static cost analysis of a jittable fn (the working version of the
    reference's unused `thop.profile` import, test/inference.py:14):
    returns XLA's flops/bytes-accessed estimates without executing."""
    import jax

    lowered = jax.jit(fn).lower(*args, **kwargs)
    try:
        cost = lowered.compile().cost_analysis()
    except Exception:
        cost = lowered.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
    }


class StepTimer:
    """Per-step wall-clock stats (p50/p90/max) for the frame hot loop."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {"n": 0}
        import numpy as np

        arr = np.asarray(self.times)
        return {
            "n": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "max_ms": float(arr.max() * 1e3),
        }
