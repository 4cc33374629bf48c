"""Benchmark timing utilities.

Replicates the reference's warmup-then-measure FPS protocol
(multi_frame_sr.cpp:149,187-206 and polar_defog.cpp:126-141,298-300) with
honest device fencing: every timed call is followed by
``jax.block_until_ready`` so queued-but-unfinished XLA work cannot inflate
throughput numbers.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional

import jax


@dataclasses.dataclass
class BenchmarkResult:
    name: str
    seconds: float            # total timed wall clock
    iters: int
    pixels_per_iter: float = 0.0
    iter_times: Optional[list] = None  # per-iteration seconds

    @property
    def sec_per_iter(self) -> float:
        return self.seconds / max(self.iters, 1)

    @property
    def p50(self) -> float:
        """Median per-iteration latency in seconds."""
        if not self.iter_times:
            return self.sec_per_iter
        times = sorted(self.iter_times)
        return times[len(times) // 2]

    @property
    def fps(self) -> float:
        return self.iters / self.seconds if self.seconds > 0 else float("inf")

    @property
    def mp_per_s(self) -> float:
        """Megapixels of output produced per second."""
        if self.seconds <= 0:
            return float("inf")
        return self.pixels_per_iter * self.iters / self.seconds / 1e6

    def as_dict(self) -> Dict[str, Any]:
        return {
            "name": self.name,
            "seconds": self.seconds,
            "iters": self.iters,
            "fps": self.fps,
            "mp_per_s": self.mp_per_s,
        }

    def __str__(self) -> str:  # mirrors the reference's "sec\nFPS" prints
        s = f"{self.name}: {self.seconds:.4f} sec, {self.fps:.2f} FPS"
        if self.pixels_per_iter:
            s += f", {self.mp_per_s:.1f} MP/s"
        return s


def measure(
    fn: Callable[[], Any],
    *,
    warmup: int = 5,
    iters: int = 20,
    name: str = "bench",
    pixels_per_iter: float = 0.0,
) -> BenchmarkResult:
    """Run ``fn`` ``warmup`` times untimed, then ``iters`` times timed.

    ``fn`` must return a jax array (or pytree of them); the result is
    blocked on before the clock stops.
    """
    for _ in range(warmup):
        out = fn()
        jax.block_until_ready(out)
    # fence EVERY iteration: blocking only on the final result is not
    # reliable on remote-execution backends (observed returning before
    # predecessors completed), and honest throughput is the point
    iter_times = []
    start = time.perf_counter()
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        iter_times.append(time.perf_counter() - t0)
    seconds = time.perf_counter() - start
    return BenchmarkResult(
        name=name, seconds=seconds, iters=iters,
        pixels_per_iter=pixels_per_iter, iter_times=iter_times,
    )


class Timer:
    """Simple start/stop timer mirroring cv::TickMeter usage in the
    reference harnesses."""

    def __init__(self) -> None:
        self._start: Optional[float] = None
        self.seconds: float = 0.0

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self) -> float:
        if self._start is not None:
            self.seconds += time.perf_counter() - self._start
            self._start = None
        return self.seconds
