"""Benchmark harness — the reference's uniform `main()` as a library.

Every reference binary follows the same skeleton (SURVEY.md section 3.1,
`GEMM/naive_GEMM/naive_gemm.cu:76-165`): fixed-seed init -> warmup launch ->
timed launch loop (cudaEvent) -> derived GFLOPS/GB/s -> CPU-oracle verify.
This module is that skeleton, once, for all kernels: `jax.block_until_ready`
timing with warmup, FLOP/byte-derived TFLOP/s and GB/s, and roofline
fractions against the attached chip's peaks.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax

from flashattention_kernel_project_tpu.utils import platform


@dataclasses.dataclass
class BenchResult:
    name: str
    mean_ms: float
    min_ms: float
    iters: int
    flops: int | None = None
    bytes_accessed: int | None = None

    @property
    def tflops(self) -> float | None:
        if self.flops is None:
            return None
        return self.flops / (self.mean_ms * 1e-3) / 1e12

    @property
    def gbps(self) -> float | None:
        if self.bytes_accessed is None:
            return None
        return self.bytes_accessed / (self.mean_ms * 1e-3) / 1e9

    def roofline_fraction(self, dtype: str = "bf16") -> float | None:
        """min over compute/memory rooflines actually binding this kernel."""
        fracs = []
        if self.flops is not None:
            fracs.append(self.tflops * 1e12 / platform.tpu_peak_flops(dtype))
        if self.bytes_accessed is not None:
            fracs.append(self.gbps * 1e9 / platform.tpu_hbm_bandwidth())
        return max(fracs) if fracs else None

    def report(self, dtype: str = "bf16") -> str:
        parts = [f"{self.name}: {self.mean_ms:.4f} ms (min {self.min_ms:.4f})"]
        if self.flops is not None:
            parts.append(f"{self.tflops:.2f} TFLOP/s")
        if self.bytes_accessed is not None:
            parts.append(f"{self.gbps:.1f} GB/s")
        frac = self.roofline_fraction(dtype)
        if frac is not None:
            parts.append(f"{100.0 * frac:.1f}% of roofline")
        return " | ".join(parts)


def benchmark_chained(
    fn: Callable[..., Any],
    *args: Any,
    name: str = "kernel",
    chain: Callable[..., tuple] | None = None,
    n_pair: tuple[int, int] = (20, 120),
    reps: int = 6,
    flops: int | None = None,
    bytes_accessed: int | None = None,
    min_delta_s: float = 1.0,
) -> BenchResult:
    """Overhead-free kernel timing for high-latency dispatch paths.

    The axon TPU tunnel has a fixed ~140 ms dispatch+fetch round trip with
    100s-of-ms jitter, and an unreliable `block_until_ready`, so per-call
    timing lies. Instead run n1 and n2 *chained* iterations inside one jit
    (lax.fori_loop with a RUNTIME trip count, so both points share one
    executable; `chain` feeds the output back as the next input, default:
    replace the first arg) and report the slope (t2 - t1) / (n2 - n1).
    After a pilot run, n2 is auto-scaled so the compute delta is at least
    `min_delta_s` — large enough to bury the tunnel jitter.
    """
    import numpy as np

    if chain is None:
        chain = lambda out, a: (out,) + tuple(a[1:])  # noqa: E731

    @jax.jit
    def run(n, *a):
        def body(_, a):
            return tuple(chain(fn(*a), a))

        return jax.lax.fori_loop(0, n, body, tuple(a), unroll=False)

    def measure(n, r=reps):
        best = float("inf")
        for _ in range(r):
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(run(n, *args))[0])
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = n_pair
    np.asarray(jax.tree.leaves(run(1, *args))[0])  # compile + warm
    # pilot: estimate per-iter time, then size n2 to bury the jitter.
    # Tunnel jitter can make the pilot delta zero/negative; the estimate is
    # then meaningless — retry once, and if still unusable grow n2 by a
    # fixed 20x so a fast kernel's delta isn't left buried under the
    # 100s-of-ms dispatch jitter (that produced reproducibly NEGATIVE
    # "timings" for sub-ms rungs). Growth stays capped (vs inflating n2
    # toward min_delta_s / 1e-7, a multi-hour hang for a slow kernel).
    span = n2 - n1
    pilot = measure(n2, r=2) - measure(n1, r=2)
    if pilot <= 0:
        pilot = measure(n2, r=3) - measure(n1, r=3)
    if pilot > 0:
        need = min(int(min_delta_s / (pilot / span)), 100 * span)
        if need > span:
            n2 = n1 + need
    else:
        n2 = n1 + 20 * span

    times = {n: measure(n) for n in (n1, n2)}
    per_iter_ms = 1e3 * (times[n2] - times[n1]) / (n2 - n1)
    return BenchResult(
        name=name,
        mean_ms=per_iter_ms,
        min_ms=per_iter_ms,
        iters=n2 - n1,
        flops=flops,
        bytes_accessed=bytes_accessed,
    )


def _trace_device_us(trace_dir: str) -> tuple[float, dict[str, float]]:
    """Parse a jax.profiler trace dir -> (outer program device us, per-op us).

    Ground truth for kernel timing: device-side event durations come from
    hardware timestamps and are immune to the axon tunnel's 100s-of-ms
    dispatch jitter (which biased host-side delta timing ~8-17% optimistic —
    three round-1 GEMM rungs read >1.0x roofline, physically impossible).
    The outer `jit_*` event of a single dispatch encloses the whole chained
    fori_loop, so dur/n is exact per-iteration device time.
    """
    import collections
    import glob
    import gzip
    import json
    import os

    files = sorted(
        glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu = {p for p, name in pids.items() if "TPU" in name}
    dur: dict[str, float] = collections.defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in tpu:
            dur[e["name"]] += e.get("dur", 0.0)
    jit_total = sum(v for k, v in dur.items() if k.startswith("jit"))
    if jit_total <= 0.0:  # e.g. named differently; fall back to the loop op
        jit_total = dur.get("while", 0.0)
    if jit_total <= 0.0:
        raise ValueError(f"no jit/while device event in {files[-1]}")
    return jit_total, dict(dur)


def benchmark_device(
    fn: Callable[..., Any],
    *args: Any,
    name: str = "kernel",
    chain: Callable[..., tuple] | None = None,
    iters: int = 30,
    min_device_s: float = 0.05,
    flops: int | None = None,
    bytes_accessed: int | None = None,
    trace_dir: str | None = None,
) -> BenchResult:
    """Device-trace kernel timing — the calibrated primary method on TPU.

    Runs `iters` chained iterations of fn inside ONE jitted fori_loop
    dispatch (output fed back as the next input, so iterations are
    data-dependent and provably serialized), captures a jax.profiler trace
    of that single dispatch, and reads the program's device execution time
    from the trace. No host clocks are involved, so tunnel dispatch jitter
    cannot bias the number in either direction.

    iters is grown so total device time is at least `min_device_s` (trace
    timestamp granularity is ~1 us; 50 ms total keeps quantization and any
    per-dispatch ramp effects under 0.1%).
    """
    import shutil
    import tempfile

    import numpy as np

    if chain is None:
        chain = lambda out, a: (out,) + tuple(a[1:])  # noqa: E731

    @jax.jit
    def run(n, *a):
        def body(_, a):
            return tuple(chain(fn(*a), a))

        return jax.lax.fori_loop(0, n, body, tuple(a), unroll=False)

    def dispatch(n):
        np.asarray(jax.tree.leaves(run(n, *args))[0])

    dispatch(1)  # compile + warm
    # pilot (host-timed, rough): size iters so device total >= min_device_s
    import time as _time

    t0 = _time.perf_counter()
    dispatch(iters)
    rough = _time.perf_counter() - t0  # includes ~140ms tunnel overhead
    per_iter_rough = max(rough - 0.1, 1e-4) / iters
    need = int(min_device_s / per_iter_rough) + 1
    n = max(iters, min(need, 200 * iters))

    owned = trace_dir is None
    tdir = trace_dir or tempfile.mkdtemp(prefix="fkp_devbench_")
    try:
        with jax.profiler.trace(tdir):
            dispatch(n)
        total_us, _ = _trace_device_us(tdir)
    finally:
        if owned:
            shutil.rmtree(tdir, ignore_errors=True)
    per_iter_ms = total_us / n / 1e3
    return BenchResult(
        name=name,
        mean_ms=per_iter_ms,
        min_ms=per_iter_ms,
        iters=n,
        flops=flops,
        bytes_accessed=bytes_accessed,
    )


def capture_trace(
    fn: Callable[..., Any],
    *args: Any,
    trace_dir: str = "/tmp/fkp_trace",
    iters: int = 3,
) -> str:
    """Capture a jax.profiler trace of `fn(*args)` — the TPU analog of the
    reference's per-file `ncu` recipes (SURVEY.md section 5.1;
    e.g. `gemm_naive_tiled.cu:247`). Open the result with XProf/Perfetto
    (`xprof --port ... <dir>` or ui.perfetto.dev) to read per-op device
    time, MXU utilization, and HBM traffic.

    Returns the trace directory."""
    import jax

    out = fn(*args)  # compile outside the trace
    jax.block_until_ready(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return trace_dir


def benchmark(
    fn: Callable[..., Any],
    *args: Any,
    name: str = "kernel",
    warmup: int = 3,
    iters: int = 20,
    flops: int | None = None,
    bytes_accessed: int | None = None,
) -> BenchResult:
    """Time `fn(*args)` like the reference's cudaEvent loops.

    `fn` should already be jitted; the first call compiles (excluded via
    warmup, like the reference's warmup launch `naive_gemm.cu:119-121`).
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    return BenchResult(
        name=name,
        mean_ms=1e3 * sum(times) / len(times),
        min_ms=1e3 * min(times),
        iters=iters,
        flops=flops,
        bytes_accessed=bytes_accessed,
    )
