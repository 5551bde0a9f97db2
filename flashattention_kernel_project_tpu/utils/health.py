"""Failure detection + fail-fast recovery for the serving path.

Reference analog (SURVEY.md section 5.3): the reference has only a
CHECK_CUDA abort macro (`naive_gemm.cu:13-21`) and hand-rolled spin
timeouts with [STUCK] printf for hang hunting
(`flashattn_warp_spc_v2/..._v7_2_dbg_hanghunt.cu:54,163,231-234`).
On TPU the runtime detects device faults for us, but a long-lived serving
process still needs: (a) a cheap liveness probe, (b) classification of
transient vs fatal dispatch errors, and (c) bounded retry for transient
worker restarts (observed in practice: the remote TPU worker sporadically
restarts with UNAVAILABLE; the same program re-runs fine).
"""

from __future__ import annotations

import time
from typing import Any, Callable

# error-message fragments that indicate a transient runtime fault (worker
# restart / preemption), safe to retry after a cooldown
_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "worker process crashed or restarted",
    "socket closed",
    "connection reset",
    "DEADLINE_EXCEEDED",
)


def is_transient_error(err: BaseException) -> bool:
    msg = str(err)
    return any(marker.lower() in msg.lower() for marker in _TRANSIENT_MARKERS)


def device_healthcheck(timeout_s: float = 30.0) -> dict:
    """Cheap liveness probe: a tiny matmul, forced to completion.

    Returns {"ok": bool, "latency_s": float, "device": str, "error": str?}.
    `jax.block_until_ready` can lie over remote-dispatch paths, so the probe
    forces a host fetch (np.asarray) — the only trustworthy completion
    signal (docs/perf_journal.md)."""
    import numpy as np

    t0 = time.perf_counter()
    try:
        import jax
        import jax.numpy as jnp

        dev = jax.devices()[0]
        x = jnp.ones((128, 128), jnp.float32)
        got = float(np.asarray(jnp.dot(x, x).sum()))
        ok = abs(got - 128.0 * 128 * 128) < 1.0
        return {
            "ok": ok,
            "latency_s": time.perf_counter() - t0,
            "device": str(dev),
        }
    except Exception as e:  # noqa: BLE001 - a probe must not raise
        return {
            "ok": False,
            "latency_s": time.perf_counter() - t0,
            "device": "unknown",
            "error": f"{type(e).__name__}: {e}",
        }


def with_retries(
    fn: Callable[..., Any],
    *args: Any,
    max_retries: int = 2,
    cooldown_s: float = 5.0,
    on_retry: Callable[[int, BaseException], None] | None = None,
    **kwargs: Any,
) -> Any:
    """Run `fn`, retrying transient runtime faults (worker restarts) with a
    cooldown; fatal errors (shape errors, OOM, kernel bugs) raise
    immediately — fail fast, like the reference's CHECK_CUDA."""
    attempt = 0
    while True:
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 - classified below
            if not is_transient_error(e) or attempt >= max_retries:
                raise
            attempt += 1
            if on_retry is not None:
                on_retry(attempt, e)
            time.sleep(cooldown_s)
