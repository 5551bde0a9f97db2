"""Native C++ oracle vs the numpy oracles (same L4 role as the reference's
C++ CPU references, SURVEY.md section 4.1)."""

import numpy as np
import pytest

from flashattention_kernel_project_tpu.runtime import native
from flashattention_kernel_project_tpu.utils import oracles

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for liboracle.so"
)


@pytest.mark.smoke
def test_native_gemm(rng):
    a = rng.standard_normal((128, 96), dtype=np.float32)
    b = rng.standard_normal((96, 64), dtype=np.float32)
    np.testing.assert_allclose(native.gemm(a, b), oracles.gemm(a, b), atol=1e-6)


def test_native_softmax(rng):
    x = rng.standard_normal((32, 517), dtype=np.float32) * 4
    np.testing.assert_allclose(native.softmax(x), oracles.softmax(x), atol=1e-6)


@pytest.mark.parametrize("causal,q_offset", [(False, 0), (True, 0), (True, 32)])
def test_native_attention(rng, causal, q_offset):
    q = rng.standard_normal((2, 8, 48, 32), dtype=np.float32)
    k = rng.standard_normal((2, 2, 80, 32), dtype=np.float32)
    v = rng.standard_normal((2, 2, 80, 32), dtype=np.float32)
    got = native.gqa_attention(q, k, v, causal=causal, q_offset=q_offset)
    exp = oracles.gqa_attention(q, k, v, causal=causal, q_offset=q_offset)
    np.testing.assert_allclose(got, exp, atol=1e-5)


# ---------------------------------------------------------------------------
# Native continuous-batching scheduler core (runtime/scheduler.cpp)
# ---------------------------------------------------------------------------

@pytest.mark.smoke
def test_scheduler_core_native_builds():
    from flashattention_kernel_project_tpu.runtime import native

    assert native.scheduler_available(), "g++ is in the image; must build"
    core = native.BatchSchedulerCore(4, 256)
    assert core.native


def _drive(core):
    """Deterministic workload; returns the full decision trace."""
    trace = []
    uids = [core.submit(pl, mn) for pl, mn in
            [(10, 3), (70, 2), (5, 8), (64, 1), (100, 2), (1, 4)]]
    trace.append(("uids", tuple(uids)))
    trace.append(("reject", core.submit(250, 20)))
    step = 0
    while core.pending() or core.active():
        trace.append(("fill", tuple(core.fill())))
        for slot in range(core.n_slots):
            if core.slot_uid(slot) >= 0:
                tok = (step * 7 + slot) % 50
                fin = core.on_token(slot, tok, eos=13)
                trace.append(("tok", slot, tok, fin))
        step += 1
        assert step < 100
    return trace


def test_scheduler_core_native_matches_python_fallback():
    """The C++ core and the pure-Python fallback must produce the identical
    decision trace on the same workload — they share one state machine."""
    from flashattention_kernel_project_tpu.runtime import native

    nat = native.BatchSchedulerCore(3, 256)
    assert nat.native
    py = native.BatchSchedulerCore(3, 256)
    py._lib = None  # force the fallback path
    py._slots = [None] * 3
    py._pending = []
    py._next_uid = 0
    assert _drive(nat) == _drive(py)


def test_scheduler_core_bucketing():
    from flashattention_kernel_project_tpu.runtime import native

    core = native.BatchSchedulerCore(2, 1024, granule=64)
    assert core.bucket(1) == 64
    assert core.bucket(64) == 64
    assert core.bucket(65) == 128
    assert core.bucket(1000) == 1024


def test_scheduler_core_bucket_capped_at_max_len():
    """Regression: a 990-token prompt in a max_len=1000 cache must bucket to
    1000, not 1024 (an oversized bucket is an out-of-bounds cache splice)."""
    from flashattention_kernel_project_tpu.runtime import native

    for force_py in (False, True):
        core = native.BatchSchedulerCore(2, 1000, granule=64)
        if force_py:
            core._lib = None
            core._slots = [None] * 2
            core._pending = []
            core._next_uid = 0
        assert core.bucket(990) == 1000
        assert core.bucket(3) == 64
