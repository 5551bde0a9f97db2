"""Native C++ oracle vs the numpy oracles (same L4 role as the reference's
C++ CPU references, SURVEY.md section 4.1)."""

import numpy as np
import pytest

from flashattention_kernel_project_tpu.runtime import native
from flashattention_kernel_project_tpu.utils import oracles

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for liboracle.so"
)


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
