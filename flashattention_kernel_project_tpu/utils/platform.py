"""Platform detection and roofline constants.

The reference computes GFLOPS/TFLOPS against nothing (it prints raw numbers,
BASELINE.md). Here every benchmark is reported against the chip's roofline,
so `vs_baseline` in bench output is "fraction of speed-of-light".
"""

from __future__ import annotations

import functools

import jax


@functools.cache
def backend() -> str:
    return jax.default_backend()


def has_tpu() -> bool:
    # The axon tunnel reports platform "axon" but devices are real TPUs.
    try:
        d = jax.devices()[0]
    except RuntimeError:
        return False
    return "tpu" in d.platform.lower() or "TPU" in str(d.device_kind)


def default_interpret() -> bool:
    """Pallas TPU kernels run in interpret mode when no TPU is attached.

    This is the analog of the reference's stage-isolation debug kernels
    (SURVEY.md section 4.5): interpret mode executes the same kernel logic on
    CPU so tests run anywhere, including the 8-virtual-device CPU mesh.
    """
    return not has_tpu()


# Peak numbers per chip. Keyed on substrings of jax Device.device_kind.
# (bf16 matmul TFLOP/s, int8 TOP/s, HBM GB/s)
_CHIP_PEAKS = {
    "v5 lite": (197.0, 394.0, 819.0),  # TPU v5e
    "v5e": (197.0, 394.0, 819.0),
    "v5p": (459.0, 918.0, 2765.0),
    "v4": (275.0, 275.0, 1228.0),
    "v6 lite": (918.0, 1836.0, 1640.0),  # Trillium
    "v6e": (918.0, 1836.0, 1640.0),
}
_DEFAULT_PEAK = (197.0, 394.0, 819.0)


@functools.cache
def _chip_peaks() -> tuple[float, float, float]:
    try:
        kind = str(jax.devices()[0].device_kind).lower()
    except RuntimeError:
        return _DEFAULT_PEAK
    for key, peaks in _CHIP_PEAKS.items():
        if key in kind:
            return peaks
    return _DEFAULT_PEAK


def tpu_peak_flops(dtype: str = "bf16") -> float:
    """Peak matmul FLOP/s per chip for the attached TPU generation.

    "fp32" is the EFFECTIVE fp32-matmul ceiling: the MXU has no fp32 mode,
    so Precision.HIGHEST decomposes each operand into bf16 hi+lo and runs
    6 bf16 passes — 1/6 of the bf16 rate. This is the precision
    gemm._precision selects for fp32 inputs, so the /6 denominator matches
    the executed path. (The 3-pass Precision.HIGH decomposition would be
    /3, but Mosaic cannot lower HIGH inside Pallas kernels — verified
    on-chip 2026-08-20.)
    """
    bf16, int8, _ = _chip_peaks()
    if dtype in ("int8", "fp8"):
        return int8 * 1e12
    if dtype in ("fp32", "f32", "float32"):
        return bf16 * 1e12 / 6.0
    return bf16 * 1e12


def tpu_hbm_bandwidth() -> float:
    """Peak HBM bytes/s per chip."""
    return _chip_peaks()[2] * 1e9
