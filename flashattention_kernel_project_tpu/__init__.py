"""flashattention_kernel_project_tpu — TPU-native quantized attention-inference engine.

A brand-new JAX / XLA / Pallas / pjit framework reconstructing the capability
ladder of the CUDA kernel-study reference `jeehun98/FlashAttention_Kernel_Project`:

  naive GEMM -> VMEM-blocked GEMM -> MXU bf16 GEMM -> batched GEMM ->
  fused-epilogue GEMM -> softmax microkernels -> online/streaming softmax ->
  fused FlashAttention forward -> split-KV flash decode -> quantized
  (int8/fp8) weight + KV-cache paths -> multi-chip sharded attention
  (head/TP sharding, ring/context-parallel attention, distributed decode).

Layout (mirrors SURVEY.md section 7 build plan):
  ops/       Pallas MXU/VPU kernels (the L1/L2 layer of the reference)
  models/    flagship GQA transformer + decode engine built on ops/
  parallel/  mesh, shard_map wrappers, ring attention, distributed decode
  utils/     bench harness, CPU oracles, error metrics (the reference's
             per-file main()/verify scaffolding as a library — L3/L4/L5)
"""

__version__ = "0.1.0"

from flashattention_kernel_project_tpu import ops, utils  # noqa: F401
