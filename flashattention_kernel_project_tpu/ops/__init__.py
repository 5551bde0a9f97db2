from flashattention_kernel_project_tpu.ops.gemm import (  # noqa: F401
    matmul,
    matmul_xla,
    matmul_bf16,
    batched_matmul,
    matmul_fused_epilogue,
)
from flashattention_kernel_project_tpu.ops.softmax import (  # noqa: F401
    softmax,
    SoftmaxState,
    init_state,
    tile_state,
    merge,
    finalize,
    online_softmax_reference,
)
from flashattention_kernel_project_tpu.ops.flash_attention import (  # noqa: F401
    flash_attention,
    flash_attention_with_lse,
)
