from flashattention_kernel_project_tpu.ops.gemm import (  # noqa: F401
    matmul,
    matmul_xla,
    matmul_bf16,
    batched_matmul,
    matmul_fused_epilogue,
    batched_matmul_softmax_epilogue,
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
    k_max_norm,
    flash_attention_ragged,
    flash_attention_kv_quant,
    flash_attention_ragged_kv_quant,
)
from flashattention_kernel_project_tpu.ops.flash_decode import (  # noqa: F401
    flash_decode,
    flash_decode_int8,
    flash_decode_fp8,
    merge_partials,
)
from flashattention_kernel_project_tpu.ops.streaming import (  # noqa: F401
    streaming_decode,
)
from flashattention_kernel_project_tpu.ops.quant import (  # noqa: F401
    quantize_int8,
    dequantize_int8,
    quantize_fp8,
    dequantize_fp8,
    quantize_kv,
    quantize_fp8_weights,
    matmul_int8,
    matmul_int8_weights,
    matmul_fp8_weights,
)
from flashattention_kernel_project_tpu.ops.paged_decode import (  # noqa: F401,E402
    PagePool,
    paged_append,
    paged_append_chunk,
    paged_append_chunk_quant,
    paged_append_quant,
    paged_flash_decode,
    paged_flash_decode_quant,
    paged_flash_extend,
)
