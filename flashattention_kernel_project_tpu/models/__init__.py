from flashattention_kernel_project_tpu.models.transformer import (  # noqa: F401
    TransformerConfig,
    init_params,
    param_shardings,
    forward,
    loss_fn,
    sgd_train_step,
    rms_norm,
    rope_tables,
    apply_rope,
)
from flashattention_kernel_project_tpu.models.engine import (  # noqa: F401
    KVCache,
    init_cache,
    prefill,
    extend,
    decode_step,
    fuse_decode_params,
    quantize_decode_params,
    init_paged_cache,
    decode_step_paged,
    paged_insert,
    decode_steps,
    generate,
    speculative_accept,
    speculative_generate,
)
from flashattention_kernel_project_tpu.models.moe import (  # noqa: F401
    MoEConfig,
    init_moe_params,
    moe_param_shardings,
    moe_ffn,
    make_ep_moe,
)
from flashattention_kernel_project_tpu.models.checkpoint import (  # noqa: F401
    restore_checkpoint,
    save_checkpoint,
)
