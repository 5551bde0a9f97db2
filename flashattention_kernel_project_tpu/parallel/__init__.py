from flashattention_kernel_project_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    head_sharded_attention,
    head_sharded_decode,
    head_sharded_decode_quant,
    seq_sharded_decode,
    shard_params,
)
from flashattention_kernel_project_tpu.parallel.train import (  # noqa: F401
    make_train_step,
    make_cp_train_step,
    make_optax_train_step,
)
from flashattention_kernel_project_tpu.parallel.ring_attention import (  # noqa: F401
    ring_attention,
    ring_attention_kv_quant,
    ring_attention_trainable,
    merge_normalized,
)
from flashattention_kernel_project_tpu.parallel.ulysses import (  # noqa: F401
    ulysses_attention,
)
from flashattention_kernel_project_tpu.parallel.pipeline import (  # noqa: F401
    make_pp_train_step,
    pp_loss_fn,
    pp_param_specs,
)
from flashattention_kernel_project_tpu.parallel.tp_engine import (  # noqa: F401
    cache_specs,
    init_sp_cache,
    init_tp_cache,
    init_tp_paged_cache,
    local_config,
    make_sp_decode_step,
    make_tp_engine,
    make_tp_paged_decode,
)
