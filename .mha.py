import functools, numpy as np
import jax.numpy as jnp
from flashattention_kernel_project_tpu import ops
from flashattention_kernel_project_tpu.utils.benchmarking import benchmark_chained

B,H,N,D = 1,16,4096,128
rng = np.random.default_rng(42)
q = jnp.asarray(rng.standard_normal((B,H,N,D)), dtype=jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B,H,N,D)), dtype=jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B,H,N,D)), dtype=jnp.bfloat16)
flops = 4*B*H*N*N*D*0.5
for bq,bk,stable in [(512,1024,False),(1024,1024,False),(512,1024,True)]:
    fa = functools.partial(ops.flash_attention, causal=True, stable=stable, block_q=bq, block_k=bk)
    r = benchmark_chained(fa, q, k, v, name=f"mha_{bq}_{bk}_{stable}", flops=flops, reps=4, min_delta_s=1.5)
    print(f"MHA bq={bq} bk={bk} stable={stable}: {r.mean_ms:.3f} ms {flops/r.mean_ms/1e9:.1f} TF", flush=True)
