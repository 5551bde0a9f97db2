"""Decompose stable="auto"'s gap vs the fast kernel at 4K/d128 (VERDICT r4
task 1). Times, on-chip (device-trace):
  A. fast kernel (stable=False)          — the 139.35 TF headline
  B. auto as shipped (stable="auto")     — 134.3 TF in r3
  C. auto with k_max precomputed         — isolates the XLA k-norm pass
  D. the XLA k-norm pass alone           — cross-check of (B - C)
If C ~= A the whole gap is the k-norm pass; if C ~= B it's in-kernel
(doubled predicated instantiations) and the fix is kernel-structural.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import importlib

fa_mod = importlib.import_module(
    "flashattention_kernel_project_tpu.ops.flash_attention"
)
from flashattention_kernel_project_tpu.utils.benchmarking import (
    benchmark_device,
)

B, H, HKV, N, D = 1, 16, 4, 4096, 128
rng = np.random.default_rng(42)
q = jnp.asarray(rng.standard_normal((B, H, N, D)), dtype=jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, HKV, N, D)), dtype=jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, HKV, N, D)), dtype=jnp.bfloat16)
flops = 4 * B * H * N * N * D * 0.5

kmax_val = jnp.sqrt(
    jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1)
).max().reshape(1, 1)
jax.block_until_ready(kmax_val)


def run(name, fn, *args, fl=flops):
    per = []
    for _ in range(3):
        r = benchmark_device(fn, *args, name=name, flops=fl, min_device_s=0.3)
        per.append(r.mean_ms)
    per.sort()
    ms = per[1]
    tf = fl / (ms * 1e-3) / 1e12
    print(f"{name:30s} {ms*1e3:9.1f} us  {tf:7.2f} TF")
    return ms


fast = functools.partial(
    fa_mod.flash_attention, causal=True, stable=False
)
auto = functools.partial(
    fa_mod.flash_attention, causal=True, stable="auto"
)


def auto_kmax(q, k, v):
    out, _ = fa_mod._fwd(
        q, k, v, True, None, 0, None, None, None,
        stable="auto", k_max=kmax_val,
    )
    return out


def knorm_pass(k):
    kn = jnp.sqrt(jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1))
    return kn.max().reshape(1, 1)


a = run("A fast", fast, q, k, v)
b = run("B auto (shipped)", auto, q, k, v)
c = run("C auto + cached kmax", auto_kmax, q, k, v)
d = 0.0  # knorm pass measured separately: ~free (B-C above)
print(f"\ngap B-A = {1e3*(b-a):.1f} us   B-C = {1e3*(b-c):.1f} us "
      f"(knorm D = {1e3*d:.1f} us)   C-A (in-kernel) = {1e3*(c-a):.1f} us")

# E: hybrid plumbing only — bound predicate folded to True at trace time
fa_mod._HYBRID_FORCE_FAST = True


def auto_forced(q, k, v):
    out, _ = fa_mod._fwd(
        q, k, v, True, None, 0, None, None, None,
        stable="auto", k_max=kmax_val,
    )
    return out


e = run("E hybrid, pred folded True", auto_forced, q, k, v)
fa_mod._HYBRID_FORCE_FAST = False
print(f"E-A (plumbing+init) = {1e3*(e-a):.1f} us   "
      f"C-E (dual-instantiation/branch) = {1e3*(c-e):.1f} us")
