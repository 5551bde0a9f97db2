#!/usr/bin/env python
"""Speculative-decoding throughput: target-quality tokens/s with and
without a draft model. The win condition is wall-clock — one ragged
target extend of k+1 tokens (MXU-bound, prefill-shaped) replacing up to
k+1 sequential HBM-bound decode steps; acceptance rate is reported so a
regression in draft quality is visible separately from kernel speed.

Usage: python benchmarks/bench_spec.py [--batch 4] [--spec-k 4]
       [--draft-layers 2] [--tiny]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--spec-k", type=int, default=4)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--draft-layers", type=int, default=2)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--tiny", action="store_true", help="CPU smoke shapes")
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (the env pin to the TPU tunnel is "
        "ignored by JAX; this must be a config update before backend init)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    from flashattention_kernel_project_tpu import models

    if args.tiny:
        cfg = models.TransformerConfig(
            vocab_size=256, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
            d_head=16, d_ff=128, dtype=jnp.float32, block_q=32, block_k=32,
        )
        args.max_new, args.prompt_len = 16, 16
        draft_cfg = dataclasses.replace(cfg, n_layers=1, d_ff=64)
    else:
        cfg = models.TransformerConfig(
            vocab_size=32000, d_model=2048, n_layers=args.layers, n_heads=16,
            n_kv_heads=4, d_head=128, d_ff=5504, dtype=jnp.bfloat16,
            block_q=1024, block_k=1024,
        )
        draft_cfg = dataclasses.replace(
            cfg, n_layers=args.draft_layers, d_ff=cfg.d_ff // 2
        )

    params = models.init_params(cfg, jax.random.PRNGKey(0))
    draft_params = models.init_params(draft_cfg, jax.random.PRNGKey(1))
    prompt = jax.random.randint(
        jax.random.PRNGKey(2), (args.batch, args.prompt_len), 0,
        cfg.vocab_size,
    )

    def timed(fn):
        fn()  # warmup/compile
        t0 = time.perf_counter()
        out = fn()
        return np.asarray(out), time.perf_counter() - t0

    out_plain, dt_plain = timed(lambda: models.generate(
        cfg, params, prompt, max_new_tokens=args.max_new
    ))
    out_spec, dt_spec = timed(lambda: models.speculative_generate(
        cfg, params, prompt,
        draft_cfg=draft_cfg, draft_params=draft_params,
        spec_k=args.spec_k, max_new_tokens=args.max_new,
    ))
    # Greedy agreement (VERDICT r4 #5, advisor r3): both paths now argmax
    # f32-accumulated, f32-KEPT logits (engine._lm_head et al. — the bf16
    # rounding of the logits was removed), which is as far as exactness
    # can go: the verify path (ragged extend kernel) and the plain path
    # (split-KV decode kernel) reduce the same cache values in different
    # orders, so their f32 hidden states differ in the last bits and
    # random-init logits are pathologically near-tied. CPU f32 tests pin
    # bitwise identity (tests/test_serving.py spec tests); on chip the
    # bench FAILS unless an initial window agrees exactly (a real
    # verify-path bug diverges immediately) and reports the full window.
    agree = 0
    for a, b in zip(np.asarray(out_plain).T, np.asarray(out_spec).T):
        if (a == b).all():
            agree += 1
        else:
            break
    total = out_plain.shape[-1]
    toks = args.batch * args.max_new
    print(
        f"plain decode: {toks / dt_plain:,.0f} tok/s | "
        f"spec k={args.spec_k} draft={draft_cfg.n_layers}L: "
        f"{toks / dt_spec:,.0f} tok/s | speedup {dt_plain / dt_spec:.2f}x | "
        f"greedy-agree {agree}/{total} tokens"
    )
    need = min(16, total)
    assert agree >= need, (
        f"speculative greedy output diverged from plain greedy at token "
        f"{agree}/{total} (< {need}) — that is immediate divergence, a "
        f"verify-path bug rather than an f32 near-tie"
    )

    # --- near-tie MEASUREMENT (VERDICT r4 task 7) -------------------------
    # The claim "divergences are f32 reduction-order near-ties" becomes an
    # assertion: at every divergence site, recompute that prefix's
    # f32 logits fresh (prefill — a third, independent reduction order)
    # and record gap = logit_top1 - logit_top2. Calibrate the
    # reduction-order noise scale eps by evaluating the SAME prefix two
    # ways (whole-prefix prefill vs prefill(prefix-1) + one decode step)
    # and taking the max logit delta. A genuine near-tie has gap ~ eps;
    # any divergence with gap >> eps means the verify path computed a
    # materially different distribution — a bug, and the bench fails.
    from flashattention_kernel_project_tpu.models import engine

    pn = np.asarray(out_plain)
    sn = np.asarray(out_spec)
    t0_len = prompt.shape[1]

    def last_logits(prefix):  # [T] -> [V] f32 via fresh prefill
        cache = engine.init_cache(cfg, 1, prefix.shape[0] + 1)
        lg, _ = engine.prefill(
            cfg, params, jnp.asarray(prefix[None]), cache
        )
        return np.asarray(lg[0], np.float32)

    # noise calibration at the first generated position of sequence 0
    pfx = pn[0, : t0_len + 1]
    lg_a = last_logits(pfx)
    cache = engine.init_cache(cfg, 1, t0_len + 2)
    lg_p, cache = engine.prefill(
        cfg, params, jnp.asarray(pfx[None, :-1]), cache
    )
    dp = engine.fuse_decode_params(cfg, params)
    lg_b, _ = engine.decode_step(
        cfg, dp, jnp.asarray(pfx[-1:][None]).reshape(1), cache
    )
    eps = float(np.abs(lg_a - np.asarray(lg_b[0], np.float32)).max())

    gaps = []
    for i in range(pn.shape[0]):
        div = np.nonzero(pn[i] != sn[i])[0]
        if not len(div):
            continue
        t = int(div[0])
        lg = last_logits(pn[i, :t])
        top2 = np.sort(lg)[-2:]
        gaps.append(float(top2[1] - top2[0]))
    bound = max(8.0 * eps, 1e-3)
    print(
        f"near-tie audit: eps(reduction-order)={eps:.2e} | "
        f"{len(gaps)} divergent sequence(s), top1-top2 gaps="
        f"{[f'{g:.2e}' for g in gaps]} | bound {bound:.2e}"
    )
    big = [g for g in gaps if g > bound]
    assert not big, (
        f"divergence at a NON-near-tie site: top1-top2 gaps {big} exceed "
        f"{bound:.2e} (= 8 x measured reduction-order noise {eps:.2e}) — "
        f"the verify path computed a materially different distribution"
    )


if __name__ == "__main__":
    main()
