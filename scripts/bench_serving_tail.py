#!/usr/bin/env python
"""On-chip decomposition of the DBoF serving-step TAIL (hidden FC + MoE
head + exact top-20), plus top-k strategy A/B at [B, 4716] f32.

The v2 cluster+pool kernel is ~8.1 ms of the 12.84 ms step; this isolates
where the remaining ~3.3 ms goes and whether the exact top-20 has a
cheaper lowering than jax.lax.approx_max_k(recall_target=1.0).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, C = 2048, 4716


def timed(label, fn, *args, steps=30):
    out = fn(*args)
    _ = jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = jax.device_get(out)
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"{label:48s} {ms:8.3f} ms")
    return ms


def main():
    rng = np.random.default_rng(0)
    probs = jnp.asarray(rng.random((B, C)), jnp.float32)

    # --- top-k strategies (reduced consumer: sum of values+indices) ---
    @jax.jit
    def t_approx(p):
        v, i = jax.lax.approx_max_k(p, 20, recall_target=1.0)
        return v.sum() + i.sum()

    @jax.jit
    def t_approx_default(p):
        v, i = jax.lax.approx_max_k(p, 20)
        return v.sum() + i.sum()

    @jax.jit
    def t_exact(p):
        v, i = jax.lax.top_k(p, 20)
        return v.sum() + i.sum()

    @jax.jit
    def t_chunked(p):
        # per-chunk approx top-20 then merge (4 x [B, 1179] -> [B, 80])
        chunks = jnp.split(jnp.pad(p, ((0, 0), (0, 4))), 4, axis=1)
        vs, is_ = [], []
        for ci, ch in enumerate(chunks):
            v, i = jax.lax.approx_max_k(ch, 20, recall_target=1.0)
            vs.append(v)
            is_.append(i + ci * 1180)
        v = jnp.concatenate(vs, 1)
        i = jnp.concatenate(is_, 1)
        vv, ii = jax.lax.top_k(v, 20)
        return vv.sum() + jnp.take_along_axis(i, ii, axis=1).sum()

    @jax.jit
    def t_argmax_only(p):  # lower bound: one full read, trivial reduce
        return p.max(axis=1).sum()

    timed("top20 approx_max_k(recall=1.0)  [bench.py]", t_approx, probs)
    timed("top20 approx_max_k(default)", t_approx_default, probs)
    timed("top20 lax.top_k", t_exact, probs)
    timed("top20 chunked approx+merge", t_chunked, probs)
    timed("read-only lower bound (max)", t_argmax_only, probs)

    # --- tail graph: pooled [B, 8192] -> hidden FC -> MoE head -> top20 ---
    K, H, M = 8192, 1024, 2
    pooled = jnp.asarray(rng.normal(0, 1, (B, K)), jnp.float32)
    w_h = jnp.asarray(rng.normal(0, 0.02, (K, H)), jnp.bfloat16)
    w_g = jnp.asarray(rng.normal(0, 0.02, (H, (M + 1) * C)), jnp.bfloat16)
    w_e = jnp.asarray(rng.normal(0, 0.02, (H, M * C)), jnp.bfloat16)

    def head(pooled):
        h = jnp.maximum(pooled.astype(jnp.bfloat16) @ w_h, 0)
        g = jax.nn.softmax(
            (h @ w_g).astype(jnp.float32).reshape(B, C, M + 1), axis=-1
        )
        e = jax.nn.sigmoid((h @ w_e).astype(jnp.float32).reshape(B, C, M))
        return (g[..., :M] * e).sum(-1)

    @jax.jit
    def t_head_only(pooled):
        return head(pooled).sum()

    @jax.jit
    def t_head_topk(pooled):
        v, i = jax.lax.approx_max_k(head(pooled), 20, recall_target=1.0)
        return v.sum() + i.sum()

    timed("tail: hidden+MoE head only", t_head_only, pooled)
    timed("tail: hidden+MoE head + top20", t_head_topk, pooled)


def bench_fused_head():
    from yt8m_tpu.kernels.moe_head import moe_head_serving

    rng = np.random.default_rng(1)
    H, M = 1024, 2
    x = jnp.asarray(rng.normal(0, 1, (B, H)), jnp.float32)
    wg = jnp.asarray(rng.normal(0, 0.05, (H, C * (M + 1))), jnp.float32)
    we = jnp.asarray(rng.normal(0, 0.05, (H, C * M)), jnp.float32)
    be = jnp.asarray(rng.normal(0, 0.05, (C * M,)), jnp.float32)

    @jax.jit
    def t_xla(x, wg, we, be):
        g = jnp.dot(x.astype(jnp.bfloat16), wg.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        e = jnp.dot(x.astype(jnp.bfloat16), we.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + be
        gating = jax.nn.softmax(g.reshape(B, C, M + 1), axis=-1)
        probs = jnp.sum(
            gating[..., :M] * jax.nn.sigmoid(e.reshape(B, C, M)), -1
        )
        v, i = jax.lax.approx_max_k(probs, 20, recall_target=1.0)
        return v.sum() + i.sum()

    @jax.jit
    def t_fused(x, wg, we, be):
        probs = moe_head_serving(x, wg, we, be, M)
        v, i = jax.lax.approx_max_k(probs, 20, recall_target=1.0)
        return v.sum() + i.sum()

    # exactness on-chip
    probs_xla = jax.jit(lambda *a: moe_head_serving(*a, M))(x, wg, we, be)
    g = jnp.dot(x.astype(jnp.bfloat16), wg.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    e = jnp.dot(x.astype(jnp.bfloat16), we.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + be
    ref = jnp.sum(jax.nn.softmax(g.reshape(B, C, M + 1), -1)[..., :M]
                  * jax.nn.sigmoid(e.reshape(B, C, M)), -1)
    err = float(jnp.max(jnp.abs(probs_xla - ref)))
    print(f"fused head on-chip max |err| vs XLA: {err:.3e}")

    timed("head+top20 XLA", t_xla, x, wg, we, be)
    timed("head+top20 FUSED kernel", t_fused, x, wg, we, be)


if __name__ == "__main__":
    main()
    bench_fused_head()
