#!/usr/bin/env python
"""On-chip A/B: XLA gather + dbof_cluster_maxpool (current serving hot
section) vs the fused dbof_sampled_cluster_maxpool kernel, at the
reference config (B=2048, F=300, D=1152, S=30, K=8192).

Both sides are timed inside a composite jit graph whose output is a
small reduction of the pooled activations, mirroring how the serving
graph consumes them (the pallas_call output feeds the hidden FC)."""

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

from yt8m_tpu.kernels.dbof import (  # noqa: E402
    dbof_cluster_maxpool,
    dbof_sampled_cluster_maxpool,
)

B, F, D, S, K = 2048, 300, 1152, 30, 8192


def timed(label, fn, *args, steps=20, **kw):
    out = fn(*args, **kw)
    _ = jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args, **kw)
    _ = jax.device_get(out)
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"{label:40s} {ms:8.2f} ms")
    return ms


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, F, D), 0, 256, dtype=jnp.int32).astype(
        jnp.uint8
    )
    nf = jnp.asarray(rng.integers(30, F + 1, (B,)), jnp.int32)
    u = jax.random.uniform(key, (B, S))
    idx = jnp.floor(
        u * jnp.maximum(nf.astype(jnp.float32), 1.0)[:, None]
    ).astype(jnp.int32)
    w = jnp.asarray(rng.normal(0, 0.05, (D, K)), jnp.float32)
    s_in = jnp.asarray(rng.normal(1, 0.1, (D,)), jnp.float32)
    b_in = jnp.asarray(rng.normal(0, 0.1, (D,)), jnp.float32)
    s_act = jnp.asarray(rng.normal(1, 0.1, (K,)), jnp.float32)
    b_act = jnp.asarray(rng.normal(0, 0.1, (K,)), jnp.float32)

    @jax.jit
    def twostage(x, idx, w, s_in, b_in, s_act, b_act):
        x_sel = jnp.take_along_axis(x, idx[:, :, None], axis=1)
        pooled = dbof_cluster_maxpool(x_sel, w, s_in, b_in, s_act, b_act)
        return jnp.max(pooled, axis=1)

    import functools

    def fused(bb, bk):
        @jax.jit
        def f(x, idx, w, s_in, b_in, s_act, b_act):
            pooled = dbof_sampled_cluster_maxpool(
                x, idx, w, s_in, b_in, s_act, b_act,
                block_b=bb, block_k=bk,
            )
            return jnp.max(pooled, axis=1)
        return f

    timed("gather + cluster+pool (current)", twostage,
          x, idx, w, s_in, b_in, s_act, b_act)
    fns = {}
    for bb in (4, 8, 16):
        for bk in (512, 1024, 2048):
            try:
                fns[(bb, bk)] = fused(bb, bk)
                timed(f"fused sampled bb={bb:2d} bk={bk:4d}",
                      fns[(bb, bk)], x, idx, w, s_in, b_in, s_act, b_act)
            except Exception as e:  # noqa: BLE001
                print(f"fused sampled bb={bb:2d} bk={bk:4d}  FAIL "
                      f"{type(e).__name__}: {str(e)[:140]}")

    a = twostage(x, idx, w, s_in, b_in, s_act, b_act)
    bfn = fns.get((8, 1024)) or next(iter(fns.values()))
    bv = bfn(x, idx, w, s_in, b_in, s_act, b_act)
    print("max |diff| (consumer outputs):", float(jnp.max(jnp.abs(a - bv))))


if __name__ == "__main__":
    main()


def bench_v2():
    from yt8m_tpu.kernels.dbof import dbof_cluster_maxpool_v2
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, F, D), 0, 256, dtype=jnp.int32).astype(
        jnp.uint8
    )
    nf = jnp.asarray(rng.integers(30, F + 1, (B,)), jnp.int32)
    u = jax.random.uniform(key, (B, S))
    idx = jnp.floor(
        u * jnp.maximum(nf.astype(jnp.float32), 1.0)[:, None]
    ).astype(jnp.int32)
    w = jnp.asarray(rng.normal(0, 0.05, (D, K)), jnp.float32)
    s_in = jnp.asarray(rng.normal(1, 0.1, (D,)), jnp.float32)
    b_in = jnp.asarray(rng.normal(0, 0.1, (D,)), jnp.float32)
    s_act = jnp.asarray(rng.normal(1, 0.1, (K,)), jnp.float32)
    b_act = jnp.asarray(rng.normal(0, 0.1, (K,)), jnp.float32)

    def v2(bb, bk):
        @jax.jit
        def f(x, idx, w, s_in, b_in, s_act, b_act):
            x_sel = jnp.take_along_axis(x, idx[:, :, None], axis=1)
            pooled = dbof_cluster_maxpool_v2(
                x_sel, w, s_in, b_in, s_act, b_act, block_b=bb, block_k=bk)
            return jnp.max(pooled, axis=1)
        return f

    for bb in (16, 32, 64):
        for bk in (512, 1024):
            try:
                timed(f"v2 gather+castonce bb={bb:2d} bk={bk:4d}",
                      v2(bb, bk), x, idx, w, s_in, b_in, s_act, b_act)
            except Exception as e:  # noqa: BLE001
                print(f"v2 bb={bb:2d} bk={bk:4d}  FAIL "
                      f"{type(e).__name__}: {str(e)[:140]}")
