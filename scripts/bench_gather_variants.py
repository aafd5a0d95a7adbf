#!/usr/bin/env python
"""Calibrate serving-step timing methodology + compare gather variants."""

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

B, F, D, S = 2048, 300, 1152, 30


def timed(label, fn, *args, steps=20):
    out = fn(*args)
    _ = jax.device_get(out)
    # time a single dispatch too
    t0 = time.perf_counter()
    out = fn(*args)
    _ = jax.device_get(out)
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = jax.device_get(out)
    t_loop = (time.perf_counter() - t0) / steps
    print(f"{label:42s} loop {t_loop*1e3:8.2f} ms   single {t_one*1e3:8.2f} ms")
    return t_loop


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, F, D), 0, 256, dtype=jnp.int32).astype(
        jnp.uint8
    )
    nf = jnp.asarray(
        np.random.default_rng(0).integers(30, F + 1, (B,)), jnp.int32
    )
    u = jax.random.uniform(key, (B, S))
    idx = jnp.floor(
        u * jnp.maximum(nf.astype(jnp.float32), 1.0)[:, None]
    ).astype(jnp.int32)

    @jax.jit
    def nop(idx):
        return jnp.sum(idx)

    @jax.jit
    def stream_sum(x):
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def take_along_u8(x, idx):
        return jnp.take_along_axis(x, idx[:, :, None], axis=1)

    @jax.jit
    def adv_index_u8(x, idx):
        return x[jnp.arange(B)[:, None], idx]

    @jax.jit
    def onehot_bf16(x, idx):
        oh = (idx[:, :, None] == jnp.arange(F)[None, None, :]).astype(
            jnp.bfloat16
        )
        return jnp.einsum(
            "bsf,bfd->bsd", oh, x.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    @jax.jit
    def gather_plus_sum(x, idx):
        # gather fused into a consumer — what the serving graph sees
        sel = jnp.take_along_axis(x, idx[:, :, None], axis=1)
        return jnp.sum(sel.astype(jnp.float32))

    timed("dispatch floor (sum of idx)", nop, idx)
    timed("stream 708MB (sum of x as f32)", stream_sum, x)
    timed("take_along_axis u8", take_along_u8, x, idx)
    timed("advanced indexing u8", adv_index_u8, x, idx)
    timed("one-hot bf16 einsum", onehot_bf16, x, idx)
    timed("take_along + f32 sum (fused use)", gather_plus_sum, x, idx)


if __name__ == "__main__":
    main()
