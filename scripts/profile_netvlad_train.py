#!/usr/bin/env python
"""Decompose the GatedNetVLAD train-step time on-chip (which stage eats
the 35.7ms at batch 256?). Each stage timed as its own jit with
device_get sync."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from yt8m_tpu.models.frame_utils import l2_normalize

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, F, D, K, H, C = 256, 300, 1152, 256, 1024, 4716


def timed(fn, *args, n=10, label=""):
    # Reduce outputs to a scalar ON DEVICE so the sync doesn't time a
    # device->host transfer of a large array over the tunnel.
    red = jax.jit(
        lambda *a: sum(
            jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(fn(*a))
        )
    )
    out = red(*args)
    _ = jax.device_get(out)
    t0 = time.perf_counter()
    for _i in range(n):
        out = red(*args)
    _ = jax.device_get(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:42s} {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    u8 = jax.random.randint(ks[0], (B, F, D), 0, 256, jnp.int32).astype(
        jnp.uint8
    )
    nf = jax.random.randint(ks[1], (B,), 30, F + 1, jnp.int32)
    wc = jax.random.normal(ks[2], (D, K), jnp.float32) * 0.03
    centers = jax.random.normal(ks[3], (K, D), jnp.float32) * 0.03
    hidden_w = jax.random.normal(ks[4], (K * D, H), jnp.float32) * 0.002
    gates_w = jax.random.normal(ks[5], (H, C * 3), jnp.float32) * 0.03
    experts_w = jax.random.normal(ks[6], (H, C * 2), jnp.float32) * 0.03
    labels = (
        jax.random.uniform(ks[7], (B, C)) < 0.002
    ).astype(jnp.float32)
    args = (u8, nf, wc, centers, hidden_w, gates_w, experts_w)
    args = jax.block_until_ready(jax.device_put(args))
    u8, nf, wc, centers, hidden_w, gates_w, experts_w = args
    labels = jax.device_put(labels)

    @jax.jit
    def stage_dequant(u8):
        return (u8.astype(jnp.float32) * (4.0 / 255.0) + (4.0 / 512.0 - 2.0))

    @jax.jit
    def stage_assign(u8, nf, wc):
        x = stage_dequant(u8)
        act = jnp.einsum(
            "bfd,dk->bfk",
            x.astype(jnp.bfloat16),
            wc.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        mean = jnp.mean(act, axis=(0, 1))
        var = jnp.var(act, axis=(0, 1))
        act = (act - mean) * jax.lax.rsqrt(var + 1e-3)
        assign = jax.nn.softmax(act, axis=-1)
        mask = (jnp.arange(F)[None, :] < nf[:, None]).astype(jnp.float32)
        return assign * mask[:, :, None]

    @jax.jit
    def stage_vlad(u8, nf, wc, centers):
        x = stage_dequant(u8)
        assign = stage_assign(u8, nf, wc)
        a_sum = jnp.sum(assign, axis=1)
        vlad = jnp.einsum(
            "bfk,bfd->bkd",
            assign.astype(jnp.bfloat16),
            x.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        vlad = vlad - a_sum[:, :, None] * centers[None]
        vlad = l2_normalize(vlad, axis=2)
        vlad = vlad.reshape(B, K * D)
        return l2_normalize(vlad, axis=1)

    @jax.jit
    def stage_full_fwd(u8, nf, wc, centers, hidden_w, gates_w, experts_w):
        vlad = stage_vlad(u8, nf, wc, centers)
        hidden = jax.nn.relu(
            jnp.dot(
                vlad.astype(jnp.bfloat16),
                hidden_w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        )
        g = jnp.dot(
            hidden.astype(jnp.bfloat16), gates_w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).reshape(B, C, 3)
        e = jnp.dot(
            hidden.astype(jnp.bfloat16), experts_w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).reshape(B, C, 2)
        probs = jnp.sum(
            jax.nn.softmax(g, axis=-1)[..., :2] * jax.nn.sigmoid(e),
            axis=-1,
        )
        return probs

    def loss_fn(params, u8, nf, labels):
        wc, centers, hidden_w, gates_w, experts_w = params
        probs = stage_full_fwd(
            u8, nf, wc, centers, hidden_w, gates_w, experts_w
        )
        p = jnp.clip(probs, 1e-5, 1 - 1e-5)
        return -jnp.mean(
            jnp.sum(
                labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p),
                axis=-1,
            )
        )

    grad_fn = jax.jit(jax.grad(loss_fn))
    params = (wc, centers, hidden_w, gates_w, experts_w)

    timed(stage_dequant, u8, label="dequant u8->f32 [B,300,1152]")
    timed(stage_assign, u8, nf, wc, label="+ assign matmul+BN+softmax")
    timed(stage_vlad, u8, nf, wc, centers, label="+ residual einsum + norms")
    timed(
        stage_full_fwd, u8, nf, wc, centers, hidden_w, gates_w,
        experts_w, label="full forward (+hidden+MoE)",
    )
    timed(grad_fn, params, u8, nf, labels, label="grad (fwd+bwd)")


if __name__ == "__main__":
    main()
