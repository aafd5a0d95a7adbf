#!/usr/bin/env python
"""tile_b A/B for the trainable LSTM recurrence (r3 flagship profile
follow-up).

The flagship train profile shows the LSTM branch is 49.3 of the 88.2 ms
step (fwd 18.5 / bwd 30.8, B=256, H=1024, F=300). The trainable kernels
run with tile_b=64, so every sequential grid step issues an
[64, 1024] x [1024, 4096] recurrence matmul — M=64 rows on a 128-wide
MXU, i.e. half-empty passes, and 2x the per-step overheads
(B/64 = 4 batch tiles x 300 steps vs 2 x 300 at tile_b=128).

VMEM budget at tb=128 (fw): W_h resident 8 MB + double-buffered
xp (1 MB) + outs/gates/cs (1.5 MB) blocks + fh/fc + h/c scratch
~= 15 MB of ~16 MB — tight but expected to fit (the INFERENCE kernel
already defaults to tile_b=128 with fewer blocks). This measures
fwd and fwd+VJP at both tilings; if Mosaic rejects 128, that is the
recorded bound instead.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from yt8m_tpu.kernels.lstm_train import (  # noqa: E402
    lstm_recurrence_trainable,
)

F, B, H = 300, 256, 1024
STEPS = 20


def timed(fn, *args, label=""):
    out = fn(*args)
    _ = jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    _ = jax.device_get(out)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{label:40s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    xp = jax.random.normal(k1, (F, B, 4 * H), jnp.float32) * 0.3
    nf = jax.random.randint(k2, (B,), 10, F + 1, dtype=jnp.int32)
    wh = jax.random.normal(k3, (H, 4 * H), jnp.float32) * 0.05
    bias = jnp.zeros((4 * H,), jnp.float32)
    xp, nf, wh, bias = jax.block_until_ready(
        jax.device_put((xp, nf, wh, bias))
    )
    print("data ready", flush=True)

    tiles = tuple(int(t) for t in sys.argv[1:]) or (64, 128)
    results = {}
    for tb in tiles:

        @jax.jit
        def fwd_red(xp, nf, wh, bias, _tb=tb):
            outs, (fc, fh) = lstm_recurrence_trainable(
                xp, nf, wh, bias, False, _tb, False
            )
            return jnp.sum(fh) + jnp.sum(outs[-1])

        def loss(xp, wh, bias, _tb=tb):
            outs, (fc, fh) = lstm_recurrence_trainable(
                xp, nf, wh, bias, False, _tb, False
            )
            return jnp.sum(fh.astype(jnp.float32) ** 2) + jnp.sum(
                outs.astype(jnp.float32) ** 2
            )

        # Reduce ALL grads to scalars INSIDE the jit: in the real train
        # graph dxp feeds the dW_x matmul in the same program, so the
        # f32 [F,B,4H] cotangent is never round-tripped to host. An
        # un-jitted indexing harness materialises it (1.2 GB) and
        # swamps the measurement.
        @jax.jit
        def vjp_red(xp, wh, bias, _tb=tb):
            g = jax.grad(loss, argnums=(0, 1, 2))(xp, wh, bias)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in g)

        # numerical guard: both tilings agree
        base = jax.device_get(fwd_red(xp, nf, wh, bias))
        results[tb] = {
            "fwd_val": float(base),
            "fwd": timed(fwd_red, xp, nf, wh, bias, label=f"tb={tb} fwd"),
            "vjp": timed(vjp_red, xp, wh, bias, label=f"tb={tb} fwd+vjp"),
        }

    if len(tiles) > 1:
        a, b = tiles[0], tiles[-1]
        agree = abs(results[a]["fwd_val"] - results[b]["fwd_val"]) / (
            abs(results[a]["fwd_val"]) + 1e-9
        )
        print(f"fwd value rel-delta {a} vs {b}: {agree:.2e}", flush=True)
        for k in ("fwd", "vjp"):
            r = results[a][k] / results[b][k]
            print(f"{k}: tb{b} is {r:.2f}x vs tb{a}", flush=True)


if __name__ == "__main__":
    main()
