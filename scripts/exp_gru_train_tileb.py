#!/usr/bin/env python
"""tile_b A/B for the trainable GRU recurrence (follow-up to the LSTM
tb=128 win, BENCH_NOTES "Recurrence tiling experiment").

The trainable GRU kernels still default tile_b=64 (gru_train.py), i.e.
M=64 rows per [tb,H]x[H,2H/H] recurrence matmul on a 128-wide MXU and
2x the per-grid-step overheads of tb=128. GRU keeps 3 gate blocks
live vs LSTM's 4, so tb=128's VMEM footprint is LOWER than the LSTM
case that already fits under the raised 20 MB cap. Measures fwd and
fwd+VJP at both tilings with all cotangents reduced inside the jit
(see the LSTM experiment's harness note: materialising the [F,B,3H]
dx cotangent on host swamps the measurement).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from yt8m_tpu.kernels.gru_train import (  # noqa: E402
    gru_recurrence_trainable,
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
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    xg = jax.random.normal(k[0], (F, B, 2 * H), jnp.float32) * 0.3
    xc = jax.random.normal(k[1], (F, B, H), jnp.float32) * 0.3
    nf = jax.random.randint(k[2], (B,), 10, F + 1, dtype=jnp.int32)
    whg = jax.random.normal(k[3], (H, 2 * H), jnp.float32) * 0.05
    whc = jax.random.normal(k[4], (H, H), jnp.float32) * 0.05
    bg = jnp.zeros((2 * H,), jnp.float32)
    bc = jnp.zeros((H,), jnp.float32)
    args = jax.block_until_ready(
        jax.device_put((xg, xc, nf, whg, whc, bg, bc))
    )
    xg, xc, nf, whg, whc, bg, bc = args
    print("data ready", flush=True)

    tiles = tuple(int(t) for t in sys.argv[1:]) or (64, 128)
    results = {}
    for tb in tiles:

        @jax.jit
        def fwd_red(xg, xc, nf, whg, whc, bg, bc, _tb=tb):
            outs, fh = gru_recurrence_trainable(
                xg, xc, nf, whg, whc, bg, bc, False, _tb, False
            )
            return jnp.sum(fh) + jnp.sum(outs[-1])

        def loss(xg, xc, whg, whc, bg, bc, _tb=tb):
            outs, fh = gru_recurrence_trainable(
                xg, xc, nf, whg, whc, bg, bc, False, _tb, False
            )
            return jnp.sum(fh.astype(jnp.float32) ** 2) + jnp.sum(
                outs.astype(jnp.float32) ** 2
            )

        @jax.jit
        def vjp_red(xg, xc, whg, whc, bg, bc, _tb=tb):
            g = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
                xg, xc, whg, whc, bg, bc
            )
            return sum(jnp.sum(x.astype(jnp.float32)) for x in g)

        base = jax.device_get(fwd_red(xg, xc, nf, whg, whc, bg, bc))
        results[tb] = {
            "fwd_val": float(base),
            "fwd": timed(fwd_red, xg, xc, nf, whg, whc, bg, bc,
                         label=f"tb={tb} fwd"),
            "vjp": timed(vjp_red, xg, xc, whg, whc, bg, bc,
                         label=f"tb={tb} fwd+vjp"),
        }

    if len(tiles) > 1:
        a, b = tiles[0], tiles[-1]
        agree = abs(results[a]["fwd_val"] - results[b]["fwd_val"]) / (
            abs(results[a]["fwd_val"]) + 1e-9
        )
        print(f"fwd value rel-delta {a} vs {b}: {agree:.2e}", flush=True)
        for key in ("fwd", "vjp"):
            r = results[a][key] / results[b][key]
            print(f"{key}: tb{b} is {r:.2f}x vs tb{a}", flush=True)


if __name__ == "__main__":
    main()
