#!/usr/bin/env python
"""Attribute kernel-vs-scan divergence: if two kernel runs with different
batch tilings (=> different MXU accumulation orders) diverge as much as
kernel-vs-scan, the difference is bf16 trajectory sensitivity of a
300-step recurrence, not a kernel bug."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from yt8m_tpu.kernels.lstm import (  # noqa: E402
    lstm_recurrence,
    lstm_recurrence_reference,
)


def main():
    F, B, H = 300, 128, 1024
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    xp = jax.random.normal(k1, (F, B, 4 * H), jnp.float32) * 0.3
    nf = jax.random.randint(k2, (B,), 10, F + 1, dtype=jnp.int32)
    wh = jax.random.normal(k3, (H, 4 * H), jnp.float32) * 0.05
    bias = jnp.zeros((4 * H,), jnp.float32)

    _, (fc128, fh128) = lstm_recurrence(xp, nf, wh, bias, tile_b=128)
    _, (fc64, fh64) = lstm_recurrence(xp, nf, wh, bias, tile_b=64)
    _, (fcr, fhr) = lstm_recurrence_reference(xp, nf, wh, bias)
    jax.block_until_ready((fh128, fh64, fhr))

    def stats(a, b, name):
        d = jnp.abs(a - b)
        print(
            f"{name}: max={float(jnp.max(d)):.5f} "
            f"mean={float(jnp.mean(d)):.6f} "
            f"p99={float(jnp.percentile(d, 99)):.5f}",
            flush=True,
        )

    stats(fh128, fh64, "kernel(tb=128) vs kernel(tb=64) fh")
    stats(fh128, fhr, "kernel(tb=128) vs scan          fh")
    stats(fc128, fc64, "kernel(tb=128) vs kernel(tb=64) fc")
    stats(fc128, fcr, "kernel(tb=128) vs scan          fc")


if __name__ == "__main__":
    main()
