#!/usr/bin/env python
"""On-chip experiments on the LSTM recurrence kernel's per-step cost.

Variants (local copies; production kernel is kernels/lstm.py):
  base    — current kernel
  nogate  — transcendentals replaced by linear ops (measures VPU share;
            WRONG MATH, timing diagnostic only)
  packed  — gates pre-ordered [i,f,o|j] so the nonlinearity is ONE
            sigmoid over 3H + ONE tanh over H (forget bias pre-added)
  dual    — two independent half-tiles per program so Mosaic can
            overlap tile B's MXU dot with tile A's VPU gates
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

F, B, H = 300, 128, 1024
G = 4 * H


def _mk_kernel(mode):
    def kernel(nf_ref, bias_ref, wh_ref, xp_ref, outs_ref, fh_ref, fc_ref,
               h_sc, c_sc, wh_vmem, whsem, *, h_dim, f_steps):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            dma = pltpu.make_async_copy(wh_ref, wh_vmem, whsem)
            dma.start()
            h_sc[...] = jnp.zeros_like(h_sc)
            c_sc[...] = jnp.zeros_like(c_sc)
            dma.wait()

        live = nf_ref[...] > t

        def cell(h, c, xz):
            z = (
                jnp.dot(h.astype(jnp.bfloat16), wh_vmem[...],
                        preferred_element_type=jnp.float32)
                + xz.astype(jnp.float32) + bias_ref[...]
            )
            if mode == "nogate":
                gi = z[:, :h_dim] * 0.25 + 0.5
                gj = z[:, h_dim:2 * h_dim]
                gf = z[:, 2 * h_dim:3 * h_dim] * 0.25 + 0.75
                go = z[:, 3 * h_dim:] * 0.25 + 0.5
                new_c = c * gf + gi * gj
                new_h = new_c * go
            elif mode == "packed":
                # column order [i, f, o, j]; forget bias already +1
                sig = jax.nn.sigmoid(z[:, : 3 * h_dim])
                gj = jnp.tanh(z[:, 3 * h_dim:])
                gi = sig[:, :h_dim]
                gf = sig[:, h_dim:2 * h_dim]
                go = sig[:, 2 * h_dim:]
                new_c = c * gf + gi * gj
                new_h = jnp.tanh(new_c) * go
            else:
                gi = z[:, :h_dim]
                gj = z[:, h_dim:2 * h_dim]
                gf = z[:, 2 * h_dim:3 * h_dim]
                go = z[:, 3 * h_dim:]
                new_c = c * jax.nn.sigmoid(gf + 1.0) + jax.nn.sigmoid(
                    gi) * jnp.tanh(gj)
                new_h = jnp.tanh(new_c) * jax.nn.sigmoid(go)
            return new_h, new_c

        if mode == "dual":
            half = h_sc.shape[0] // 2
            ha, ca = h_sc[:half], c_sc[:half]
            hb, cb = h_sc[half:], c_sc[half:]
            za = (
                jnp.dot(ha.astype(jnp.bfloat16), wh_vmem[...],
                        preferred_element_type=jnp.float32)
                + xp_ref[0, :half].astype(jnp.float32) + bias_ref[...]
            )
            zb = (
                jnp.dot(hb.astype(jnp.bfloat16), wh_vmem[...],
                        preferred_element_type=jnp.float32)
                + xp_ref[0, half:].astype(jnp.float32) + bias_ref[...]
            )

            def gates(z, h, c):
                gi = z[:, :h_dim]
                gj = z[:, h_dim:2 * h_dim]
                gf = z[:, 2 * h_dim:3 * h_dim]
                go = z[:, 3 * h_dim:]
                nc = c * jax.nn.sigmoid(gf + 1.0) + jax.nn.sigmoid(
                    gi) * jnp.tanh(gj)
                nh = jnp.tanh(nc) * jax.nn.sigmoid(go)
                return nh, nc

            nha, nca = gates(za, ha, ca)
            nhb, ncb = gates(zb, hb, cb)
            new_h = jnp.concatenate([nha, nhb], axis=0)
            new_c = jnp.concatenate([nca, ncb], axis=0)
            h = h_sc[...]
            c = c_sc[...]
        else:
            h = h_sc[...]
            c = c_sc[...]
            new_h, new_c = cell(h, c, xp_ref[0])

        new_c = jnp.where(live, new_c, c)
        new_h = jnp.where(live, new_h, h)
        h_sc[...] = new_h
        c_sc[...] = new_c
        outs_ref[0] = new_h.astype(jnp.bfloat16)
        fh_ref[...] = new_h
        fc_ref[...] = new_c

    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def run(xp, nf, wh, bias, mode="base"):
    f, b, g = xp.shape
    h_dim = g // 4
    tb = b
    outs, fh, fc = pl.pallas_call(
        functools.partial(_mk_kernel(mode), h_dim=h_dim, f_steps=f),
        grid=(b // tb, f),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, tb, g), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tb, h_dim), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, h_dim), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, h_dim), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f, b, h_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((b, h_dim), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, h_dim), jnp.float32),
            pltpu.VMEM((tb, h_dim), jnp.float32),
            pltpu.VMEM((h_dim, g), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * f * b * h_dim * g,
            bytes_accessed=f * b * g * 2 + h_dim * g * 2
            + f * b * h_dim * 2,
            transcendentals=4 * f * b * h_dim,
        ),
    )(
        nf.astype(jnp.int32).reshape(-1, 1),
        bias.astype(jnp.float32).reshape(1, -1),
        wh.astype(jnp.bfloat16),
        xp.astype(jnp.bfloat16),
    )
    return outs, fh, fc


def main():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    xp = jax.random.normal(k1, (F, B, G), jnp.float32) * 0.3
    nf = jax.random.randint(k2, (B,), 10, F + 1, dtype=jnp.int32)
    wh = jax.random.normal(k3, (H, G), jnp.float32) * 0.05
    bias = jnp.zeros((G,), jnp.float32)
    _ = jax.device_get(jax.device_put((xp, nf, wh, bias))[1])

    from yt8m_tpu.kernels.lstm import lstm_recurrence

    def timed(label, fn, *a, steps=5, **kw):
        out = fn(*a, **kw)
        _ = jax.device_get(out[1])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*a, **kw)
        _ = jax.device_get(out[1])
        ms = (time.perf_counter() - t0) / steps * 1e3
        print(f"{label:28s} {ms:7.2f} ms  ({ms/F*1e3:5.1f} us/step)")
        return out

    timed("production kernel", lambda *a: lstm_recurrence(*a)[1],
          xp, nf, wh, bias)
    base = timed("base copy", run, xp, nf, wh, bias, mode="base")
    timed("nogate (diagnostic)", run, xp, nf, wh, bias, mode="nogate")
    timed("packed gates", run, xp, nf, wh, bias, mode="packed")
    try:
        dual = timed("dual half-tiles", run, xp, nf, wh, bias, mode="dual")
        print("dual vs base max|dh|:",
              float(jnp.max(jnp.abs(dual[1] - base[1]))))
    except Exception as e:  # VMEM-bound on v5e (concat doubles stack)
        print(f"dual half-tiles: FAIL {type(e).__name__} (VMEM OOM on "
              f"v5e — concatenate doubles the scoped stack)")
    # Findings (r2, on-chip): nogate == base (transcendentals fully
    # hidden); packed no change; per-step cost is per-TIMESTEP (DMA +
    # VPU chain), not per-grid-step — see BENCH_NOTES.


if __name__ == "__main__":
    main()
