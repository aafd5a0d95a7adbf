#!/usr/bin/env python
"""Headline benchmark: frame-level inference videos/sec/chip.

Baseline target (BASELINE.json :: north_star): >= 10,000 videos/sec/chip
on TPU v5e. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/10000,
   "trials": T, "min": ..., "max": ...}
`value` is the MEDIAN of T (default 5, YT8M_BENCH_TRIALS) independent
timed regions; min/max give the run-to-run band (±4-18% observed under
the axon tunnel across rounds).

Measurement notes:
  * Batches are uint8 [B, 300, 1152] with random num_frames — the exact
    on-device layout the input pipeline delivers (uint8 on the wire,
    dequantize on device; SURVEY.md §6).
  * Batches are generated on device. Under the axon tunnel, host->device
    transfers traverse a network relay, so timing device_put would
    benchmark the tunnel, not the chip; on real v5e the 3.3 GB/s/chip
    host feed is PCIe/DMA (the host-side parser sustains ~0.9 GB/s/core,
    see cpp/yt8m_io.cc + tests).
  * The forward includes on-device top-20 — the full serving step.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_VIDEOS_PER_SEC = 10_000.0


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from __graft_entry__ import FLAGSHIP_MODEL, _flagship_hparams
    from yt8m_tpu.data.quantize import dequantize
    from yt8m_tpu.models import get_model

    hp = _flagship_hparams()
    model = get_model(FLAGSHIP_MODEL, hp)

    batch = int(os.environ.get("YT8M_BENCH_BATCH", "2048"))
    f, d = hp.max_frames, hp.feature_dim
    rng = np.random.default_rng(0)
    host_u8 = rng.integers(0, 256, size=(2, f, d), dtype=np.uint8)
    host_nf = rng.integers(30, f + 1, size=(2,)).astype(np.int32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        dequantize(jnp.asarray(host_u8, jnp.float32)),
        jnp.asarray(host_nf),
        train=False,
    )

    @jax.jit
    def make_batch(key):
        feats = jax.random.randint(
            key, (batch, f, d), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
        nf = jax.random.randint(key, (batch,), 30, f + 1, dtype=jnp.int32)
        return feats, nf

    @jax.jit
    def forward(variables, feats_u8, num_frames):
        # Params as an argument: closed-over params embed as HLO constants
        # and bloat the compile payload (HTTP 413 on constrained relays).
        out = model.apply(
            variables,
            feats_u8,
            num_frames,
            train=False,
            rngs={"sample": jax.random.PRNGKey(2)},
        )
        # Shared serving tail: Pallas exact top-20 on TPU (pairs with
        # the fused MoE head with no boundary penalty), approx_max_k
        # fallback elsewhere — the same dispatch serving uses.
        from yt8m_tpu.kernels.topk import serving_topk

        values, indices = serving_topk(out["predictions"], 20)
        return values, indices

    # Warmup / compile.
    feats, nf = make_batch(jax.random.PRNGKey(0))
    variables = jax.device_put(variables)
    # device_get (not block_until_ready): the warmup must fully finish
    # compiling + executing before the timed region (axon's
    # block_until_ready can return early).
    _ = jax.device_get(forward(variables, feats, nf))

    steps = 30
    trials = int(os.environ.get("YT8M_BENCH_TRIALS", "5"))
    batches = [make_batch(jax.random.PRNGKey(i)) for i in range(4)]
    _ = jax.device_get(batches[-1][1])
    # NB: device_get (not block_until_ready) — the experimental axon
    # platform's block_until_ready can return before execution finishes,
    # inflating throughput. device_get forces a real device->host sync.
    #
    # N trials, median + band: single-best-run headlines over the tunnel's
    # observed ±18% run-to-run spread (BENCH_r01..r04: 174k/153k/189k/156k)
    # cherry-pick by construction (VERDICT r4 weak #1). The headline value
    # is the MEDIAN of `trials` independent timed regions; min/max are
    # reported alongside so any single future capture can be judged
    # against the band instead of a point.
    per_trial = []
    for t in range(trials):
        t0 = time.perf_counter()
        outs = None
        for i in range(steps):
            feats, nf = batches[i % len(batches)]
            outs = forward(variables, feats, nf)
        _ = jax.device_get(outs)
        dt = time.perf_counter() - t0
        per_trial.append(batch * steps / dt)

    per_trial.sort()
    n = len(per_trial)
    median = (
        per_trial[n // 2]
        if n % 2
        else 0.5 * (per_trial[n // 2 - 1] + per_trial[n // 2])
    )
    print(
        json.dumps(
            {
                "metric": "frame_level_inference_videos_per_sec_per_chip",
                "value": round(median, 1),
                "unit": "videos/sec/chip",
                "vs_baseline": round(median / BASELINE_VIDEOS_PER_SEC, 3),
                "trials": n,
                "min": round(per_trial[0], 1),
                "max": round(per_trial[-1], 1),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
