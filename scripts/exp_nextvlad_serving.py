#!/usr/bin/env python
"""Fused NeXtVLAD serving kernel A/B: full serving step, fused
aggregation (kernels/nextvlad.py, r3) vs the XLA graph, one process,
back-to-back (the tunnel's +-4-7% makes cross-run comparisons
untrustworthy).

The XLA path materialises xe [B, F, lambda*D] (~1.4 GB f32 at B=512)
plus two [B, F, G, K] tensors in HBM and measured 35.3 ms at B=512
(~4x its matmul roofline; BENCH_NOTES per-family re-baseline). The
fused kernel keeps all of it in VMEM, one program per video.

Env: YT8M_BENCH_BATCH (default 512), YT8M_EXP_STEPS (default 30),
YT8M_FORCE_CPU=1 + YT8M_PALLAS_INTERPRET=1 + YT8M_EXP_TINY=1 smoke.
"""

import json
import os
import sys
import time
from collections import namedtuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("YT8M_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from yt8m_tpu.data.quantize import dequantize
from yt8m_tpu.models import get_model
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.train.step import make_topk_predict_step

_ServeState = namedtuple("_ServeState", ["params", "batch_stats"])

B = int(os.environ.get("YT8M_BENCH_BATCH", "512"))
STEPS = int(os.environ.get("YT8M_EXP_STEPS", "30"))


def main():
    hp = ModelHParams()
    if os.environ.get("YT8M_EXP_TINY") == "1":
        hp = hp.replace(
            vocab_size=64, feature_dim=32, max_frames=16,
            nextvlad_cluster_size=8, nextvlad_hidden_size=32,
        )
    f, d = hp.max_frames, hp.feature_dim
    variants = {
        "xla": hp.replace(nextvlad_use_pallas=False),
        "fused": hp.replace(nextvlad_use_pallas=True),
    }

    rng = np.random.default_rng(0)
    host_u8 = rng.integers(0, 256, size=(2, f, d), dtype=np.uint8)
    host_nf = rng.integers(min(30, f), f + 1, size=(2,)).astype(np.int32)

    @jax.jit
    def make_batch(key):
        feats = jax.random.randint(
            key, (B, f, d), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
        nf = jax.random.randint(
            key, (B,), min(30, f), f + 1, dtype=jnp.int32
        )
        return {"features": feats, "num_frames": nf}

    batches = [make_batch(jax.random.PRNGKey(i)) for i in range(4)]
    _ = jax.device_get(batches[-1]["num_frames"])
    key = jax.random.PRNGKey(2)

    # One param set shared by both variants (same param tree).
    model0 = get_model("NeXtVladModel", variants["xla"])
    variables = model0.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        dequantize(jnp.asarray(host_u8, jnp.float32)),
        jnp.asarray(host_nf),
        train=False,
    )
    state = _ServeState(
        params=jax.device_put(variables["params"]),
        batch_stats=jax.device_put(variables.get("batch_stats", {})),
    )

    steps, outs = {}, {}
    for label, vhp in variants.items():
        model = get_model("NeXtVladModel", vhp)
        steps[label] = make_topk_predict_step(model, 20)
        outs[label] = jax.device_get(steps[label](state, batches[0], key))
        print(f"compiled {label}", flush=True)

    # Numerics: top-20 set overlap between the two paths (bf16
    # reduction-order class expected, like the other fused kernels).
    ov = np.mean([
        len(set(outs["xla"][1][i]) & set(outs["fused"][1][i])) / 20.0
        for i in range(min(B, 256))
    ])
    print(f"top-20 set overlap fused vs xla: {ov:.4f}", flush=True)

    results = {}
    for label in variants:
        fn = steps[label]
        t0 = time.perf_counter()
        o = None
        for i in range(STEPS):
            o = fn(state, batches[i % len(batches)], key)
        _ = jax.device_get(o)
        ms = (time.perf_counter() - t0) / STEPS * 1e3
        results[label] = round(ms, 3)
        print(
            f"{label:6s} {ms:8.3f} ms  {B / ms * 1e3:10.0f} videos/s/chip",
            flush=True,
        )
    results["top20_overlap"] = round(float(ov), 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
