#!/usr/bin/env python
"""Full-serving-step A/B: does chaining Pallas MoE head -> Pallas exact
top-k dodge the approx_max_k-after-Pallas boundary penalty?

Round-2 facts (BENCH_NOTES): the fused MoE head kernel wins in
isolation (2.11 vs 2.88 ms at B=2048, C=4716) but an approx_max_k that
CONSUMES a Pallas-produced buffer runs ~1 ms slower than on an
XLA-produced one, so head-kernel serving regressed and shipped
default-off. exact_topk (Pallas) separately TIED approx_max_k on an
XLA-produced input. Untested combination: Pallas head -> Pallas top-k,
where the boundary penalty may not exist. Four full DBoF serving steps
(uint8 batch -> dequantize -> cluster/pool kernel -> hidden FC -> head
-> top-20), same params, same batches:

    A  XLA head    + approx_max_k   (shipped default, bench.py path)
    B  Pallas head + approx_max_k   (r2 regression, for reference)
    C  Pallas head + exact_topk     (the hypothesis)
    D  XLA head    + exact_topk     (control: r2 said tie)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# The axon site package force-sets JAX_PLATFORMS=axon at import; only a
# config.update wins over it (needed for the interpret-mode CPU smoke).
if os.environ.get("YT8M_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import FLAGSHIP_MODEL, _flagship_hparams
from yt8m_tpu.data.quantize import dequantize
from yt8m_tpu.kernels import pallas_interpret_forced
from yt8m_tpu.kernels.topk import exact_topk
from yt8m_tpu.models import get_model

B = int(os.environ.get("YT8M_BENCH_BATCH", "2048"))
K = 20
STEPS = int(os.environ.get("YT8M_EXP_STEPS", "30"))


def main():
    # moe_head_pallas defaults True since d9fe6d5 — force the XLA-head
    # controls explicitly so A/D stay true controls on reruns.
    hp_x = _flagship_hparams().replace(moe_head_pallas=False)
    if os.environ.get("YT8M_EXP_TINY") == "1":  # CPU interpret smoke
        hp_x = hp_x.replace(dbof_cluster_size=256, dbof_hidden_size=128)
    hp_p = hp_x.replace(moe_head_pallas=True)
    model_x = get_model(FLAGSHIP_MODEL, hp_x)
    model_p = get_model(FLAGSHIP_MODEL, hp_p)

    f, d = hp_x.max_frames, hp_x.feature_dim
    rng = np.random.default_rng(0)
    host_u8 = rng.integers(0, 256, size=(2, f, d), dtype=np.uint8)
    host_nf = rng.integers(30, f + 1, size=(2,)).astype(np.int32)
    variables = model_x.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        dequantize(jnp.asarray(host_u8, jnp.float32)),
        jnp.asarray(host_nf),
        train=False,
    )
    variables = jax.device_put(variables)

    @jax.jit
    def make_batch(key):
        feats = jax.random.randint(
            key, (B, f, d), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
        nf = jax.random.randint(key, (B,), 30, f + 1, dtype=jnp.int32)
        return feats, nf

    def serving_step(model, topk):
        def step(variables, feats_u8, num_frames):
            out = model.apply(
                variables, feats_u8, num_frames,
                train=False, rngs={"sample": jax.random.PRNGKey(2)},
            )
            p = out["predictions"]
            if topk == "approx":
                v, i = jax.lax.approx_max_k(p, K, recall_target=1.0)
            else:
                v, i = exact_topk(p, K, interpret=pallas_interpret_forced())
            return v, i

        return jax.jit(step)

    variants = {
        "A xla_head  + approx": serving_step(model_x, "approx"),
        "B pallas_hd + approx": serving_step(model_p, "approx"),
        "C pallas_hd + exact ": serving_step(model_p, "exact"),
        "D xla_head  + exact ": serving_step(model_x, "exact"),
    }

    batches = [make_batch(jax.random.PRNGKey(i)) for i in range(4)]
    _ = jax.device_get(batches[-1][1])

    # Compile + warm every variant first, then time back-to-back (the
    # axon tunnel shows +-4-7% run-to-run; same-process A/B is the only
    # trustworthy comparison).
    outs = {}
    for name, fn in variants.items():
        outs[name] = jax.device_get(fn(variables, *batches[0]))
        print(f"compiled {name}", flush=True)

    results = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        o = None
        for i in range(STEPS):
            feats, nf = batches[i % len(batches)]
            o = fn(variables, feats, nf)
        _ = jax.device_get(o)
        ms = (time.perf_counter() - t0) / STEPS * 1e3
        results[name] = ms
        print(f"{name}: {ms:8.3f} ms  {B / ms * 1e3:10.0f} videos/s/chip",
              flush=True)

    # Agreement: top-20 index-set overlap vs variant A on batch 0
    # (Pallas head runs the same bf16 matmuls but a different reduction
    # order; near-ties can swap tail ranks — report, don't assert).
    ia = outs["A xla_head  + approx"][1]
    for name, (v, i) in outs.items():
        if name.startswith("A"):
            continue
        same = np.mean([
            len(set(ia[r].tolist()) & set(np.asarray(i)[r].tolist())) / K
            for r in range(0, B, max(1, B // 64))
        ])
        print(f"top-20 set overlap vs A: {name}: {same:.4f}")

    print(json.dumps({k.strip(): round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
