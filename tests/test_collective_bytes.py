"""Pin the analytic ICI model to the code (VERDICT r4 weak #6).

BENCH_NOTES' v5e-8 budget tables rest on an analytic claim: under the
manual FSDP train step, per-chip ICI traffic is the all-reduce ring
volume 2*V*(n-1)/n — one all-gather of each sharded leaf on use (fwd)
plus one reduce-scatter of its gradient (the all_gather AD transpose),
with replicated leaves all-reduced and Adam moments/EMA moving ZERO
bytes. These tests lower the REAL manual step on the 8-device CPU mesh
and assert the compiled HLO's collectives match that accounting
byte-for-byte — and that the volume is independent of batch size (the
"B=512 has MORE headroom multi-chip" arithmetic).
"""

import re

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from yt8m_tpu.models import ModelHParams, get_model  # noqa: E402
from yt8m_tpu.parallel import mesh as mesh_lib  # noqa: E402
from yt8m_tpu.train import losses as losses_lib  # noqa: E402
from yt8m_tpu.train.state import (  # noqa: E402
    init_train_state,
    make_optimizer,
)
from yt8m_tpu.train.step import make_train_step  # noqa: E402

C, D = 24, 16

_SHAPE_RE = re.compile(r"(f|bf|s|u)(\d+)\[([\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of all typed array shapes in one HLO result type
    (handles tuples by summing members)."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        bits = int(m.group(2))
        dims = m.group(3)
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * bits // 8
    return total


def _collectives(hlo: str):
    """[(kind, result_bytes)] for every collective op in compiled HLO."""
    out = []
    for line in hlo.splitlines():
        line = line.strip()
        # result type may be a tuple with spaces: "(f32[48]{0}, f32[])"
        m = re.match(
            r"%\S+ = (.+?) (all-gather|reduce-scatter|all-reduce|"
            r"collective-permute|all-to-all)\(",
            line,
        )
        if m:
            out.append((m.group(2), _shape_bytes(m.group(1))))
    return out


def _leaf_bytes(tree):
    return {
        jax.tree_util.keystr(k): int(np.prod(v.shape)) * v.dtype.itemsize
        for k, v in jax.tree_util.tree_leaves_with_path(tree)
    }


def _build(batch_size, fsdp_min_size=64):
    rng = np.random.default_rng(0)
    batch = {
        "features": rng.normal(size=(batch_size, D)).astype(np.float32),
        "labels": (rng.random((batch_size, C)) < 0.3).astype(np.float32),
        "num_frames": np.ones((batch_size,), np.int32),
        "batch_mask": np.ones((batch_size,), np.float32),
    }
    hp = ModelHParams(
        vocab_size=C, feature_dim=D, compute_dtype="float32",
        moe_num_mixtures=2,
    )
    model = get_model("MoeModel", hp)
    tx = make_optimizer(global_batch_size=batch_size)
    state = init_train_state(
        model, jax.random.PRNGKey(0), batch, tx, False, ema=True
    )
    mesh = mesh_lib.make_mesh()
    sh = jax.tree_util.tree_map(lambda _: mesh_lib.replicated(mesh), state)
    psh = mesh_lib.tree_param_shardings(
        state.params, mesh, fsdp_min_size=fsdp_min_size
    )
    sh = sh.replace(
        params=psh,
        opt_state=mesh_lib.tree_param_shardings(
            state.opt_state, mesh, fsdp_min_size=fsdp_min_size
        ),
        ema_params=psh,
    )
    state = jax.device_put(state, sh)
    specs = jax.tree_util.tree_map(lambda s: s.spec, sh)
    step = make_train_step(
        model,
        losses_lib.get_loss("CrossEntropyLoss"),
        ema_decay=0.99,
        mesh=mesh,
        state_specs=specs,
    )
    db = mesh_lib.shard_batch(batch, mesh)
    hlo = (
        step.lower(state, db, jax.random.PRNGKey(7)).compile().as_text()
    )
    param_bytes = _leaf_bytes(state.params)
    spec_tree = {
        jax.tree_util.keystr(k): s
        for k, s in jax.tree_util.tree_leaves_with_path(specs.params)
    }
    sharded = {
        k: v
        for k, v in param_bytes.items()
        if any(ax is not None for ax in spec_tree[k])
    }
    replicated = {
        k: v for k, v in param_bytes.items() if k not in sharded
    }
    return hlo, sharded, replicated, mesh


def test_fsdp_collective_bytes_match_analytic_model():
    hlo, sharded, replicated, mesh = _build(16)
    n = mesh.size
    col = _collectives(hlo)
    assert sharded, "fixture must have FSDP-sharded leaves"
    assert replicated, "fixture must have replicated leaves"

    ag = sorted(b for k, b in col if k == "all-gather")
    rs = sorted(b for k, b in col if k == "reduce-scatter")
    ar = [b for k, b in col if k == "all-reduce"]
    other = [k for k, _ in col if k not in
             ("all-gather", "reduce-scatter", "all-reduce")]
    assert not other, f"unexpected collectives: {other}"

    # one all-gather per sharded leaf, result = the FULL leaf
    assert ag == sorted(sharded.values()), (ag, sharded)
    # one reduce-scatter per sharded leaf, result = the leaf's SHARD
    assert rs == sorted(v // n for v in sharded.values()), (rs, sharded)

    # replicated grads all-reduce their full bytes; everything else in
    # the all-reduce budget is scalar metrics/clip norms (psum).
    # Per-variable clip adds one f32 norm per leaf; loss/label psums a
    # few more scalars.
    repl_total = sum(replicated.values())
    ar_total = sum(ar)
    slack = 4 * (len(sharded) + len(replicated) + 8)  # scalars
    assert repl_total <= ar_total <= repl_total + slack, (
        ar_total,
        repl_total,
    )

    # the headline claim: per-chip ICI volume == the all-reduce ring
    # volume of the FULL gradient, 2*V*(n-1)/n, with Adam moments + EMA
    # contributing ZERO collective bytes. all-gather moves V*(n-1)/n
    # per chip (receives all other shards), reduce-scatter likewise.
    V = sum(sharded.values())
    ring = 2 * V * (n - 1) // n
    measured = (
        sum(b * (n - 1) // n for b in ag)  # gather: receive V*(n-1)/n
        + sum(b * (n - 1) for b in rs)  # scatter: result*(n-1) recv'd
    )
    assert measured == ring, (measured, ring)


def test_fsdp_collective_bytes_independent_of_batch():
    """Doubling the batch must not change one byte of collective
    traffic — the premise of the 'B=512 has MORE multi-chip headroom'
    arithmetic in BENCH_NOTES' budget tables."""
    hlo_a, *_ = _build(16)
    hlo_b, *_ = _build(32)
    assert _collectives(hlo_a) == _collectives(hlo_b)
