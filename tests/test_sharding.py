"""Sharding tests on the virtual 8-device CPU mesh.

Policy (SURVEY.md §4): sharded output must equal single-device output under
the same tolerance regime, for every mesh shape exercised.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPTConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.parallel import mesh as pmesh
from zig_gpt2_tpu.parallel import sharding as psh
from zig_gpt2_tpu import train
from tests.tolerance import assert_logits_close

# 5 heads deliberately does NOT divide tp=4 — exercises head padding
# (the GPT-2 1.5B case: 25 heads on 8 chips).
CFG = GPTConfig(vocab_size=500, context_size=64, n_layers=2, n_heads=5, n_embed=160)


@pytest.fixture(scope="module")
def params():
    return gpt2.init_params(CFG, jax.random.PRNGKey(0))


def test_eight_devices_available():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"


def test_pad_for_tp_is_exact_noop(params):
    """Padded heads + padded vocab must not change any real logit.

    Mathematically the padding contributes exactly zero; numerically the
    changed GEMM shapes change XLA's reduction order, so the check is
    reassociation-tight (measured max |Δ| = 4.8e-7) rather than bitwise.
    """
    padded, cfg2 = psh.pad_for_tp(params, CFG, tp=4)
    assert cfg2.attn_heads == 8 and cfg2.vocab_rows % 4 == 0
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, CFG.vocab_size, (2, 9)))
    base = np.asarray(gpt2.forward(params, tokens, CFG))
    pad = np.asarray(gpt2.forward(padded, tokens, cfg2))
    assert np.abs(pad[..., : CFG.vocab_size] - base).max() < 2e-6
    assert (pad[..., CFG.vocab_size :] < -1e30).all()  # masked tail


def test_prepare_params_sets_spmd_for_dp_only_mesh(params):
    """A dp-only mesh (8x1) still shards batch axes, so prepare_params must
    set config.spmd even though tp == 1 — otherwise dispatch takes the
    single-device Pallas paths over data-sharded operands (which GSPMD
    cannot partition)."""
    mesh = pmesh.make_mesh(8, 1)
    _, cfg = pmesh.prepare_params(params, CFG, mesh)
    assert cfg.spmd and cfg.mesh is mesh


def test_pad_for_tp_idempotent_when_divisible(params):
    p2, c2 = psh.pad_for_tp(params, dataclasses.replace(CFG, n_heads=4, n_embed=128), tp=4)
    # divisible configs pass through (heads 4 % 4 == 0 but vocab 500 % lcm(4,128)…)
    assert c2.attn_heads % 4 == 0 and c2.vocab_rows % 4 == 0


@pytest.mark.parametrize("dp,tp", [(1, 8), (2, 4), (8, 1)])
def test_sharded_forward_matches_single_device(params, dp, tp):
    padded, cfg = psh.pad_for_tp(params, CFG, tp=tp)
    mesh = pmesh.make_mesh(dp, tp)
    sharded = jax.device_put(padded, pmesh.param_shardings(mesh, cfg))
    tokens_np = np.random.default_rng(1).integers(0, CFG.vocab_size, (8, 12))
    base = np.asarray(gpt2.forward(padded, jnp.asarray(tokens_np), cfg))

    tok_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(pmesh.DATA_AXIS, None)
    )
    tokens = jax.device_put(jnp.asarray(tokens_np), tok_sharding)
    fwd = jax.jit(lambda p, t: gpt2.forward(p, t, cfg))
    out = np.asarray(fwd(sharded, tokens))
    assert_logits_close(out, base, msg=f"sharded forward {dp}x{tp}")


def test_sharded_prefill_decode(params):
    """Full inference path (prefill + decode steps) on a 2x4 mesh equals the
    single-device path."""
    dp, tp = 2, 4
    padded, cfg = psh.pad_for_tp(params, CFG, tp=tp)
    mesh = pmesh.make_mesh(dp, tp)
    sharded = jax.device_put(padded, pmesh.param_shardings(mesh, cfg))

    rng = np.random.default_rng(2)
    B, T = 4, 6
    tokens_np = rng.integers(0, CFG.vocab_size, (B, T)).astype(np.int32)
    lengths_np = np.asarray([T] * B, np.int32)

    # Single-device baseline.
    cache0 = gpt2.init_kv_cache(cfg, B, 32)
    cache0, logits0 = gpt2.prefill(padded, cache0, jnp.asarray(tokens_np),
                                   jnp.asarray(lengths_np), cfg)

    # Sharded run.
    cache_sh = jax.device_put(
        gpt2.init_kv_cache(cfg, B, 32), pmesh.cache_shardings(mesh, cfg)
    )
    data_sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(pmesh.DATA_AXIS))
    tok2d_sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(pmesh.DATA_AXIS, None)
    )
    pre = jax.jit(lambda p, c, t, l: gpt2.prefill(p, c, t, l, cfg))
    cache1, logits1 = pre(
        sharded,
        cache_sh,
        jax.device_put(jnp.asarray(tokens_np), tok2d_sh),
        jax.device_put(jnp.asarray(lengths_np), data_sh),
    )
    assert_logits_close(np.asarray(logits1), np.asarray(logits0), msg="sharded prefill")

    step = jax.jit(lambda p, c, t: gpt2.decode_step(p, c, t, cfg))
    tok = jnp.argmax(logits0, -1).astype(jnp.int32)
    tok_sh = jax.device_put(tok, data_sh)
    for i in range(3):
        cache0, l0 = gpt2.decode_step(padded, cache0, tok, cfg)
        cache1, l1 = step(sharded, cache1, tok_sh)
        assert_logits_close(np.asarray(l1), np.asarray(l0), msg=f"sharded decode {i}")
        tok = jnp.argmax(l0, -1).astype(jnp.int32)
        tok_sh = jax.device_put(tok, data_sh)


def test_sharded_train_step_runs_and_learns(params):
    """The full train step jits over a 2x4 mesh and reduces loss on a fixed
    batch (overfit sanity)."""
    dp, tp = 2, 4
    padded, cfg = psh.pad_for_tp(params, CFG, tp=tp)
    mesh = pmesh.make_mesh(dp, tp)
    sharded = jax.device_put(padded, pmesh.param_shardings(mesh, cfg))
    opt = train.make_optimizer(1e-3)
    opt_state = jax.jit(opt.init)(sharded)
    step = train.make_train_step(cfg, opt)

    tokens_np = np.random.default_rng(3).integers(0, CFG.vocab_size, (8, 16))
    tok_sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(pmesh.DATA_AXIS, None)
    )
    tokens = jax.device_put(jnp.asarray(tokens_np), tok_sh)
    losses = []
    p, s = sharded, opt_state
    for _ in range(5):
        p, s, loss = step(p, s, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


class TestQuantizedSharding:
    """Quantized params under TP: specs match the quantized pytree, scale
    groups align with shard boundaries, outputs equal the unsharded run."""

    def test_quantized_params_shard_and_decode(self, rng):
        from zig_gpt2_tpu.quant import quantize as q

        tp = 4
        # Fresh params: the module fixture's leaves may have been donated
        # (deleted) by the train-step tests.
        fresh = gpt2.init_params(CFG, jax.random.PRNGKey(0))
        padded, cfg = psh.pad_for_tp(fresh, CFG, tp)
        assert cfg.spmd
        qparams = q.quantize_params(padded, mode="int8", tp=tp)
        mesh = pmesh.make_mesh(2, tp)
        shardings = pmesh.param_shardings(mesh, cfg, qparams)
        qsharded = jax.device_put(qparams, shardings)  # structure must match

        tokens = jnp.asarray(rng.integers(0, 500, (2, 12)), jnp.int32)
        lengths = jnp.asarray([12, 8], jnp.int32)
        # Unsharded quantized oracle (spmd flag off for the single-device run
        # is irrelevant on CPU — both take the jnp paths).
        cache0 = gpt2.init_kv_cache(cfg, 2, 32)
        cache0, logits0 = gpt2.prefill(qparams, cache0, tokens, lengths, cfg)

        cache = jax.device_put(
            gpt2.init_kv_cache(cfg, 2, 32), pmesh.cache_shardings(mesh, cfg)
        )
        prefill = jax.jit(lambda p, c, t, l: gpt2.prefill(p, c, t, l, cfg))
        cache, logits = prefill(qsharded, cache, tokens, lengths)
        assert_logits_close(np.asarray(logits), np.asarray(logits0))

        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        decode = jax.jit(lambda p, c, t: gpt2.decode_step(p, c, t, cfg))
        cache, logits2 = decode(qsharded, cache, tok)
        cache0, logits02 = gpt2.decode_step(qparams, cache0, tok, cfg)
        assert_logits_close(np.asarray(logits2), np.asarray(logits02))

    def test_tp_aware_group_size(self):
        from zig_gpt2_tpu.quant import quantize as q

        # K=768 row-parallel over tp=8: per-shard K=96 needs G=32.
        assert q.pick_group_size(768, "int8", tp=8) == 32
        assert q.pick_group_size(768, "int8", tp=1) == 128
        assert q.pick_group_size(4096, "int4", tp=8) == 128


def test_seq_parallel_prefill_matches(params):
    """Prefill with sequence-parallel activation sharding (config.
    seq_parallel) must equal the plain TP run exactly — GSPMD only changes
    WHERE the elementwise work runs. (Perf effect needs real multi-chip
    hardware; this pins numerics — SURVEY §2.3 SP row.)"""
    import jax.numpy as jnp

    dp, tp = 2, 4
    # Fresh params: the module fixture's leaves may have been donated
    # (deleted) by the train-step tests.
    fresh = gpt2.init_params(CFG, jax.random.PRNGKey(0))
    padded, cfg = psh.pad_for_tp(fresh, CFG, tp)
    mesh = pmesh.make_mesh(dp, tp)
    cfg = dataclasses.replace(cfg, mesh=mesh)
    cfg_sp = dataclasses.replace(cfg, seq_parallel=True)
    sharded = jax.device_put(padded, pmesh.param_shardings(mesh, cfg))

    rng = np.random.default_rng(7)
    B, T = 4, 16
    tokens_np = rng.integers(0, CFG.vocab_size, (B, T)).astype(np.int32)
    lengths_np = np.asarray([T, T - 3, T - 5, 2], np.int32)
    tok_sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(pmesh.DATA_AXIS, None))
    len_sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(pmesh.DATA_AXIS))
    tokens = jax.device_put(jnp.asarray(tokens_np), tok_sh)
    lengths = jax.device_put(jnp.asarray(lengths_np), len_sh)

    def run(c):
        cache = jax.device_put(
            gpt2.init_kv_cache(c, B, 32), pmesh.cache_shardings(mesh, c))
        cache, logits = jax.jit(
            lambda p, cc, t, l: gpt2.prefill(p, cc, t, l, c)
        )(sharded, cache, tokens, lengths)
        return np.asarray(logits), jax.tree.map(np.asarray, cache)

    logits0, cache0 = run(cfg)
    logits1, cache1 = run(cfg_sp)
    assert_logits_close(logits1, logits0, msg="seq-parallel prefill logits")
    for name in ("k", "v"):
        assert_logits_close(cache1[name], cache0[name],
                            msg=f"seq-parallel cache {name}")


def test_collective_overlap_flags():
    """enable_collective_overlap appends the latency-hiding flags (or
    refuses cleanly after backend init)."""
    import os

    from zig_gpt2_tpu.parallel import distributed as pdist

    before = os.environ.get("XLA_FLAGS", "")
    try:
        # Without opt-in: always a no-op (client XLA builds abort on
        # unknown --xla_tpu_* flags, so defaulting on is unsafe).
        assert pdist.enable_collective_overlap() is False
        assert os.environ.get("XLA_FLAGS", "") == before
        ok = pdist.enable_collective_overlap(force=True)
        if ok:  # backend not yet initialized in this worker
            flags = os.environ["XLA_FLAGS"]
            assert all(f in flags for f in pdist.OVERLAP_FLAGS)
        # idempotent / already-set path never raises
        pdist.enable_collective_overlap(force=True)
    finally:
        os.environ["XLA_FLAGS"] = before
