"""ExpertServer tiered/continuous batching (VERDICT round 1 #9).

Covers the batch planner math (pure python), utilisation under skewed
expert assignment, and the ServingQueue's cross-submit batching."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_pruning_tpu.pipelines.expert_server import ExpertServer, ServingQueue


def test_plan_batches_math():
    shapes = (1, 2, 4)
    assert ExpertServer.plan_batches(8, shapes) == [(4, 4), (4, 4)]
    assert ExpertServer.plan_batches(5, shapes) == [(4, 4), (1, 1)]
    assert ExpertServer.plan_batches(7, shapes) == [(4, 4), (4, 3)]
    assert ExpertServer.plan_batches(1, shapes) == [(1, 1)]
    assert ExpertServer.plan_batches(2, shapes) == [(2, 2)]
    assert ExpertServer.plan_batches(3, shapes) == [(4, 3)]
    for n in range(1, 20):
        plan = ExpertServer.plan_batches(n, shapes)
        assert sum(real for _, real in plan) == n
        slots = sum(t for t, _ in plan)
        # waste strictly better than fixed-size padding's worst case and
        # bounded by the covering tier
        fixed = ((n + 3) // 4) * 4
        assert n <= slots <= fixed
        assert slots - n < 4


def test_skewed_utilisation_beats_fixed_padding():
    """Skewed assignment [9, 1, 1, 1]: tiered batching wastes ≤ a few slots
    where fixed batch-4 padding would run 50% empty."""
    shapes = (1, 2, 4)
    counts = [9, 1, 1, 1]
    slots = sum(sum(t for t, _ in ExpertServer.plan_batches(c, shapes))
                for c in counts)
    fixed = sum(((c + 3) // 4) * 4 for c in counts)
    assert slots == 12   # 9 → 4+4+1 exact; 1 → 1: zero padded slots here
    assert slots < fixed  # 12 < 24


def test_serving_queue_continuous_batching():
    from test_pipeline import build_tiny_pipeline
    p = build_tiny_pipeline()
    cfg = p.unet.cfg
    spec = p.unet.spec
    server = ExpertServer.from_codebook(p, p.unet_params, spec, cfg, batch_size=4)
    q = ServingQueue(server, num_inference_steps=2)

    k = jax.random.PRNGKey(0)
    ids1 = jnp.asarray(jax.random.randint(jax.random.PRNGKey(1), (3, cfg.max_text_len), 0, 100))
    ids2 = jnp.asarray(jax.random.randint(jax.random.PRNGKey(2), (2, cfg.max_text_len), 0, 100))
    neg = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    r1 = q.submit(ids1, neg)
    r2 = q.submit(ids2, neg)
    assert r1 == [0, 1, 2] and r2 == [3, 4]
    pend = q.pending_per_expert()
    assert sum(pend.values()) == 5

    results = q.flush(k)
    assert sorted(results) == [0, 1, 2, 3, 4]
    vs = p.vae.cfg.spatial_scale
    for img in results.values():
        assert img.shape == (cfg.sample_size * vs, cfg.sample_size * vs, 3)
        assert np.isfinite(img).all()
    # utilisation: slots spent = Σ per-expert tier plans over the pooled set
    expected = sum(sum(t for t, _ in ExpertServer.plan_batches(c, server.batch_shapes))
                   for c in pend.values())
    assert q.last_slots_used == expected
    assert q.pending_per_expert() == {}


def test_serving_queue_hybrid_and_async():
    """Hybrid dispatch: only full largest-tier batches run materialised
    experts; every remainder pools into ONE gated per-prompt-arch batch.
    flush_async returns a Future with the same contract as flush."""
    from test_pipeline import build_tiny_pipeline
    p = build_tiny_pipeline()
    cfg = p.unet.cfg
    server = ExpertServer.from_codebook(p, p.unet_params, p.unet.spec, cfg,
                                        batch_size=4)
    q = ServingQueue(server, num_inference_steps=2, hybrid=True)

    ids = jnp.asarray(jax.random.randint(jax.random.PRNGKey(5), (7, cfg.max_text_len),
                                         0, 100))
    neg = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    rids = q.submit(ids, neg)
    pend = q.pending_per_expert()

    fut = q.flush_async(jax.random.PRNGKey(6))
    results = fut.result(timeout=600)
    assert sorted(results) == sorted(rids)
    vs = p.vae.cfg.spatial_scale
    for img in results.values():
        assert img.shape == (cfg.sample_size * vs, cfg.sample_size * vs, 3)
        assert np.isfinite(img).all()
    # hybrid slot accounting: per-expert full tiers + one pooled tier plan
    # over all remainders
    full = sum((c // 4) * 4 for c in pend.values())
    leftovers = sum(c % 4 for c in pend.values())
    expected = full + (sum(t for t, _ in ExpertServer.plan_batches(
        leftovers, server.batch_shapes)) if leftovers else 0)
    assert q.last_slots_used == expected
    assert q.pending_per_expert() == {}


def test_materialise_jitted_cast_matches_eager():
    """The param_dtype path fuses slice+cast into one jitted program per
    expert (the eager per-leaf version paid ~30 ms tunnel latency × ~1.4k
    dispatches = 86 s/expert at SD-2.1 scale). Values and tree structure
    must match the eager slice-then-cast exactly."""
    from test_pipeline import build_tiny_pipeline
    from diffusion_pruning_tpu.models.unet.pruned import (
        make_expert_plan, slice_expert_params,
    )
    p = build_tiny_pipeline()
    cfg, spec = p.unet.cfg, p.unet.spec
    server = ExpertServer.from_codebook(
        p, p.unet_params, spec, cfg, batch_size=4, param_dtype=jnp.bfloat16)
    codes = (np.asarray(p.quantizer_state["embedding_gs"]) >= 0.5
             ).astype(np.float32)
    for e in range(codes.shape[0]):
        plan = make_expert_plan(spec, codes[e])
        eager = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                             slice_expert_params(p.unet_params, plan))
        got = server.expert_params[e]
        assert jax.tree.structure(got) == jax.tree.structure(eager)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(eager)):
            assert a.dtype == jnp.bfloat16
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_materialise_jitted_cast_finetuned_weights():
    """expert_weights (stage-2 fine-tuned params) take the cast-only jit."""
    from test_pipeline import build_tiny_pipeline
    from diffusion_pruning_tpu.models.unet.pruned import (
        make_expert_plan, slice_expert_params,
    )
    p = build_tiny_pipeline()
    cfg, spec = p.unet.cfg, p.unet.spec
    codes = (np.asarray(p.quantizer_state["embedding_gs"]) >= 0.5
             ).astype(np.float32)
    ft = [jax.tree.map(lambda x: x * 2.0,
                       slice_expert_params(p.unet_params,
                                           make_expert_plan(spec, codes[e])))
          for e in range(codes.shape[0])]
    server = ExpertServer.from_codebook(
        p, p.unet_params, spec, cfg, expert_weights=ft, batch_size=4,
        param_dtype=jnp.bfloat16)
    for e in range(codes.shape[0]):
        expect = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), ft[e])
        for a, b in zip(jax.tree.leaves(server.expert_params[e]),
                        jax.tree.leaves(expect)):
            assert a.dtype == jnp.bfloat16
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
