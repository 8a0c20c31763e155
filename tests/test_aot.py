"""AOT-persisted serving programs (pipelines/aot.py + ExpertServer.warmup).

Cold-start contract: a first warmup() traces + exports every (expert,
tier) denoise program; a second process (here: a fresh server over the
same checkpoint) loads every artifact without tracing, and serving
results are unchanged. The traced path must also remain a silent
fallback for unseen shapes and unreadable artifacts."""
import numpy as np
import jax
import jax.numpy as jnp

from diffusion_pruning_tpu.pipelines import aot
from diffusion_pruning_tpu.pipelines.expert_server import ExpertServer


def make_server(batch_size=2):
    from test_pipeline import build_tiny_pipeline
    p = build_tiny_pipeline()
    return ExpertServer.from_codebook(
        p, p.unet_params, p.unet.spec, p.unet.cfg, batch_size=batch_size)


def test_warmup_builds_then_loads_and_results_match(tmp_path):
    aot_dir = str(tmp_path / "aot")
    steps, scale = 2, 7.5

    s1 = make_server()
    stats1 = s1.warmup(num_inference_steps=steps, guidance_scale=scale,
                       aot_dir=aot_dir)
    n_programs = len(s1.expert_models) * len(s1.batch_shapes)
    assert stats1 == {"loaded": 0, "built": n_programs}

    # a fresh process over the same checkpoint: every program deserializes
    s2 = make_server()
    stats2 = s2.warmup(num_inference_steps=steps, guidance_scale=scale,
                       aot_dir=aot_dir)
    assert stats2 == {"loaded": n_programs, "built": 0}

    # serving through the AOT programs ≡ serving through traced jits
    cfg = s1.base_pipeline.unet.cfg
    ids = jnp.asarray(jax.random.randint(
        jax.random.PRNGKey(1), (3, cfg.max_text_len), 0, 100))
    neg = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    key = jax.random.PRNGKey(0)
    plain = make_server()   # no warmup: pure traced path
    img_plain, idx_plain = plain.generate(ids, neg, key,
                                          num_inference_steps=steps)
    img_aot, idx_aot = s2.generate(ids, neg, key, num_inference_steps=steps)
    np.testing.assert_array_equal(idx_plain, idx_aot)
    np.testing.assert_allclose(img_plain, img_aot, atol=2e-5)


def test_warmup_hybrid_covers_gated_programs(tmp_path):
    aot_dir = str(tmp_path / "aot")
    s = make_server()
    stats = s.warmup(num_inference_steps=2, hybrid=True, aot_dir=aot_dir)
    n = (len(s.expert_models) + 1) * len(s.batch_shapes)
    assert stats["built"] == n
    s2 = make_server()
    stats2 = s2.warmup(num_inference_steps=2, hybrid=True, aot_dir=aot_dir)
    assert stats2 == {"loaded": n, "built": 0}
    # hybrid serving runs the loaded gated program for the leftovers
    cfg = s2.base_pipeline.unet.cfg
    ids = jnp.asarray(jax.random.randint(
        jax.random.PRNGKey(2), (3, cfg.max_text_len), 0, 100))
    neg = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    imgs, _ = s2.generate(ids, neg, jax.random.PRNGKey(0),
                          num_inference_steps=2, hybrid=True)
    assert np.isfinite(imgs).all()


def test_shape_dispatch_falls_back_on_unseen_shapes():
    """Keys hash the OPERANDS only — the leading params tree is constant
    per pipeline and excluded from the per-call hash (hot-path cost)."""
    calls = {"fallback": 0, "aot": 0}

    def fallback(p, x):
        calls["fallback"] += 1
        return x + 1

    def fake_aot(p, x):
        calls["aot"] += 1
        return x + 1

    d = aot.ShapeDispatch(fallback)
    params = {"w": jnp.zeros((5,))}
    a = jnp.zeros((2, 3))
    d.add((params, a), fake_aot)
    d(params, a)                       # matching operand signature → aot
    d(params, jnp.zeros((4, 3)))       # unseen operand shape → fallback
    assert calls == {"fallback": 1, "aot": 1}


def test_try_load_rejects_garbage(tmp_path):
    p = tmp_path / "bad.jaxpgm"
    p.write_bytes(b"not a program")
    assert aot.try_load(str(p)) is None
    assert aot.try_load(str(tmp_path / "absent.jaxpgm")) is None


def test_warmup_parallel_matches_sequential(tmp_path):
    """Round-5 thread-pooled warmup: parallel=2 must produce the same
    stats and identical serving results as the sequential path, both on
    the build (trace+export) and the restore (load) legs."""
    aot_dir = str(tmp_path / "aot")
    steps = 2

    s1 = make_server()
    stats1 = s1.warmup(num_inference_steps=steps, aot_dir=aot_dir,
                       parallel=2)
    n_programs = len(s1.expert_models) * len(s1.batch_shapes)
    assert stats1 == {"loaded": 0, "built": n_programs}

    s2 = make_server()
    stats2 = s2.warmup(num_inference_steps=steps, aot_dir=aot_dir,
                       parallel=2)
    assert stats2 == {"loaded": n_programs, "built": 0}

    cfg = s1.base_pipeline.unet.cfg
    ids = jnp.asarray(jax.random.randint(
        jax.random.PRNGKey(5), (3, cfg.max_text_len), 0, 100))
    neg = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    key = jax.random.PRNGKey(0)
    plain = make_server()   # no warmup: pure traced path
    img_plain, idx_plain = plain.generate(ids, neg, key,
                                          num_inference_steps=steps)
    img_par, idx_par = s2.generate(ids, neg, key, num_inference_steps=steps)
    np.testing.assert_array_equal(idx_plain, idx_par)
    np.testing.assert_allclose(img_plain, img_par, atol=2e-5)
