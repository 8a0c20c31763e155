"""Pallas flash-attention kernel vs the reference head-gated SDPA semantics.

Runs in interpreter mode on the CPU test platform; the same kernel compiles
natively on TPU (exercised by bench/e2e runs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pruning_tpu.ops.flash_attention import flash_attention


def _reference_sdpa(q, k, v, gate=None):
    """Masked-q/k/v attention exactly as the reference processor does."""
    if gate is not None:
        g = gate[:, None, :, None]
        q, k, v = q * g, k * g, v * g
    return jax.nn.dot_product_attention(q, k, v)


@pytest.mark.parametrize("s_q,s_kv", [(64, 64), (64, 77)])
def test_flash_matches_sdpa_ungated(s_q, s_kv):
    key = jax.random.PRNGKey(0)
    b, h, d = 2, 4, 64
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, s_q, h, d))
    k = jax.random.normal(ks[1], (b, s_kv, h, d))
    v = jax.random.normal(ks[2], (b, s_kv, h, d))
    got = flash_attention(q, k, v, interpret=True)
    want = _reference_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_matches_sdpa_with_soft_gates():
    key = jax.random.PRNGKey(1)
    b, s, h, d = 2, 64, 4, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    gate = jax.random.uniform(ks[3], (b, h))
    got = flash_attention(q, k, v, gate=gate, interpret=True)
    want = _reference_sdpa(q, k, v, gate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_unpacked_inference_odd_heads():
    """h odd packs the even pairs and runs the final head unpacked (SD-2.1's
    320-ch blocks have h=5 at the longest sequence) — this pins the
    pack-evens + concat split against plain SDPA."""
    key = jax.random.PRNGKey(7)
    b, s, h, d = 2, 64, 3, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    gate = jax.random.uniform(ks[3], (b, h))
    got = flash_attention(q, k, v, gate=gate, interpret=True)
    want = _reference_sdpa(q, k, v, gate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_packed_matches_unpacked_inference():
    """The packed-pair kernel must agree with the unpacked kernel exactly
    (same math, different tiling) — cross-attention shapes included."""
    from diffusion_pruning_tpu.ops.flash_attention import (
        _flash_forward, _flash_forward_packed2,
    )
    key = jax.random.PRNGKey(8)
    for s_kv in (64, 77):
        ks = jax.random.split(jax.random.fold_in(key, s_kv), 4)
        b, s, h, d = 2, 64, 4, 64
        q = jax.random.normal(ks[0], (b, s, h, d))
        k = jax.random.normal(ks[1], (b, s_kv, h, d))
        v = jax.random.normal(ks[2], (b, s_kv, h, d))
        gate = jax.random.uniform(ks[3], (b, h))
        packed, _ = _flash_forward_packed2(q, k, v, gate, 512, True)
        h_odd_path = _reference_sdpa(q, k, v, gate)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(h_odd_path),
                                   atol=2e-5, rtol=1e-4)


def test_flash_hard_gate_zeroes_heads():
    key = jax.random.PRNGKey(2)
    b, s, h, d = 1, 64, 4, 64
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    gate = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    got = np.asarray(flash_attention(q, k, v, gate=gate, interpret=True))
    assert np.abs(got[:, :, 1]).max() == 0.0
    assert np.abs(got[:, :, 3]).max() == 0.0
    want = _reference_sdpa(q, k, v, gate)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_multi_qblock_grid():
    key = jax.random.PRNGKey(3)
    b, s, h, d = 1, 256, 2, 64
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    got = flash_attention(q, k, v, block_q=64, interpret=True)
    want = _reference_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_gradients_match_masked_sdpa():
    """Custom VJP: grads through the Pallas forward equal the reference
    masked-SDPA grads, including the head-gate gradient."""
    key = jax.random.PRNGKey(5)
    b, s, h, d = 1, 16, 2, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    gate = jax.random.uniform(ks[3], (b, h)) * 0.8 + 0.1

    def loss_flash(q, k, v, g):
        return (flash_attention(q, k, v, g, 512, True) ** 2).sum()

    def loss_ref(q, k, v, g):
        gg = g[:, None, :, None]
        return (jax.nn.dot_product_attention(q * gg, k * gg, v * gg) ** 2).sum()

    got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, gate)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, gate)
    for g1, g2, name in zip(got, want, "qkvg"):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-4, rtol=1e-3, err_msg=name)


def test_flash_backward_multi_qblock_accumulation():
    """dk/dv accumulate across q-blocks in their output blocks — verify with
    s_q spanning 4 blocks."""
    key = jax.random.PRNGKey(8)
    b, s, h, d = 1, 256, 2, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    gate = jax.random.uniform(ks[3], (b, h)) * 0.8 + 0.1

    def loss_flash(q, k, v, g):
        return (flash_attention(q, k, v, g, 64, True) ** 2).sum()

    def loss_ref(q, k, v, g):
        gg = g[:, None, :, None]
        return (jax.nn.dot_product_attention(q * gg, k * gg, v * gg) ** 2).sum()

    got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, gate)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, gate)
    for g1, g2, name in zip(got, want, "qkvg"):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_flash_backward_cross_attention():
    """Cross-attention (s_q != s_kv) gradients — the dgate reduction must not
    mix the two sequence lengths."""
    key = jax.random.PRNGKey(9)
    b, sq, skv, h, d = 1, 64, 77, 2, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, sq, h, d))
    k = jax.random.normal(ks[1], (b, skv, h, d))
    v = jax.random.normal(ks[2], (b, skv, h, d))
    gate = jax.random.uniform(ks[3], (b, h)) * 0.8 + 0.1

    def loss_flash(q, k, v, g):
        return (flash_attention(q, k, v, g, 512, True) ** 2).sum()

    def loss_ref(q, k, v, g):
        gg = g[:, None, :, None]
        return (jax.nn.dot_product_attention(q * gg, k * gg, v * gg) ** 2).sum()

    got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, gate)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, gate)
    for g1, g2, name in zip(got, want, "qkvg"):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_flash_gradients_odd_heads_packed_split():
    """Training grads with h odd: the even pairs run the PACKED backward,
    the final head the unpacked one, and the concatenated grads must equal
    masked-SDPA exactly (SD-2.1's 320-ch blocks: h=5)."""
    key = jax.random.PRNGKey(11)
    b, s, h, d = 1, 64, 3, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    gate = jax.random.uniform(ks[3], (b, h)) * 0.8 + 0.1

    def loss_flash(q, k, v, g):
        return (flash_attention(q, k, v, g, 512, True) ** 2).sum()

    def loss_ref(q, k, v, g):
        gg = g[:, None, :, None]
        return (jax.nn.dot_product_attention(q * gg, k * gg, v * gg) ** 2).sum()

    got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, gate)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, gate)
    for g1, g2, name in zip(got, want, "qkvg"):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_flash_gradients_packed_multi_qblock_cross():
    """Packed training backward with several q-blocks AND cross-attention
    (s_q != s_kv): per-head lse/delta rows and the accumulated dgate must
    match masked-SDPA."""
    key = jax.random.PRNGKey(12)
    b, sq, skv, h, d = 1, 256, 77, 4, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, sq, h, d))
    k = jax.random.normal(ks[1], (b, skv, h, d))
    v = jax.random.normal(ks[2], (b, skv, h, d))
    gate = jax.random.uniform(ks[3], (b, h)) * 0.8 + 0.1

    def loss_flash(q, k, v, g):
        return (flash_attention(q, k, v, g, 64, True) ** 2).sum()

    def loss_ref(q, k, v, g):
        gg = g[:, None, :, None]
        return (jax.nn.dot_product_attention(q * gg, k * gg, v * gg) ** 2).sum()

    got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, gate)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, gate)
    for g1, g2, name in zip(got, want, "qkvg"):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_tpu_tile_legality_all_sd_shapes():
    """Mosaic requires each block's last two dims to be (8,128)-divisible or
    equal to the array dims. Interpret-mode tests can't catch violations (a
    512px lowering break shipped twice this round) — this mirrors the
    kernels' block/array choices for every SD shape and checks the rule."""
    from diffusion_pruning_tpu.ops.flash_attention import (
        _kv_block, _pick_block, _train_block,
    )

    def legal(block, array):
        for b_, a_, need in ((block[-2], array[-2], 8), (block[-1], array[-1], 128)):
            if b_ % need != 0 and b_ != a_:
                return False
        return True

    D = 64
    shapes = [(s, s) for s in (64, 256, 1024, 4096)] + \
             [(s, 77) for s in (64, 256, 1024, 4096)]
    BH, NQ8 = 80, None
    for s_q, s_kv in shapes:
        blk_t = _train_block(512, s_q, s_kv)
        n_q = -(-s_q // blk_t)
        blk_i = _pick_block(512, s_q, s_kv, live_mats=2)
        blk_kv = _kv_block(512, s_kv, s_q, live_mats=4)
        n_kv = -(-s_kv // blk_kv)
        cases = [
            # forward (training): q/k/v/o blocks + revisited lse
            ((1, blk_t, D), (BH, s_q, D)),
            ((1, s_kv, D), (BH, s_kv, D)),
            ((1, n_q, blk_t), (BH, n_q, blk_t)),
            # forward (inference, unpacked — odd head counts)
            ((1, blk_i, D), (BH, s_q, D)),
            # forward (inference, 2-head packed: dense 128-lane tiles)
            ((1, _pick_block(512, s_q, s_kv, live_mats=4), 2 * D),
             (BH // 2, s_q, 2 * D)),
            ((1, s_kv, 2 * D), (BH // 2, s_kv, 2 * D)),
            # dq kernel: q/do/dq blocks, lse/delta revisited, dgate tile
            ((1, blk_t, D), (BH, s_q, D)),
            ((1, n_q, blk_t), (BH, n_q, blk_t)),
            ((1, 8, 128), (BH, 8, 128)),
            # dkv kernel: full q/do, kv blocks, row lse/delta
            ((1, s_q, D), (BH, s_q, D)),
            ((1, blk_kv, D), (BH, s_kv, D)),
            ((1, 1, s_q), (BH, 1, s_q)),
        ]
        # packed TRAINING kernels (round 3): dense 128-lane q/k/v/do tiles,
        # (1, 2, n_q2, blk2) lse/delta, (1, 2, 8, 128) dgate, (1, 2, s_q) rows
        from diffusion_pruning_tpu.ops.flash_attention import _train_block2
        blk2 = _train_block2(512, s_q, s_kv)
        n_q2 = -(-s_q // blk2)
        blk_kv2 = _kv_block(512, s_kv, s_q, live_mats=5)
        cases += [
            ((1, blk2, 2 * D), (BH // 2, s_q, 2 * D)),
            ((1, s_kv, 2 * D), (BH // 2, s_kv, 2 * D)),
            ((1, 2, n_q2, blk2), (BH // 2, 2, n_q2, blk2)),
            ((1, 2, 8, 128), (BH // 2, 2, 8, 128)),
            ((1, blk_kv2, 2 * D), (BH // 2, s_kv, 2 * D)),
            ((1, 2, s_q), (BH // 2, 2, s_q)),
        ]
        for block, array in cases:
            assert legal(block, array), (s_q, s_kv, block, array)


def test_flash_bf16_native_dots_forward_parity():
    """Round-5 native-dot mode: bf16 inputs feed the MXU directly (f32
    accumulation). Parity vs an all-f32 masked-SDPA golden at bf16-level
    tolerance — covers the packed (h even) and odd-head split paths."""
    key = jax.random.PRNGKey(21)
    for h in (4, 3):
        ks = jax.random.split(jax.random.fold_in(key, h), 4)
        b, s, d = 2, 128, 64
        qf = jax.random.normal(ks[0], (b, s, h, d))
        kf = jax.random.normal(ks[1], (b, s, h, d))
        vf = jax.random.normal(ks[2], (b, s, h, d))
        gate = jax.random.uniform(ks[3], (b, h)) * 0.8 + 0.1
        want = _reference_sdpa(qf, kf, vf, gate)  # f32 golden
        got = flash_attention(qf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16),
                              vf.astype(jnp.bfloat16), gate=gate,
                              interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=3e-2, rtol=3e-2)


def test_flash_bf16_native_dots_grads_track_f32():
    """bf16 training path: grads through the native-dot kernels must track
    the f32 golden directionally (cosine > 0.995 per leaf) and be finite —
    the dgate path included (it trains the hypernet/codebook)."""
    key = jax.random.PRNGKey(22)
    b, s, h, d = 1, 128, 4, 64
    ks = jax.random.split(key, 4)
    qf = jax.random.normal(ks[0], (b, s, h, d))
    kf = jax.random.normal(ks[1], (b, s, h, d))
    vf = jax.random.normal(ks[2], (b, s, h, d))
    gate = jax.random.uniform(ks[3], (b, h)) * 0.8 + 0.1

    def loss_flash(q, k, v, g):
        return (flash_attention(q, k, v, g, 64, True).astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v, g):
        gg = g[:, None, :, None]
        return (jax.nn.dot_product_attention(q * gg, k * gg, v * gg) ** 2).sum()

    got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(
        qf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16),
        vf.astype(jnp.bfloat16), gate)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(qf, kf, vf, gate)
    for g1, g2, name in zip(got, want, "qkvg"):
        a = np.asarray(g1, np.float32).ravel()
        bvec = np.asarray(g2, np.float32).ravel()
        assert np.isfinite(a).all(), name
        cos = float(a @ bvec / (np.linalg.norm(a) * np.linalg.norm(bvec)))
        assert cos > 0.995, (name, cos)


def test_flash_kv_blocked_matches_reference(monkeypatch):
    """Round-5 kv-blocked online-softmax inference kernel: force the
    dispatch at tiny shapes (n_kv=4 kv steps exercises the running
    m/l/acc recurrence across blocks) and pin parity vs masked SDPA,
    gated + ungated, f32 and bf16."""
    from diffusion_pruning_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "_KV_SPLIT", 64)
    monkeypatch.setattr(fa, "_KV_BLK", 32)
    monkeypatch.setattr(fa, "_KV_QBLK", 32)
    key = jax.random.PRNGKey(31)
    b, s, h, d = 2, 128, 4, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    gate = jax.random.uniform(ks[3], (b, h)) * 0.8 + 0.1

    for g in (gate, None):
        got = flash_attention(q, k, v, gate=g, interpret=True)
        want = _reference_sdpa(q, k, v, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    got16 = flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                            v.astype(jnp.bfloat16), gate=gate, interpret=True)
    np.testing.assert_allclose(np.asarray(got16, np.float32),
                               np.asarray(_reference_sdpa(q, k, v, gate)),
                               atol=3e-2, rtol=3e-2)


def test_flash_kv_blocked_odd_heads_and_grad_fallback(monkeypatch):
    """With the kv split enabled: odd head counts still split packed-evens +
    unpacked-last correctly, and the TRAINING path (with_lse) must keep
    using the single-pass kernels (lse layout) — grads stay exact."""
    from diffusion_pruning_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "_KV_SPLIT", 64)
    monkeypatch.setattr(fa, "_KV_BLK", 32)
    monkeypatch.setattr(fa, "_KV_QBLK", 32)
    key = jax.random.PRNGKey(32)
    b, s, h, d = 1, 128, 3, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    gate = jax.random.uniform(ks[3], (b, h)) * 0.8 + 0.1

    got = flash_attention(q, k, v, gate=gate, interpret=True)
    want = _reference_sdpa(q, k, v, gate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    def loss_flash(q, k, v, g):
        return (flash_attention(q, k, v, g, 64, True) ** 2).sum()

    def loss_ref(q, k, v, g):
        gg = g[:, None, :, None]
        return (jax.nn.dot_product_attention(q * gg, k * gg, v * gg) ** 2).sum()

    got_g = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, gate)
    want_g = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, gate)
    for g1, g2, name in zip(got_g, want_g, "qkvg"):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-4, rtol=1e-3, err_msg=name)
