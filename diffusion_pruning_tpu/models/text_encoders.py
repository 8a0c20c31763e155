"""Frozen text encoders: CLIP (conditioning) and MPNet (router input).

The reference loads both from HF transformers (trainer.py:706-712: the
SD-2.1 `CLIPTextModel` used for cross-attention conditioning, and
`sentence-transformers/all-mpnet-base-v2` whose mean-pooled embeddings feed
the hypernet — data_utils.py:130-155). These are from-scratch flax
implementations of the same architectures, sized by config so tests run tiny
random versions and converters load the real checkpoints.

CLIP text (SD-2.1 variant): 23-layer post-LN-free pre-LN transformer,
d=1024, 16 heads, GELU MLP, causal mask, learned positions (77), final LN.
MPNet: 12-layer encoder, d=768, relative-position attention bias (32
buckets, shared table across layers, per-head), post-LN, GELU; plus
masked mean pooling.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------- CLIP text

@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: int = 4096
    max_positions: int = 77
    layer_norm_eps: float = 1e-5

    @classmethod
    def sd21(cls) -> "CLIPTextConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
                   intermediate_size=64)


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.max_positions, cfg.hidden_size))
        h = tok + pos[None, :s, :].astype(self.dtype)

        causal = jnp.tril(jnp.ones((s, s), bool))
        for i in range(cfg.num_layers):
            ln1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                               name=f"layers_{i}_ln1")(h)
            q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=f"layers_{i}_q")(ln1)
            k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=f"layers_{i}_k")(ln1)
            v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=f"layers_{i}_v")(ln1)
            hd = cfg.hidden_size // cfg.num_heads
            q = q.reshape(b, s, cfg.num_heads, hd)
            k = k.reshape(b, s, cfg.num_heads, hd)
            v = v.reshape(b, s, cfg.num_heads, hd)
            o = jax.nn.dot_product_attention(q, k, v, mask=causal[None, None])
            o = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                         name=f"layers_{i}_out")(o.reshape(b, s, cfg.hidden_size))
            h = h + o
            ln2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                               name=f"layers_{i}_ln2")(h)
            m = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name=f"layers_{i}_fc1")(ln2)
            m = nn.gelu(m, approximate=False)
            m = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=f"layers_{i}_fc2")(m)
            h = h + m
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="final_layer_norm")(h)


# ---------------------------------------------------------------- MPNet

@dataclasses.dataclass(frozen=True)
class MPNetConfig:
    vocab_size: int = 30527
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 514
    relative_attention_num_buckets: int = 32
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 1

    @classmethod
    def base(cls) -> "MPNetConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "MPNetConfig":
        return cls(vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
                   intermediate_size=64, max_positions=64)


def _relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """MPNet/T5 relative position bucketing (bidirectional)."""
    ret = 0
    n = -relative_position
    num_buckets //= 2
    ret += (n < 0).astype(np.int32) * num_buckets
    n = np.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(n.astype(np.float32) / max_exact + 1e-9) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int32)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    ret += np.where(is_small, n, val_if_large)
    return ret


class MPNetEncoder(nn.Module):
    cfg: MPNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        """Returns token embeddings (B, S, D)."""
        cfg = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="word_embeddings")(input_ids)
        # MPNet position ids: pad_id+1 + cumulative positions of non-pad tokens
        positions = jnp.cumsum(attention_mask, axis=1) * attention_mask + cfg.pad_token_id
        pos = nn.Embed(cfg.max_positions, cfg.hidden_size, dtype=self.dtype,
                       name="position_embeddings")(positions.astype(jnp.int32))
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="embeddings_ln")(tok + pos)

        # shared relative attention bias
        rel = np.arange(s)[None, :] - np.arange(s)[:, None]
        buckets = _relative_position_bucket(rel, cfg.relative_attention_num_buckets)
        bias_table = self.param("relative_attention_bias", nn.initializers.normal(0.02),
                                (cfg.relative_attention_num_buckets, cfg.num_heads))
        bias = bias_table[jnp.asarray(buckets)]          # (S, S, H)
        bias = jnp.transpose(bias, (2, 0, 1))[None]       # (1, H, S, S)
        mask_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9
        attn_bias = (bias + mask_bias).astype(self.dtype)

        hd = cfg.hidden_size // cfg.num_heads
        for i in range(cfg.num_layers):
            q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=f"layers_{i}_q")(h)
            k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=f"layers_{i}_k")(h)
            v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=f"layers_{i}_v")(h)
            q = q.reshape(b, s, cfg.num_heads, hd)
            k = k.reshape(b, s, cfg.num_heads, hd)
            v = v.reshape(b, s, cfg.num_heads, hd)
            o = jax.nn.dot_product_attention(q, k, v, bias=attn_bias)
            o = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                         name=f"layers_{i}_out")(o.reshape(b, s, cfg.hidden_size))
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name=f"layers_{i}_ln1")(h + o)
            m = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name=f"layers_{i}_fc1")(h)
            m = nn.gelu(m, approximate=False)
            m = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=f"layers_{i}_fc2")(m)
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name=f"layers_{i}_ln2")(h + m)
        return h


def mean_pool(token_embeddings: jax.Array, attention_mask: jax.Array) -> jax.Array:
    """Masked mean pooling (data_utils.py:131-136)."""
    m = attention_mask[..., None].astype(token_embeddings.dtype)
    return (token_embeddings * m).sum(axis=1) / jnp.clip(m.sum(axis=1), 1e-9)


# all-mpnet-base-v2's sentence-transformers max_seq_length — the reference's
# router-feature tokenization budget. One static shape so the embed program
# compiles once (dynamic padding would recompile per batch max length).
MPNET_MAX_LEN = 128


def jit_sentence_embed(mpnet):
    """Jitted MPNet sentence embedding: mean-pooled token states. Params are
    an ARGUMENT (closure capture bakes them into the HLO shipped to remote
    compilers); eager apply costs one device round trip per op. Shared by
    filter_dataset (stage-1 routing) and the serving CLI so both tokenize
    and embed identically."""
    return jax.jit(lambda p, ids, mask: mean_pool(
        mpnet.apply({"params": p}, ids, mask), mask))


def clip_pooled_text_features(hidden: jax.Array, input_ids: jax.Array,
                              projection: Optional[jax.Array] = None,
                              eos_token_id: Optional[int] = None) -> jax.Array:
    """CLIP text-side pooling for CLIP-score: the final-LN hidden state at
    the EOS position (HF CLIPTextModel pooled_output semantics — argmax of
    input_ids when eos is the max id, else first eos occurrence), optionally
    through `text_projection` (D, proj_dim). Pairs with the vision tower in
    models/clip_vision.py for a fully native CLIP-score."""
    if eos_token_id is None:
        idx = jnp.argmax(input_ids, axis=-1)
    else:
        is_eos = (input_ids == eos_token_id).astype(jnp.int32)
        idx = jnp.argmax(is_eos, axis=-1)
    pooled = jnp.take_along_axis(hidden, idx[:, None, None].repeat(
        hidden.shape[-1], axis=-1), axis=1)[:, 0]
    if projection is not None:
        pooled = pooled @ projection
    return pooled
