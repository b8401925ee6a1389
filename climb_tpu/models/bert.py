"""Minimal Flax BERT encoder (the frozen text side of ViLT-BERT).

Parity: HF ``BertModel`` (post-norm transformer) as used by the reference's
ViLT-BERT variant (``src/modeling/viltbert.py:115-120`` — ``get_bert_outputs``
under ``torch.no_grad()``). Only the pieces ViLT-BERT consumes are
implemented: embeddings + encoder stack -> last_hidden_state (no pooler).
Weights import via ``climb_tpu.models.hf_import.import_hf_bert``.
"""

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from climb_tpu.ops.attention import mask_to_bias, multi_head_attention


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.0
    initializer_range: float = 0.02
    dtype: str = "float32"
    attn_impl: str = "xla"
    dense_impl: str = "xla"           # "xla" | "int8" (deterministic only;
    #                                   see climb_tpu.ops.quant)

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class BertLayer(nn.Module):
    cfg: BertConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, mask_bias):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        b, s, d = x.shape
        if cfg.dense_impl in ("int8", "int8_static") and self.deterministic:
            from climb_tpu.models.vilt_core import _DenseParams
            from climb_tpu.ops.quant import module_int8_dense

            def dense(feats, name):
                def f(h):
                    kk, bb = _DenseParams(h.shape[-1], feats, name=name)()
                    return module_int8_dense(
                        self, h, kk, bb, name, cfg.dense_impl, dtype
                    )

                return f
        else:
            dense = lambda feats, name: nn.Dense(feats, dtype=dtype, name=name)

        q = dense(d, "q")(x).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = dense(d, "k")(x).reshape(b, s, cfg.num_heads, cfg.head_dim)
        v = dense(d, "v")(x).reshape(b, s, cfg.num_heads, cfg.head_dim)
        ctx = multi_head_attention(q, k, v, mask_bias, impl=cfg.attn_impl).reshape(b, s, d)
        attn_out = dense(d, "attn_out")(ctx)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="attn_ln")(x + attn_out)

        h = dense(cfg.intermediate_size, "fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = dense(d, "fc2")(h)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="mlp_ln")(x + h)
        return x, None


class BertCore(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None, deterministic=True):
        cfg = self.cfg
        d = cfg.hidden_size
        emb_init = nn.initializers.normal(cfg.initializer_range)
        b, l = input_ids.shape

        word_emb = self.param("word_embeddings", emb_init, (cfg.vocab_size, d), jnp.float32)
        pos_emb = self.param(
            "position_embeddings", emb_init, (cfg.max_position_embeddings, d), jnp.float32
        )
        type_emb = self.param(
            "token_type_embeddings", emb_init, (cfg.type_vocab_size, d), jnp.float32
        )
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = (
            jnp.take(word_emb, input_ids, axis=0)
            + pos_emb[None, :l, :]
            + jnp.take(type_emb, token_type_ids, axis=0)
        )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embed_layernorm")(x)
        x = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(x)

        mask_bias = mask_to_bias(attention_mask, dtype=jnp.float32)
        ScannedLayers = nn.scan(
            BertLayer,
            variable_axes={"params": 0, "quant": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.num_layers,
            in_axes=nn.broadcast,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )
        x = x.astype(cfg.compute_dtype)
        x, _ = ScannedLayers(cfg, deterministic=deterministic, name="encoder")(x, mask_bias)
        return x
