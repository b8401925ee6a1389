"""ViLT-BERT: ViLT whose language embeddings come from a frozen BERT.

Parity: reference ``src/modeling/viltbert.py`` — the forward computes frozen
BERT outputs (``get_bert_outputs`` under no_grad, viltbert.py:115-120) and
feeds them as ViLT's ``inputs_embeds`` (viltbert.py:135-151); ViLT's own
token-type/position embeddings + LayerNorm still apply on top. Freezing is
expressed functionally: ``lax.stop_gradient`` on the BERT output (zero
gradients) plus a zero trainability mask over the ``bert`` subtree (no
weight-decay drift) — see ``viltbert_frozen_mask``.

Classes mirror the ViLT family: ``ViltBertCore`` (encoder),
``ViltBertContinualLearner`` (viltbert.py:171), and Phase II classifiers via
``ViltBertClassifier`` (viltbert.py:380/424).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from climb_tpu.models.bert import BertConfig, BertCore
from climb_tpu.models.heads import ClassificationHead, MultiChoiceHead
from climb_tpu.models.model_config import AdapterSpec, HeadSpec, ViltConfig
from climb_tpu.models.vilt import ViltClassifier, ViltContinualLearner, _head_for
from climb_tpu.models.vilt_core import ViltCore


class ViltBertCore(nn.Module):
    """BERT(frozen) -> inputs_embeds -> ViLT. Same signature as ViltCore."""

    cfg: ViltConfig
    bert_cfg: Optional[BertConfig] = None
    adapter_spec: Optional[AdapterSpec] = None
    adapter_tasks: Tuple[str, ...] = ()
    active_adapter: Optional[str] = None

    def setup(self):
        bert_cfg = self.bert_cfg or BertConfig(
            vocab_size=self.cfg.vocab_size,
            hidden_size=self.cfg.hidden_size,
            num_layers=self.cfg.num_layers,
            num_heads=self.cfg.num_heads,
            intermediate_size=self.cfg.intermediate_size,
            dtype=self.cfg.dtype,
            attn_impl="xla",
            dense_impl=self.cfg.dense_impl,
        )
        self.bert = BertCore(bert_cfg)
        self.vilt = ViltCore(
            self.cfg,
            adapter_spec=self.adapter_spec,
            adapter_tasks=self.adapter_tasks,
            active_adapter=self.active_adapter,
        )

    def __call__(self, input_ids, text_mask, pixel_values, patch_hw,
                 image_token_type_idx=None, token_type_ids=None, text_embeds=None,
                 deterministic=True):
        if text_embeds is None:
            bert_out = self.bert(
                input_ids, text_mask, token_type_ids, deterministic=True
            )
            text_embeds = jax.lax.stop_gradient(bert_out)
        return self.vilt(
            input_ids, text_mask, pixel_values, patch_hw,
            image_token_type_idx=image_token_type_idx,
            token_type_ids=token_type_ids,
            text_embeds=text_embeds,
            deterministic=deterministic,
        )


class ViltBertContinualLearner(ViltContinualLearner):
    """ViLT-BERT continual learner (reference ViltBertContinualLearner,
    viltbert.py:171) — inherits the forward dispatch; swaps the encoder."""

    bert_cfg: Optional[BertConfig] = None

    def setup(self):
        self.encoder = ViltBertCore(
            self.cfg,
            bert_cfg=self.bert_cfg,
            adapter_spec=self.adapter_spec,
            adapter_tasks=self.adapter_tasks,
            active_adapter=self.active_adapter,
            name="viltbert",
        )
        self.heads = {
            spec.task_key: _head_for(spec, self.cfg.hidden_size, self.cfg.compute_dtype)
            for spec in self.head_specs
        }
        self._spec_by_key = {spec.task_key: spec for spec in self.head_specs}


class ViltBertClassifier(ViltClassifier):
    """Phase II single-head ViLT-BERT classifier (viltbert.py:380/424)."""

    bert_cfg: Optional[BertConfig] = None

    def setup(self):
        self.encoder = ViltBertCore(self.cfg, bert_cfg=self.bert_cfg, name="viltbert")
        dtype = self.cfg.compute_dtype
        if self.model_type == "multi-choice":
            self.head = MultiChoiceHead(dtype=dtype, name="head")
        else:
            self.head = ClassificationHead(
                self.num_labels, self.cfg.hidden_size, dtype=dtype, name="head"
            )


def viltbert_frozen_mask(params, encoder_key: str = "viltbert"):
    """Trainability mask zeroing the frozen BERT subtree (weight decay would
    otherwise drift it; gradients are already cut by stop_gradient)."""

    def mask(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        return jnp.asarray(0.0 if "bert" in names else 1.0, jnp.float32)

    return jax.tree_util.tree_map_with_path(mask, params)
