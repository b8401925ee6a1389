"""HF -> climb_tpu weight conversion (ViLT and BERT).

The reference loads ``dandelin/vilt-b32-mlm`` through HF transformers
(``src/modeling/vilt.py:481-514``). This module maps an HF ``ViltModel``
state dict onto the ``climb_tpu.models.vilt_core.ViltCore`` parameter tree:
per-layer tensors stack along a leading layer axis (the encoder is an
``nn.scan``), Linear weights transpose (out,in)->(in,out), and the patch
conv kernel reshapes to the conv-as-matmul dense kernel.

Golden parity vs. HF is covered by ``tests/test_vilt_parity.py``.
"""

from typing import Dict

import numpy as np

from climb_tpu.models.model_config import ViltConfig
from climb_tpu.ops.patch_embed import conv_kernel_to_patch_kernel


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _layernorm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _stack(items):
    if isinstance(items[0], dict):
        return {k: _stack([it[k] for it in items]) for k in items[0]}
    return np.stack(items, axis=0)


def import_hf_vilt(state_dict: Dict[str, "np.ndarray"], cfg: ViltConfig) -> dict:
    """HF ViltModel state dict -> ViltCore params (plain nested dict of np)."""
    sd = state_dict
    num_layers = cfg.num_layers

    layers = []
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        layers.append(
            {
                "ln1": _layernorm(sd, f"{p}.layernorm_before"),
                "q": _linear(sd, f"{p}.attention.attention.query"),
                "k": _linear(sd, f"{p}.attention.attention.key"),
                "v": _linear(sd, f"{p}.attention.attention.value"),
                "attn_out": _linear(sd, f"{p}.attention.output.dense"),
                "ln2": _layernorm(sd, f"{p}.layernorm_after"),
                "fc1": _linear(sd, f"{p}.intermediate.dense"),
                "fc2": _linear(sd, f"{p}.output.dense"),
            }
        )

    params = {
        "word_embeddings": _np(sd["embeddings.text_embeddings.word_embeddings.weight"]),
        "text_position_embeddings": _np(
            sd["embeddings.text_embeddings.position_embeddings.weight"]
        ),
        "token_type_embeddings": _np(
            sd["embeddings.text_embeddings.token_type_embeddings.weight"]
        ),
        "text_layernorm": _layernorm(sd, "embeddings.text_embeddings.LayerNorm"),
        "cls_token": _np(sd["embeddings.cls_token"]),
        "patch_projection": {
            "kernel": conv_kernel_to_patch_kernel(
                _np(sd["embeddings.patch_embeddings.projection.weight"])
            ),
            "bias": _np(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "visual_position_embeddings": _np(sd["embeddings.position_embeddings"])[0],
        "modality_type_embeddings": _np(sd["embeddings.token_type_embeddings.weight"]),
        "encoder": _stack(layers),
        "final_layernorm": _layernorm(sd, "layernorm"),
        "pooler": _linear(sd, "pooler.dense"),
    }
    return params


def import_hf_bert(state_dict: Dict[str, "np.ndarray"], num_layers: int) -> dict:
    """HF BertModel state dict -> climb_tpu BertCore params (frozen text side
    of ViLT-BERT, reference viltbert.py:476)."""
    sd = state_dict
    layers = []
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        layers.append(
            {
                "q": _linear(sd, f"{p}.attention.self.query"),
                "k": _linear(sd, f"{p}.attention.self.key"),
                "v": _linear(sd, f"{p}.attention.self.value"),
                "attn_out": _linear(sd, f"{p}.attention.output.dense"),
                "attn_ln": _layernorm(sd, f"{p}.attention.output.LayerNorm"),
                "fc1": _linear(sd, f"{p}.intermediate.dense"),
                "fc2": _linear(sd, f"{p}.output.dense"),
                "mlp_ln": _layernorm(sd, f"{p}.output.LayerNorm"),
            }
        )
    return {
        "word_embeddings": _np(sd["embeddings.word_embeddings.weight"]),
        "position_embeddings": _np(sd["embeddings.position_embeddings.weight"]),
        "token_type_embeddings": _np(sd["embeddings.token_type_embeddings.weight"]),
        "embed_layernorm": _layernorm(sd, "embeddings.LayerNorm"),
        "encoder": _stack(layers),
    }


def load_pretrained_vilt_params(name_or_path: str, cfg: ViltConfig) -> dict:
    """Load + convert HF pretrained ViLT weights (requires cached weights)."""
    from transformers import ViltModel  # deferred: torch import is heavy

    model = ViltModel.from_pretrained(name_or_path, add_pooling_layer=True)
    return import_hf_vilt(model.state_dict(), cfg)
