"""Ingest reference (PyTorch CLiMB) checkpoints into climb-tpu param trees.

The reference saves torch ``state_dict`` pickles per task
(``train_upstream_continual_learning.py:260-267``):

- ``checkpoints/task{i}_{key}/model`` — ``ViltContinualLearner.state_dict()``:
  keys ``vilt_encoder.vilt.*`` (or ``viltbert_encoder.{vilt,bert}.*``) plus
  task heads ``task_layer.<task>.<seq_idx>.{weight,bias}``.
- ``.../encoder`` — the encoder wrapper's state dict: keys ``vilt.*``
  (+ ``bert.*`` for ViLT-BERT, ``viltbert.py:49-52``).

A bare HF ``ViltModel.state_dict()`` (keys ``embeddings.*``,
``encoder.layer.*``) is accepted too. Users migrating from the reference can
point any ``--checkpoint``-style flag at these files directly:
``climb_tpu.ckpt.checkpoint.load_params`` auto-detects torch pickles and
routes them here. The converted tree is merged via ``partial_load`` at every
consumer, so extra/missing keys degrade exactly like the reference's
partial-state-dict fallback (:228-236).

Head layout parity (reference ``add_task_layer``, vilt.py:179-203):
'classification' = ``Sequential(Linear, LayerNorm, GELU, Linear)`` → torch
indices 0, 1, 3; 'multi-choice' = ``Sequential(Dropout, Linear)`` → index 1.
"""

import logging
import re
from types import SimpleNamespace
from typing import Dict

import numpy as np

logger = logging.getLogger(__name__)

_TORCH_ZIP_MAGIC = b"PK\x03\x04"  # torch>=1.6 zipfile serialization
_PICKLE_MAGIC = b"\x80"  # legacy torch pickle protocol marker


def is_torch_checkpoint(path: str) -> bool:
    """True when the file looks like a torch.save artifact (zip or pickle)."""
    try:
        with open(path, "rb") as f:
            head = f.read(4)
    except OSError:
        return False
    return head.startswith(_TORCH_ZIP_MAGIC) or head.startswith(_PICKLE_MAGIC)


def _to_numpy_state_dict(sd) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _strip(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    n = len(prefix)
    return {k[n:]: v for k, v in sd.items() if k.startswith(prefix)}


def _infer_num_layers(sd: Dict[str, np.ndarray]) -> int:
    idx = [
        int(m.group(1))
        for k in sd
        for m in [re.match(r"encoder\.layer\.(\d+)\.", k)]
        if m
    ]
    if not idx:
        raise ValueError("no encoder.layer.N keys found in torch state dict")
    return max(idx) + 1


def _convert_heads(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    """task_layer.<task>.<i>.{weight,bias} → {'head_<task>': flax head params}."""
    by_task: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = re.match(r"task_layer\.([^.]+)\.(\d+)\.(weight|bias)$", k)
        if m:
            by_task.setdefault(m.group(1), {})[f"{m.group(2)}.{m.group(3)}"] = v

    heads = {}
    for task, t in by_task.items():
        name = "head_" + task.replace("-", "_")
        if "3.weight" in t:  # classification: Linear(0), LayerNorm(1), Linear(3)
            heads[name] = {
                "fc1": {"kernel": t["0.weight"].T, "bias": t["0.bias"]},
                "ln": {"scale": t["1.weight"], "bias": t["1.bias"]},
                "fc2": {"kernel": t["3.weight"].T, "bias": t["3.bias"]},
            }
        elif "1.weight" in t:  # multi-choice: Dropout(0), Linear(1)
            heads[name] = {"fc": {"kernel": t["1.weight"].T, "bias": t["1.bias"]}}
        else:
            logger.warning("Unrecognized head layout for task %s: %s", task, sorted(t))
    return heads


def convert_torch_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Reference torch state dict → climb-tpu param-tree fragment.

    Returns a nested dict shaped like our ``params`` (``{'vilt': ...}`` or
    ``{'viltbert': {'vilt': ..., 'bert': ...}}``, plus ``head_*`` subtrees),
    intended for ``partial_load`` into an initialized tree.
    """
    from climb_tpu.models.hf_import import import_hf_bert, import_hf_vilt

    sd = _to_numpy_state_dict(sd)
    keys = sd.keys()

    if any(k.startswith("vilt_encoder.vilt.") for k in keys):
        vilt_sd, bert_sd = _strip(sd, "vilt_encoder.vilt."), None
    elif any(k.startswith("viltbert_encoder.") for k in keys):
        vilt_sd = _strip(sd, "viltbert_encoder.vilt.")
        bert_sd = _strip(sd, "viltbert_encoder.bert.")
    elif any(k.startswith("vilt.") for k in keys):  # encoder-wrapper save
        vilt_sd = _strip(sd, "vilt.")
        bert_sd = _strip(sd, "bert.") or None
    elif any(k.startswith("embeddings.") for k in keys):  # bare HF ViltModel
        vilt_sd, bert_sd = sd, None
    else:
        raise ValueError(
            "unrecognized reference checkpoint layout (no vilt_encoder.*/"
            "viltbert_encoder.*/vilt.*/embeddings.* keys)"
        )

    enc = import_hf_vilt(vilt_sd, SimpleNamespace(num_layers=_infer_num_layers(vilt_sd)))
    if bert_sd:
        bert = import_hf_bert(bert_sd, _infer_num_layers(bert_sd))
        tree = {"viltbert": {"vilt": enc, "bert": bert}}
    else:
        tree = {"vilt": enc}
    tree.update(_convert_heads(sd))
    n_heads = sum(1 for k in tree if k.startswith("head_"))
    logger.info(
        "Converted reference torch checkpoint: %d-layer encoder%s, %d head(s)",
        _infer_num_layers(vilt_sd), " + BERT" if bert_sd else "", n_heads,
    )
    return tree


def load_reference_checkpoint(path: str) -> dict:
    """torch.load a reference checkpoint file and convert it."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if not isinstance(sd, dict):
        raise ValueError(f"{path}: expected a state dict, got {type(sd)}")
    return convert_torch_state_dict(sd)
