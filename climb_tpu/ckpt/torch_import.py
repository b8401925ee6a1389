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


def load_reference_checkpoint(path: str, allow_pickle: bool = False) -> dict:
    """torch.load a reference checkpoint file and convert it.

    Loads with ``weights_only=True``: checkpoint flags are routinely pointed
    at externally produced files, and a full unpickle of untrusted data is
    arbitrary code execution. State dicts (the only layout the reference
    writes, train_upstream_continual_learning.py:260-267) load fine this way;
    pass ``allow_pickle=True`` only for trusted non-tensor payloads on torch
    versions without weights_only support.
    """
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # torch too old for the weights_only kwarg
        if not allow_pickle:
            raise RuntimeError(
                f"{path}: this torch lacks torch.load(weights_only=True); "
                "refusing to unpickle. Pass allow_pickle=True only if the "
                "file is trusted."
            )
        logger.warning("Unpickling %s without weights_only (trusted opt-in)", path)
        sd = torch.load(path, map_location="cpu")
    if not isinstance(sd, dict):
        raise ValueError(f"{path}: expected a state dict, got {type(sd)}")
    return convert_torch_state_dict(sd)


# ---------------------------------------------------------------------------
# Export (the reverse direction): climb-tpu param tree -> reference torch
# state dict, so checkpoints trained here can be consumed by the reference's
# GPU tooling (its eval_forgetting / Phase II loaders torch.load these,
# train_upstream_continual_learning.py:222-240, train_language.py:278-279).
# ---------------------------------------------------------------------------


def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _unlinear(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(p["kernel"]).T
    sd[f"{prefix}.bias"] = _t(p["bias"])


def _unlayernorm(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(p["scale"])
    sd[f"{prefix}.bias"] = _t(p["bias"])


def _patch_kernel_to_conv(kernel: np.ndarray, channels: int = 3) -> np.ndarray:
    """Dense (ph*pw*C, D) -> HF Conv2d (D, C, ph, pw) — inverse of
    ``conv_kernel_to_patch_kernel`` (flattening order ph, pw, C)."""
    rows, d = kernel.shape
    ph = pw = int(round((rows // channels) ** 0.5))
    assert ph * pw * channels == rows, f"non-square patch kernel: {kernel.shape}"
    return np.ascontiguousarray(
        kernel.reshape(ph, pw, channels, d).transpose(3, 2, 0, 1)
    )


def export_vilt_encoder(enc: dict) -> Dict[str, np.ndarray]:
    """ViltCore params -> HF ViltModel state dict (inverse of import_hf_vilt)."""
    sd: Dict[str, np.ndarray] = {}
    sd["embeddings.text_embeddings.word_embeddings.weight"] = _t(enc["word_embeddings"])
    sd["embeddings.text_embeddings.position_embeddings.weight"] = _t(
        enc["text_position_embeddings"]
    )
    sd["embeddings.text_embeddings.token_type_embeddings.weight"] = _t(
        enc["token_type_embeddings"]
    )
    _unlayernorm(sd, "embeddings.text_embeddings.LayerNorm", enc["text_layernorm"])
    sd["embeddings.cls_token"] = _t(enc["cls_token"])
    sd["embeddings.patch_embeddings.projection.weight"] = _patch_kernel_to_conv(
        _t(enc["patch_projection"]["kernel"])
    )
    sd["embeddings.patch_embeddings.projection.bias"] = _t(enc["patch_projection"]["bias"])
    sd["embeddings.position_embeddings"] = _t(enc["visual_position_embeddings"])[None]
    sd["embeddings.token_type_embeddings.weight"] = _t(enc["modality_type_embeddings"])

    stacked = enc["encoder"]
    num_layers = _t(stacked["q"]["kernel"]).shape[0]
    name_map = {
        "ln1": ("layernorm_before", _unlayernorm),
        "q": ("attention.attention.query", _unlinear),
        "k": ("attention.attention.key", _unlinear),
        "v": ("attention.attention.value", _unlinear),
        "attn_out": ("attention.output.dense", _unlinear),
        "ln2": ("layernorm_after", _unlayernorm),
        "fc1": ("intermediate.dense", _unlinear),
        "fc2": ("output.dense", _unlinear),
    }
    for i in range(num_layers):
        for ours, (theirs, fn) in name_map.items():
            leaf = {k: v[i] for k, v in stacked[ours].items()}
            fn(sd, f"encoder.layer.{i}.{theirs}", leaf)

    _unlayernorm(sd, "layernorm", enc["final_layernorm"])
    _unlinear(sd, "pooler.dense", enc["pooler"])
    return sd


def export_bert_encoder(bert: dict) -> Dict[str, np.ndarray]:
    """BertCore params -> HF BertModel state dict (inverse of import_hf_bert)."""
    sd: Dict[str, np.ndarray] = {}
    sd["embeddings.word_embeddings.weight"] = _t(bert["word_embeddings"])
    sd["embeddings.position_embeddings.weight"] = _t(bert["position_embeddings"])
    sd["embeddings.token_type_embeddings.weight"] = _t(bert["token_type_embeddings"])
    _unlayernorm(sd, "embeddings.LayerNorm", bert["embed_layernorm"])
    stacked = bert["encoder"]
    num_layers = _t(stacked["q"]["kernel"]).shape[0]
    name_map = {
        "q": ("attention.self.query", _unlinear),
        "k": ("attention.self.key", _unlinear),
        "v": ("attention.self.value", _unlinear),
        "attn_out": ("attention.output.dense", _unlinear),
        "attn_ln": ("attention.output.LayerNorm", _unlayernorm),
        "fc1": ("intermediate.dense", _unlinear),
        "fc2": ("output.dense", _unlinear),
        "mlp_ln": ("output.LayerNorm", _unlayernorm),
    }
    for i in range(num_layers):
        for ours, (theirs, fn) in name_map.items():
            leaf = {k: v[i] for k, v in stacked[ours].items()}
            fn(sd, f"encoder.layer.{i}.{theirs}", leaf)
    return sd


def _task_key_for_head(head_name: str) -> str:
    """head_snli_ve -> snli-ve (resolve against the task registry; the
    underscore/dash mapping is otherwise ambiguous)."""
    raw = head_name[len("head_"):]
    try:
        from climb_tpu.configs.task_configs import task_configs

        for key in task_configs:
            if key.replace("-", "_") == raw:
                return key
    except Exception:
        pass
    return raw


def export_heads(tree: dict) -> Dict[str, np.ndarray]:
    """head_* params -> reference task_layer.<task>.<seq_idx>.* tensors."""
    sd: Dict[str, np.ndarray] = {}
    for name, p in tree.items():
        if not name.startswith("head_"):
            continue
        task = _task_key_for_head(name)
        if "fc1" in p:  # classification: Linear(0) LayerNorm(1) GELU(2) Linear(3)
            sd[f"task_layer.{task}.0.weight"] = _t(p["fc1"]["kernel"]).T
            sd[f"task_layer.{task}.0.bias"] = _t(p["fc1"]["bias"])
            sd[f"task_layer.{task}.1.weight"] = _t(p["ln"]["scale"])
            sd[f"task_layer.{task}.1.bias"] = _t(p["ln"]["bias"])
            sd[f"task_layer.{task}.3.weight"] = _t(p["fc2"]["kernel"]).T
            sd[f"task_layer.{task}.3.bias"] = _t(p["fc2"]["bias"])
        else:  # multi-choice: Dropout(0) Linear(1)
            sd[f"task_layer.{task}.1.weight"] = _t(p["fc"]["kernel"]).T
            sd[f"task_layer.{task}.1.bias"] = _t(p["fc"]["bias"])
    return sd


def export_torch_state_dict(tree: dict, kind: str = "model") -> Dict[str, np.ndarray]:
    """climb-tpu param tree -> reference torch state dict (numpy values).

    kind='model'   -> ViltContinualLearner layout (vilt_encoder.vilt.* +
                      task_layer.*; viltbert trees export as
                      viltbert_encoder.{vilt,bert}.*), the '.../model' file.
    kind='encoder' -> encoder-wrapper layout (vilt.* [+ bert.*]), the
                      '.../encoder' file.
    kind='hf'      -> bare HF ViltModel layout (loadable with
                      ViltModel.load_state_dict(strict=True)).
    """
    vb = tree.get("viltbert")
    enc_tree = tree.get("vilt") or (vb or {}).get("vilt")
    if enc_tree is None and "word_embeddings" in tree:
        enc_tree = tree
    if enc_tree is None:
        raise ValueError("no encoder subtree ('vilt'/'viltbert') in param tree")
    enc_sd = export_vilt_encoder(enc_tree)
    bert_sd = export_bert_encoder(vb["bert"]) if vb and "bert" in vb else None

    if kind == "hf":
        return enc_sd
    if kind == "model":
        wrapper = "viltbert_encoder." if bert_sd else "vilt_encoder."
        sd = {f"{wrapper}vilt.{k}": v for k, v in enc_sd.items()}
        if bert_sd:
            sd.update({f"{wrapper}bert.{k}": v for k, v in bert_sd.items()})
        sd.update(export_heads(tree))
        return sd
    assert kind == "encoder", kind
    sd = {f"vilt.{k}": v for k, v in enc_sd.items()}
    if bert_sd:
        sd.update({f"bert.{k}": v for k, v in bert_sd.items()})
    return sd


def save_reference_checkpoint(tree: dict, path: str, kind: str = "model"):
    """Export and torch.save a climb-tpu param tree in reference layout."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(tree, kind).items()}
    torch.save(sd, path)
    logger.info("Exported reference-format torch checkpoint (%s) to %s", kind, path)
