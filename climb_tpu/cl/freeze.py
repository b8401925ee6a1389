"""Trainability masks: the functional form of parameter freezing.

The reference freezes by flipping ``requires_grad`` in place
(``freeze_all_weights`` vilt.py:126-132, ``freeze_bottom_k_layers``
vilt.py:134-144, adapter ``train_adapter``); here freezing is a float mask
pytree (1=train, 0=frozen) multiplied into the optimizer's final updates
(``climb_tpu.train.optimizer.apply_update_mask``) — so frozen parameters get
neither gradient nor weight-decay updates.

Because encoder blocks are nn.scan-stacked (leading layer axis), per-layer
freezing is a (num_layers, 1, ...) broadcastable mask on the stacked leaves —
one mask expresses "freeze bottom k of 12" exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _path_names(path):
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def full_trainable_mask(params):
    """Everything trainable (identity mask)."""
    return jax.tree_util.tree_map(lambda p: jnp.asarray(1.0, jnp.float32), params)


def freeze_encoder_mask(params, encoder_key: str = "vilt"):
    """Train only task heads: everything under `encoder_key` frozen
    (reference freeze_all_weights, vilt.py:126-132)."""

    def mask(path, leaf):
        names = _path_names(path)
        return jnp.asarray(0.0 if encoder_key in names else 1.0, jnp.float32)

    return jax.tree_util.tree_map_with_path(mask, params)


def freeze_bottom_k_layers_mask(params, k: int, num_layers: int, encoder_key: str = "vilt"):
    """Freeze embeddings + bottom-k encoder blocks; train the rest
    (reference freeze_bottom_k_layers, vilt.py:134-144: embeddings and
    encoder.layer[:k] frozen, top layers + pooler + heads trainable)."""
    layer_mask = (np.arange(num_layers) >= k).astype(np.float32)

    def mask(path, leaf):
        names = _path_names(path)
        if encoder_key not in names:
            return jnp.asarray(1.0, jnp.float32)  # heads always train
        if "encoder" in names:
            # stacked leaf: (num_layers, ...) — per-layer mask broadcast
            shape = (num_layers,) + (1,) * (leaf.ndim - 1)
            return jnp.asarray(layer_mask.reshape(shape))
        if names[-1] in ("kernel", "bias", "scale") and (
            "pooler" in names or "final_layernorm" in names
        ):
            return jnp.asarray(1.0, jnp.float32)
        # embeddings (word/pos/type/modality/cls/patch projection): frozen
        return jnp.asarray(0.0, jnp.float32)

    return jax.tree_util.tree_map_with_path(mask, params)


def adapter_only_mask(params, task_key: str, encoder_key: str = "vilt"):
    """Train only `task_key`'s adapters + its head (+ nothing else) —
    the adapter algorithm's activate-for-training semantics
    (reference adapters.py:58-61 -> vilt.train_adapter)."""
    adapter_suffix = task_key.replace("-", "_")
    head_name = f"head_{adapter_suffix}"

    def mask(path, leaf):
        names = _path_names(path)
        if head_name in names:
            return jnp.asarray(1.0, jnp.float32)
        if any(n.startswith("adapter_") and n.endswith(f"_{adapter_suffix}") for n in names):
            return jnp.asarray(1.0, jnp.float32)
        return jnp.asarray(0.0, jnp.float32)

    return jax.tree_util.tree_map_with_path(mask, params)
