"""Model surgery as pure pytree transformations.

The reference mutates ``nn.Module`` state in place; in a functional framework
these become parameter-tree transforms returning new trees (+ updated static
config where shapes change):

- ``expand_modality_type_embeddings`` — reference vilt.py:98-109: grow the
  modality-type embedding table 2 -> 3 rows, initializing the new image-2 row
  as a copy of the image-1 row (needed for NLVR2's image-pair inputs).
- ``reallocate_text_image`` — reference vilt.py:57-81: tile the pretrained
  40-slot text position embeddings to a multiple of 40 and shrink the image
  canvas to 128x128 — reallocating sequence budget from image to text for
  long-text tasks (used by the Phase II language driver for max_len > 40,
  train_language.py:80-84).
"""

import math
from typing import Tuple

import jax.numpy as jnp

from climb_tpu.models.model_config import ViltConfig


def _map_named_leaf(tree, leaf_name, fn):
    """Apply fn to every leaf whose dict key == leaf_name, anywhere in tree."""
    if isinstance(tree, dict):
        return {
            k: fn(v) if k == leaf_name else _map_named_leaf(v, leaf_name, fn)
            for k, v in tree.items()
        }
    return tree


def expand_modality_type_embeddings(params, cfg: ViltConfig) -> Tuple[dict, ViltConfig]:
    """(params, cfg with modality_type_vocab_size=2) -> 3-row variant."""
    if cfg.modality_type_vocab_size >= 3:
        return params, cfg

    def expand(table):
        # new image-2 row := copy of image-1 row (reference vilt.py:106-108)
        return jnp.concatenate([table, table[1:2]], axis=0)

    new_params = _map_named_leaf(params, "modality_type_embeddings", expand)
    return new_params, cfg.replace(modality_type_vocab_size=3)


def reallocate_text_image(
    params, cfg: ViltConfig, max_text_len: int, image_size: Tuple[int, int] = (128, 128)
) -> Tuple[dict, ViltConfig]:
    """Grow text position slots (tiled from the pretrained 40) + shrink image."""
    base_len = cfg.max_text_len
    factor = math.ceil(max_text_len / base_len)
    new_len = base_len * factor

    def tile(pos):
        if pos.shape[0] != base_len:
            return pos
        return jnp.tile(pos, (factor, 1))

    new_params = _map_named_leaf(params, "text_position_embeddings", tile)
    new_cfg = cfg.replace(
        max_text_len=new_len,
        image_height=image_size[0],
        image_width=image_size[1],
    )
    return new_params, new_cfg
