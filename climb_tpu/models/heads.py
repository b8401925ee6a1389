"""Task heads (parity: reference ``src/modeling/vilt.py:179-203``)."""

import jax.numpy as jnp
from flax import linen as nn


class ClassificationHead(nn.Module):
    """Linear(768*num_images -> 1536) -> LayerNorm -> GELU -> Linear(-> num_labels).

    Reference ``add_task_layer`` 'classification' branch (vilt.py:190-195).
    """

    num_labels: int
    encoder_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled, deterministic: bool = True):
        hidden = self.encoder_dim * 2
        h = nn.Dense(hidden, dtype=self.dtype, name="fc1")(pooled)
        # eps matches torch nn.LayerNorm's default (the reference head's LN)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.num_labels, dtype=self.dtype, name="fc2")(h)


class MultiChoiceHead(nn.Module):
    """Dropout(0.1) -> Linear(768 -> 1) scoring each choice.

    Reference ``add_task_layer`` 'multi-choice' branch (vilt.py:199-202).
    """

    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled, deterministic: bool = True):
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(pooled)
        return nn.Dense(1, dtype=self.dtype, name="fc")(h)
