"""Flax bottleneck adapters (per-task, per-layer) for the ViLT encoder.

Replaces the reference's dependency on the GLAMOR-USC adapter-transformers
fork (SURVEY.md section 2.6): the fork patches ``ViltModel.add_adapter`` /
``train_adapter`` / ``set_active_adapters`` into HF transformers; here
adapters are first-class Flax modules declared statically per task inside
each encoder block. Activation is a static module attribute
(``active_adapter``), so each task's train step compiles with exactly one
adapter in the graph — inactive adapters' parameters exist in the pytree (so
checkpoints carry all tasks) but their compute is dead-code-eliminated by XLA.

Supported architectures (cf. ``climb_tpu.configs.adapter_configs.ADAPTER_MAP``):
sequential bottleneck (pfeiffer/houlsby), parallel side-adapter, and
compacter-style PHM-factorized bottleneck.
"""

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from climb_tpu.models.model_config import AdapterSpec

_ACTIVATIONS = {
    "relu": nn.relu,
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "swish": nn.swish,
    "silu": nn.swish,
    "tanh": jnp.tanh,
}


def get_activation(name: str) -> Callable:
    return _ACTIVATIONS[name]


class PHMDense(nn.Module):
    """Parameterized hypercomplex multiplication layer (Compacter).

    W = sum_i A_i (x) B_i  (Kronecker product), with n = phm_dim blocks.
    Parameter count: n * (n*n) + n * (in/n * out/n) << in*out.
    """

    features: int
    phm_dim: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        n = self.phm_dim
        assert in_dim % n == 0 and self.features % n == 0, "PHM dims must divide"
        a = self.param("phm_rule", nn.initializers.normal(0.01), (n, n, n), jnp.float32)
        b = self.param(
            "phm_kernel",
            nn.initializers.normal(0.01),
            (n, in_dim // n, self.features // n),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        # W[n*p + i, n*q + j] handled blockwise: kron(A_k, B_k) summed over k.
        kernel = jnp.einsum("kab,kij->aibj", a, b).reshape(in_dim, self.features)
        return (x @ kernel.astype(self.dtype)) + bias.astype(self.dtype)


class BottleneckAdapter(nn.Module):
    """down-project -> nonlinearity -> up-project, residual handled by caller."""

    spec: AdapterSpec
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bottleneck = max(1, self.hidden_size // self.spec.reduction_factor)
        act = get_activation(self.spec.non_linearity)
        if self.spec.phm:
            h = PHMDense(bottleneck, phm_dim=self.spec.phm_dim, dtype=self.dtype, name="down")(x)
            h = act(h)
            h = PHMDense(self.hidden_size, phm_dim=self.spec.phm_dim, dtype=self.dtype, name="up")(h)
        else:
            h = nn.Dense(
                bottleneck,
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(1e-3),
                name="down",
            )(x)
            h = act(h)
            h = nn.Dense(
                self.hidden_size,
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(1e-3),
                name="up",
            )(h)
        return h


def apply_task_adapters(
    parent: nn.Module,
    x: jnp.ndarray,
    *,
    placement: str,
    spec: AdapterSpec,
    adapter_tasks,
    active_adapter,
    hidden_size: int,
    dtype,
) -> jnp.ndarray:
    """Declare one adapter per task at `placement`, apply only the active one.

    Every task's adapter parameters are always created (init traces all of
    them), but only the active task's output is used — XLA removes the dead
    branches at compile time.
    """
    out = x
    for task in adapter_tasks:
        delta = BottleneckAdapter(
            spec,
            hidden_size,
            dtype=dtype,
            name=f"adapter_{placement}_{_sanitize(task)}",
            parent=parent,
        )(x)
        if task == active_adapter:
            out = x + delta
    return out


class LoRADelta(nn.Module):
    """Low-rank delta for one projection: x @ A @ B * (alpha / rank).

    B initializes to zero, so an untrained LoRA is an exact identity on the
    wrapped projection (the base forward is bit-unchanged until training).
    """

    features: int
    rank: int
    alpha: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "lora_a",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (x.shape[-1], self.rank),
            jnp.float32,
        )
        b = self.param("lora_b", nn.initializers.zeros, (self.rank, self.features), jnp.float32)
        scale = self.alpha / self.rank
        return ((x @ a.astype(self.dtype)) @ b.astype(self.dtype)) * scale


def apply_task_lora(
    parent: nn.Module,
    x: jnp.ndarray,
    y: jnp.ndarray,
    *,
    target: str,
    spec: AdapterSpec,
    adapter_tasks,
    active_adapter,
    dtype,
) -> jnp.ndarray:
    """Add the active task's LoRA delta for projection `target` to its output.

    x is the projection's input, y its base output. Mirrors
    ``apply_task_adapters``: every task's (A, B) pair is declared (init traces
    all of them, checkpoints carry all tasks) but only the active task's delta
    is added — inactive branches are dead code under XLA. Parameter names
    follow the ``adapter_*_{task}`` convention so ``adapter_only_mask`` and
    the adapter checkpoint/export paths treat LoRA identically.
    """
    if target not in spec.lora_targets:
        return y
    out = y
    for task in adapter_tasks:
        delta = LoRADelta(
            y.shape[-1],
            spec.lora_rank,
            spec.lora_alpha,
            dtype=dtype,
            name=f"adapter_lora_{target}_{_sanitize(task)}",
            parent=parent,
        )(x)
        if task == active_adapter:
            out = y + delta
    return out


def _sanitize(task_key: str) -> str:
    return task_key.replace("-", "_")
