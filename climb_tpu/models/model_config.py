"""Static model configuration for the TPU-native ViLT family.

Mirrors HF ``ViltConfig`` defaults for ``dandelin/vilt-b32-mlm`` (the weights
the reference loads, ``src/modeling/vilt.py:497-500``) plus TPU-specific
fields: a fixed padded image canvas (static shapes for XLA), compute dtype,
and the attention-kernel implementation switch.
"""

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViltConfig:
    # Transformer
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.0
    attention_dropout: float = 0.0
    initializer_range: float = 0.02

    # Text side
    max_text_len: int = 40            # ViLT has only 40 text position slots
    type_vocab_size: int = 2
    pad_token_id: int = 0

    # Image side — fixed canvas (reference pads per-batch dynamically inside
    # ViltProcessor; TPU requires static shapes, so the canvas is fixed and
    # per-sample validity is carried by `patch_hw`).
    patch_size: int = 32
    pretrain_image_size: int = 384    # pretrained pos-embed grid = 384/32 = 12
    image_height: int = 384
    image_width: int = 640
    num_channels: int = 3

    # Modality-type vocabulary: 2 normally, 3 after NLVR2 token-type expansion
    # (reference `expand_modality_type_embeddings`, vilt.py:98-109).
    modality_type_vocab_size: int = 2

    # TPU execution knobs
    dtype: str = "float32"            # compute dtype ("float32" | "bfloat16")
    attn_impl: str = "xla"            # "xla" | "pallas"
    mlp_impl: str = "xla"             # "xla" | "pallas"
    remat: bool = False               # rematerialize encoder blocks
    remat_policy: str = "full"        # "full" | "dots" | "selective"
    scan_unroll: int = 1              # unroll factor for the layer scan
    fuse_qkv: bool = False            # one (D, 3D) GEMM for Q/K/V (params
    #                                   keep the q/k/v checkpoint layout;
    #                                   kernels are concatenated at apply)
    dense_impl: str = "xla"           # "xla" | "int8": int8 MXU matmuls for
    #                                   the serving/eval forward (per-channel
    #                                   weight + dynamic per-row activation
    #                                   scales; honored only when
    #                                   deterministic — training always xla)

    # Pipeline parallelism (parallel/pipeline.py). pp_stages > 1 routes the
    # scanned encoder stack through the GPipe/circular schedule on pp_mesh's
    # 'pipe' axis instead of the layer scan; the checkpoint/param layout is
    # unchanged (stacked leaves, canonical layer order). pp_mesh carries the
    # concrete jax.sharding.Mesh — it is STATIC configuration (hashable,
    # never serialized; ViltConfig is not written to checkpoints).
    pp_stages: int = 0                # 0/1 = off
    pp_virtual: int = 1               # virtual stages per device (circular)
    pp_microbatches: int = 0          # 0 = one microbatch per stage
    pp_mesh: Optional[object] = None  # Mesh with ('data'?, 'pipe') axes

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def pos_grid(self) -> int:
        return self.pretrain_image_size // self.patch_size

    @property
    def grid_h(self) -> int:
        return self.image_height // self.patch_size

    @property
    def grid_w(self) -> int:
        return self.image_width // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_h * self.grid_w

    @property
    def seq_len(self) -> int:
        """Total token count: text + image-CLS + patches."""
        return self.max_text_len + 1 + self.num_patches

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def replace(self, **kw) -> "ViltConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class AdapterSpec:
    """Static description of per-task bottleneck adapters (cf. ADAPTER_MAP).

    With ``lora=True`` the spec instead describes per-task low-rank deltas
    (LoRA) on the named projection kernels; the bottleneck placements
    (``mh_adapter``/``output_adapter``) are unused in that mode.
    """

    mh_adapter: bool = True
    output_adapter: bool = True
    reduction_factor: int = 16
    non_linearity: str = "swish"
    is_parallel: bool = False
    phm: bool = False
    phm_dim: int = 4
    lora: bool = False
    lora_rank: int = 8
    lora_alpha: float = 16.0
    lora_targets: Tuple[str, ...] = ("q", "v")

    @staticmethod
    def from_dict(d: dict) -> "AdapterSpec":
        kw = {k: v for k, v in d.items() if k in {f.name for f in dataclasses.fields(AdapterSpec)}}
        if "lora_targets" in kw:
            kw["lora_targets"] = tuple(kw["lora_targets"])
        return AdapterSpec(**kw)


@dataclasses.dataclass(frozen=True)
class HeadSpec:
    """Static description of a task head (reference vilt.py:179-203)."""

    task_key: str
    model_type: str                   # "classification" | "multi-choice"
    num_labels: int
    num_images: int = 1
    num_choices: Optional[int] = None
    # multi-choice head dropout (reference vilt.py:199-202 hardcodes 0.1);
    # parity tests set 0.0 so cross-framework trajectories are well-defined
    dropout_rate: float = 0.1


def head_specs_from_task_configs(task_keys, task_configs) -> Tuple[HeadSpec, ...]:
    specs = []
    for key in task_keys:
        tc = task_configs[key]
        specs.append(
            HeadSpec(
                task_key=key,
                model_type=tc["model_type"],
                num_labels=tc["num_labels"],
                num_images=tc.get("num_images", 1),
                num_choices=tc.get("num_choices"),
            )
        )
    return tuple(specs)
