"""CL model construction (parity: reference ``create_vilt_continual_learner_model``
vilt.py:516-546 and ``load_vilt_encoder`` vilt.py:481-514).

Builds the Flax module + parameter tree for an upstream CL run: heads for
every task in the sequence, modality-type expansion when NLVR2 is present
(reference vilt.py:176-177), pretrained HF weights when available (grafted
into the initialized tree via partial_load), sharded onto the mesh.
"""

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from climb_tpu.ckpt.checkpoint import partial_load
from climb_tpu.models import (
    CONTINUAL_LEARNER_REGISTRY,
    ViltConfig,
    ViltContinualLearner,
    head_specs_from_task_configs,
    resolve,
)
from climb_tpu.parallel.mesh import make_mesh
from climb_tpu.parallel.sharding import shard_params
from climb_tpu.train.bundle import CLModel

logger = logging.getLogger(__name__)


def vilt_config_from_args(args, needs_three_modalities: bool) -> ViltConfig:
    kw = dict(
        modality_type_vocab_size=3 if needs_three_modalities else 2,
        dtype=getattr(args, "compute_dtype", "float32"),
        attn_impl=getattr(args, "attn_impl", "xla"),
        mlp_impl=getattr(args, "mlp_impl", "xla"),
        remat=getattr(args, "remat", False),
        remat_policy=getattr(args, "remat_policy", "full"),
        scan_unroll=getattr(args, "scan_unroll", 1),
        fuse_qkv=getattr(args, "fuse_qkv", False),
        dense_impl=getattr(args, "dense_impl", "xla"),
    )
    if getattr(args, "tiny", False):
        kw.update(
            vocab_size=2048, hidden_size=64,
            # overridable for tests that need a divisibility property
            # (e.g. interleaved PP needs L % (stages*virtual) == 0)
            num_layers=getattr(args, "num_layers", 2), num_heads=4,
            intermediate_size=128, image_height=64, image_width=96,
            patch_size=32, pretrain_image_size=64,
        )
    else:
        kw.update(
            image_height=getattr(args, "image_height", 384),
            image_width=getattr(args, "image_width", 640),
        )
    return ViltConfig(**kw)


def dummy_batch(cfg: ViltConfig, batch: int = 2) -> dict:
    return {
        "input_ids": jnp.zeros((batch, cfg.max_text_len), jnp.int32),
        "text_mask": jnp.ones((batch, cfg.max_text_len), jnp.float32),
        "pixel_values": jnp.zeros((batch, cfg.image_height, cfg.image_width, 3), jnp.float32),
        "patch_hw": jnp.ones((batch, 2), jnp.int32),
    }


def create_cl_model(
    args,
    task_configs,
    adapter_handler=None,
    mesh=None,
    seed: Optional[int] = None,
) -> CLModel:
    task_keys = list(args.ordered_cl_tasks)
    head_specs = head_specs_from_task_configs(task_keys, task_configs)
    needs_three = "nlvr2" in task_keys
    cfg = vilt_config_from_args(args, needs_three)

    pp_stages = int(getattr(args, "pp_stages", 0) or 0)
    if pp_stages > 1:
        if getattr(args, "fsdp", False) or getattr(args, "n_model", 1) > 1:
            raise ValueError(
                "--pp_stages composes with data parallelism only; drop "
                "--fsdp/--n_model (the pipeline's shard_map owns the encoder "
                "layout — see docs/SCALING.md)"
            )
        if getattr(args, "dense_impl", "xla") != "xla":
            raise ValueError(
                "--pp_stages does not support int8 dense (no 'quant' "
                "collection threading through the stage schedule)"
            )
        from climb_tpu.parallel.mesh import PIPE_AXIS, make_dp_pp_mesh

        if mesh is None:
            mesh = make_dp_pp_mesh(pp_stages)
        elif PIPE_AXIS not in mesh.axis_names:
            # e.g. --use_mesh built a ('data','model') mesh before the
            # factory ran — fail actionably instead of deep inside device_put
            raise ValueError(
                f"--pp_stages needs a mesh with a '{PIPE_AXIS}' axis "
                f"(got {mesh.axis_names}); drop --use_mesh — --pp_stages "
                f"builds its own ('data','pipe') mesh"
            )
        elif mesh.shape[PIPE_AXIS] != pp_stages:
            raise ValueError(
                f"mesh '{PIPE_AXIS}' axis is {mesh.shape[PIPE_AXIS]} but "
                f"--pp_stages={pp_stages}"
            )
        cfg = cfg.replace(
            pp_stages=pp_stages,
            pp_virtual=int(getattr(args, "pp_virtual", 1) or 1),
            pp_microbatches=int(getattr(args, "pp_microbatches", 0) or 0),
            pp_mesh=mesh,
        )

    learner_cls = resolve(CONTINUAL_LEARNER_REGISTRY, args.encoder_name)
    module = learner_cls(cfg=cfg, head_specs=head_specs)

    model = CLModel(
        module=module, cfg=cfg, head_specs=head_specs, params=None, mesh=mesh
    )
    if adapter_handler is not None:
        model = adapter_handler.add_adapters_to_model(model)
        module = model.module

    key = jax.random.PRNGKey(seed if seed is not None else getattr(args, "seed", 42))
    variables = module.init(key, dummy_batch(cfg), method=type(module).init_all)
    params = variables["params"]
    encoder_key = "viltbert" if args.encoder_name == "viltbert" else "vilt"

    pretrained = getattr(
        args, "pretrained_model_name", getattr(args, "pretrained_vilt_name", "scratch")
    )
    if pretrained not in ("scratch", "", None):
        params = _graft_pretrained(params, pretrained, cfg, needs_three, encoder_key)

    trainable_mask = model.trainable_mask
    if encoder_key == "viltbert":
        # the BERT text side is frozen (reference viltbert.py:115-120)
        from climb_tpu.models.viltbert import viltbert_frozen_mask

        trainable_mask = viltbert_frozen_mask(params, encoder_key)

    if mesh is None and getattr(args, "n_devices", 0):
        mesh = make_mesh(n_model=getattr(args, "n_model", 1))
    if mesh is not None:
        params = shard_params(params, mesh, fsdp=getattr(args, "fsdp", False),
                              pp=pp_stages > 1)
    return CLModel(
        module=module, cfg=cfg, head_specs=head_specs, params=params, mesh=mesh,
        trainable_mask=trainable_mask, encoder_key=encoder_key,
    )


def load_encoder_params(checkpoint_name: str, cfg: ViltConfig,
                        pretrained: str = "dandelin/vilt-b32-mlm", seed: int = 0,
                        encoder_name: str = "vilt"):
    """Encoder-only parameter loading for Phase II drivers.

    Parity: reference ``load_vilt_encoder`` (vilt.py:481-514) and
    ``load_viltbert_encoder`` (viltbert.py:459-493): start from pretrained
    (or random-init) weights, expand modality rows when the upstream
    checkpoint came from an NLVR2-containing run ('nlvr2' in the checkpoint
    path), then load the saved encoder state dict. Here the checkpoint is the
    'encoder' msgpack exported by the Phase I driver (or a reference torch
    save, auto-converted by ``load_params``).

    For ``encoder_name='vilt'`` returns the bare ViltCore subtree; for
    ``'viltbert'`` returns ``{'vilt': ..., 'bert': ...}`` (the ViltBertCore
    layout, BERT frozen by the caller's trainability mask).
    """
    import os

    from climb_tpu.ckpt.checkpoint import load_params
    from climb_tpu.models import ViltCore
    from climb_tpu.models.surgery import expand_modality_type_embeddings

    needs_three = checkpoint_name is not None and "nlvr2" in str(checkpoint_name)
    if needs_three:
        cfg = cfg.replace(modality_type_vocab_size=3)
    batch = dummy_batch(cfg)
    if encoder_name == "viltbert":
        from climb_tpu.models.viltbert import ViltBertCore

        core = ViltBertCore(cfg)
    else:
        core = ViltCore(cfg)
    params = dict(core.init(
        jax.random.PRNGKey(seed),
        batch["input_ids"], batch["text_mask"], batch["pixel_values"], batch["patch_hw"],
    )["params"])

    if pretrained not in ("scratch", "", None):
        try:
            from climb_tpu.models.hf_import import load_pretrained_vilt_params

            enc = load_pretrained_vilt_params(pretrained, cfg)
            if needs_three:
                enc, _ = expand_modality_type_embeddings(
                    enc, cfg.replace(modality_type_vocab_size=2)
                )
            if encoder_name == "viltbert":
                params["vilt"], _, _ = partial_load(params["vilt"], enc)
            else:
                params, _, _ = partial_load(params, enc)
        except Exception as e:
            logger.warning("pretrained %s unavailable (%s); random init", pretrained, e)
    if encoder_name == "viltbert" and pretrained not in ("scratch", "", None):
        try:  # frozen text side: bert-base-uncased (reference viltbert.py:476)
            from transformers import BertModel

            from climb_tpu.models.hf_import import import_hf_bert

            bert = BertModel.from_pretrained("bert-base-uncased", add_pooling_layer=False)
            params["bert"], _, _ = partial_load(
                params["bert"], import_hf_bert(bert.state_dict(), cfg.num_layers)
            )
        except Exception as e:
            logger.warning("bert-base-uncased unavailable (%s); BERT stays random", e)

    if checkpoint_name and os.path.isfile(checkpoint_name):
        ckpt = load_params(checkpoint_name)
        # Normalize the many accepted layouts to this loader's target:
        # our encoder exports (bare core / {'vilt','bert'}), full-model trees,
        # and converted reference torch checkpoints.
        if encoder_name == "viltbert":
            if "viltbert" in ckpt:
                ckpt = ckpt["viltbert"]
            elif "word_embeddings" in ckpt:  # bare ViLT core: graft vilt side
                ckpt = {"vilt": ckpt}
        else:
            if "word_embeddings" not in ckpt:
                if "viltbert" in ckpt:
                    ckpt = ckpt["viltbert"]["vilt"]
                elif "vilt" in ckpt:
                    ckpt = ckpt["vilt"]
        params, loaded, missing = partial_load(params, ckpt)
        logger.info("Encoder checkpoint %s: %d tensors loaded, %d from init",
                    checkpoint_name, len(loaded), len(missing))
    elif checkpoint_name not in (None, "", "scratch"):
        logger.warning("Encoder checkpoint %s not found; using base weights", checkpoint_name)
    return params, cfg


def _graft_pretrained(params, pretrained: str, cfg: ViltConfig, needs_three: bool,
                      encoder_key: str = "vilt"):
    """Load HF pretrained ViLT (and BERT for viltbert) into the encoder subtree."""
    from climb_tpu.models.hf_import import load_pretrained_vilt_params
    from climb_tpu.models.surgery import expand_modality_type_embeddings

    try:
        enc = load_pretrained_vilt_params(pretrained, cfg)
    except Exception as e:
        logger.warning(
            "Could not load pretrained weights %s (%s); training from scratch",
            pretrained, e,
        )
        return params
    if needs_three:
        enc, _ = expand_modality_type_embeddings(
            enc, cfg.replace(modality_type_vocab_size=2)
        )
    out = dict(params)
    if encoder_key == "viltbert":
        sub = dict(params["viltbert"])
        sub["vilt"], loaded, missing = partial_load(sub["vilt"], enc)
        try:  # frozen text side: bert-base-uncased (reference viltbert.py:476)
            from transformers import BertModel

            from climb_tpu.models.hf_import import import_hf_bert

            bert = BertModel.from_pretrained("bert-base-uncased", add_pooling_layer=False)
            sub["bert"], bl, _ = partial_load(
                sub["bert"], import_hf_bert(bert.state_dict(), cfg.num_layers)
            )
            loaded += bl
        except Exception as e:
            logger.warning("bert-base-uncased unavailable (%s); BERT stays random", e)
        out["viltbert"] = sub
    else:
        out["vilt"], loaded, missing = partial_load(params["vilt"], enc)
    logger.info("Pretrained graft: %d tensors loaded, %d kept from init", len(loaded), len(missing))
    return out
