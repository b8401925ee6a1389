"""TPU-native Flax ViLT encoder core.

Functional re-design of the reference's HF ``ViltModel`` path
(``src/modeling/vilt.py:30-124`` wraps it; internals in transformers
``modeling_vilt.py``). Numerically equivalent to HF ViLT (golden parity test
in ``tests/test_vilt_parity.py``) but built TPU-first:

- **Static shapes**: images live on a fixed (image_height, image_width)
  canvas; per-sample validity travels as integer ``patch_hw`` (valid patch
  rows/cols) instead of a full pixel mask. The dynamic per-batch padding and
  patch compaction of HF's ``visual_embed`` become a fixed patch grid +
  attention masking — mathematically identical at the pooler output because
  attention is permutation-equivariant and masked tokens are excluded.
- **Conv-as-matmul** patch embedding (one MXU GEMM, ``climb_tpu.ops.patch_embed``).
- **Per-sample position-embedding interpolation** (HF interpolates the 12x12
  pretrained grid to each sample's valid patch dims with align_corners
  bilinear) expressed as two small interpolation-weight matmuls, fully
  jittable and vmapped over the batch.
- **Stacked encoder blocks** via ``nn.scan`` (fast compile, remat-able,
  pipeline-partitionable); attention dispatches to a fused Pallas kernel.
- Multi-image (NLVR2) and multi-choice (VCR) forwards fold into the batch
  axis instead of looping encoder passes (reference vilt.py:263-350).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from climb_tpu.models.adapters import apply_task_adapters, apply_task_lora
from climb_tpu.models.model_config import AdapterSpec, ViltConfig
from climb_tpu.ops.attention import mask_to_bias, multi_head_attention
from climb_tpu.ops.patch_embed import patch_grid_mask, patchify


def _interp_weight_matrix(n_valid: jnp.ndarray, src: int, out_total: int) -> jnp.ndarray:
    """Align-corners bilinear interpolation weights: (out_total, src).

    Row i resamples a length-``src`` signal to length ``n_valid`` at output
    index i (zero for i >= n_valid) — matching
    ``F.interpolate(mode='bilinear', align_corners=True)`` followed by
    right-padding, as in HF ViLT ``visual_embed``.
    """
    i = jnp.arange(out_total, dtype=jnp.float32)
    denom = jnp.maximum(n_valid - 1, 1).astype(jnp.float32)
    t = jnp.where(n_valid > 1, i * (src - 1) / denom, 0.0)
    lo = jnp.clip(jnp.floor(t), 0, src - 1)
    frac = t - lo
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, src - 1)
    eye = jnp.eye(src, dtype=jnp.float32)
    w = eye[lo_i] * (1.0 - frac)[:, None] + eye[hi_i] * frac[:, None]
    return w * (i < n_valid)[:, None]


def interpolate_visual_pos_embed(
    grid: jnp.ndarray, patch_hw: jnp.ndarray, grid_h: int, grid_w: int
) -> jnp.ndarray:
    """Per-sample resample of the pretrained pos grid to valid patch dims.

    grid: (src, src, D) pretrained spatial position embeddings.
    patch_hw: (B, 2) int valid (rows, cols).
    Returns (B, grid_h * grid_w, D), zero outside the valid region.
    """
    src = grid.shape[0]

    def one(hw):
        wh = _interp_weight_matrix(hw[0], src, grid_h)
        ww = _interp_weight_matrix(hw[1], src, grid_w)
        return jnp.einsum("hi,ijd,wj->hwd", wh, grid, ww)

    pos = jax.vmap(one)(patch_hw)
    b = patch_hw.shape[0]
    return pos.reshape(b, grid_h * grid_w, grid.shape[-1])


class _DenseParams(nn.Module):
    """Raw kernel/bias parameters with nn.Dense's pytree layout — lets the
    fused Pallas MLP consume the same checkpoint structure."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features_out,), jnp.float32)
        return kernel, bias


class _LayerNormParams(nn.Module):
    """Raw scale/bias parameters with nn.LayerNorm's pytree layout — lets the
    fused Pallas attention sublayer consume the same checkpoint structure."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class ViltBlock(nn.Module):
    """One pre-norm transformer block (HF ViltLayer semantics).

    x -> LN1 -> MHA -> (+x) -> LN2 -> MLP(GELU) -> (+)
    Optional per-task bottleneck adapters after the attention and/or MLP
    sublayer outputs (before the residual add), per AdapterSpec.
    """

    cfg: ViltConfig
    adapter_spec: Optional[AdapterSpec] = None
    adapter_tasks: Tuple[str, ...] = ()
    active_adapter: Optional[str] = None
    deterministic: bool = True

    def _dense(self, feats, name, deterministic):
        """nn.Dense, or the int8-MXU dense for the serving forward
        (``cfg.dense_impl`` 'int8' = dynamic per-row scales, 'int8_static' =
        calibrated per-tensor scales in the 'quant' variable collection;
        deterministic only — int8 round() has no gradient). Param pytree
        layout is identical in every mode."""
        cfg = self.cfg
        dtype = cfg.compute_dtype
        if cfg.dense_impl in ("int8", "int8_static") and deterministic:
            from climb_tpu.ops.quant import module_int8_dense

            def f(h):
                k, b = _DenseParams(h.shape[-1], feats, name=name)()
                return module_int8_dense(
                    self, h, k, b, name, cfg.dense_impl, dtype
                )

            return f
        return nn.Dense(feats, dtype=dtype, name=name)

    @staticmethod
    def fused_self_remat(cfg, adapter_spec) -> bool:
        """True when the fused_block path manages rematerialization itself:
        the attention sublayer's custom VJP already saves exactly (h, q, k, v)
        and recomputes only the O(S^2) probabilities, so block-level remat
        would just re-run the Pallas kernel in backward to regenerate those
        residuals (+~14% step time, measured). In this mode ViltCore skips
        nn.remat on the block and the MLP sublayer is checkpointed internally
        with save_only_these_names('mlp_fc1') — backward recomputes only
        LN2 + GELU (elementwise; fc1's output is saved, fc2's is DCE'd)."""
        return (
            cfg.attn_impl == "fused_block"
            and cfg.hidden_dropout == 0.0
            and (adapter_spec is None or not (adapter_spec.mh_adapter or adapter_spec.lora))
            and cfg.remat
            and cfg.remat_policy == "selective"
        )

    @nn.compact
    def __call__(self, x, mask_bias):
        cfg = self.cfg
        deterministic = self.deterministic
        dtype = cfg.compute_dtype
        dense = lambda feats, name: self._dense(feats, name, deterministic)

        # --- attention sublayer ---
        spec = self.adapter_spec
        lora_on = spec is not None and spec.lora

        def lora(target, inp, out):
            if not lora_on:
                return out
            return apply_task_lora(
                self, inp, out, target=target, spec=spec,
                adapter_tasks=self.adapter_tasks, active_adapter=self.active_adapter,
                dtype=dtype,
            )

        fused_block_ok = (
            cfg.attn_impl == "fused_block"
            and cfg.hidden_dropout == 0.0
            and (spec is None or not (spec.mh_adapter or spec.lora))
        )
        if fused_block_ok:
            # whole sublayer (LN1 -> QKV -> MHA -> out-proj -> +x) as ONE
            # Pallas kernel; params keep the standard pytree layout
            from climb_tpu.ops.pallas_block import fused_attention_sublayer

            d = x.shape[-1]
            lns, lnb = _LayerNormParams(d, name="ln1")()
            kq, bq = _DenseParams(d, d, name="q")()
            kk, bk = _DenseParams(d, d, name="k")()
            kv, bv = _DenseParams(d, d, name="v")()
            ko, bo = _DenseParams(d, d, name="attn_out")()
            x = fused_attention_sublayer(
                x.astype(dtype), lns, lnb,
                kq.astype(dtype), bq, kk.astype(dtype), bk,
                kv.astype(dtype), bv, ko.astype(dtype), bo,
                mask_bias, num_heads=cfg.num_heads, eps=cfg.layer_norm_eps,
            )
            if ViltBlock.fused_self_remat(cfg, self.adapter_spec):
                mlp = nn.remat(
                    ViltBlock._mlp_sublayer_det,
                    prevent_cse=False,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "mlp_fc1"
                    ),
                )
                return mlp(self, x), None
            return self._mlp_sublayer(x, deterministic), None

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="ln1")(x)
        b, s, d = h.shape
        if cfg.dense_impl == "int8" and deterministic and not cfg.fuse_qkv:
            # quantize LN1's output ONCE and reuse it for the q/k/v GEMMs —
            # the dynamic-quant passes over the activation, not the int8
            # matmuls, dominate the int8 path's overhead
            from climb_tpu.ops.quant import int8_dense_prequant, quantize_per_row

            hq, hs = quantize_per_row(h)
            qkv = []
            for name in ("q", "k", "v"):
                kk, bb = _DenseParams(d, d, name=name)()
                y = int8_dense_prequant(hq, hs, kk, bb, dtype)
                qkv.append(lora(name, h, y).reshape(b, s, cfg.num_heads, cfg.head_dim))
            q, k, v = qkv
        elif cfg.fuse_qkv:
            # One (D, 3D) GEMM instead of three (D, D) GEMMs. Parameters keep
            # the q/k/v pytree layout (checkpoint/freeze/TP-spec compatible);
            # the concatenated kernel is materialized by XLA outside the step's
            # hot loop (weights are loop-invariant under scan unrolling).
            kq, bq = _DenseParams(d, d, name="q")()
            kk, bk = _DenseParams(d, d, name="k")()
            kv, bv = _DenseParams(d, d, name="v")()
            wqkv = jnp.concatenate([kq, kk, kv], axis=1).astype(dtype)
            bqkv = jnp.concatenate([bq, bk, bv]).astype(dtype)
            qkv = (h @ wqkv + bqkv).reshape(b, s, 3, cfg.num_heads, cfg.head_dim)
            q, k, v = (
                lora(n, h, qkv[:, :, i].reshape(b, s, d)).reshape(
                    b, s, cfg.num_heads, cfg.head_dim
                )
                for i, n in enumerate(("q", "k", "v"))
            )
        else:
            q = lora("q", h, dense(d, "q")(h)).reshape(b, s, cfg.num_heads, cfg.head_dim)
            k = lora("k", h, dense(d, "k")(h)).reshape(b, s, cfg.num_heads, cfg.head_dim)
            v = lora("v", h, dense(d, "v")(h)).reshape(b, s, cfg.num_heads, cfg.head_dim)
        ctx = multi_head_attention(q, k, v, mask_bias, impl=cfg.attn_impl)
        ctx = ctx.reshape(b, s, d)
        attn_out = lora("attn_out", ctx, dense(d, "attn_out")(ctx))
        attn_out = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(attn_out)
        if self.adapter_spec is not None and self.adapter_spec.mh_adapter:
            attn_out = apply_task_adapters(
                self, attn_out, placement="attn", spec=self.adapter_spec,
                adapter_tasks=self.adapter_tasks, active_adapter=self.active_adapter,
                hidden_size=d, dtype=dtype,
            )
        x = x + attn_out
        return self._mlp_sublayer(x, deterministic), None

    def _mlp_sublayer_det(self, x):
        """Deterministic MLP sublayer for the self-remat path (safe: the
        fused path is gated on hidden_dropout == 0.0, where flax Dropout is
        an identity regardless of `deterministic`)."""
        return self._mlp_sublayer(x, True)

    def _mlp_sublayer(self, x, deterministic):
        """LN2 -> MLP(GELU) -> dropout [-> adapter] -> +x. Shares the compact
        context of __call__, so parameter names/layout are identical across
        the fused and standard attention paths."""
        cfg = self.cfg
        dtype = cfg.compute_dtype
        d = x.shape[-1]
        dense = lambda feats, name: self._dense(feats, name, deterministic)
        spec = self.adapter_spec
        lora_on = spec is not None and spec.lora

        def lora(target, inp, out):
            if not lora_on:
                return out
            return apply_task_lora(
                self, inp, out, target=target, spec=spec,
                adapter_tasks=self.adapter_tasks, active_adapter=self.active_adapter,
                dtype=dtype,
            )

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="ln2")(x)
        h = checkpoint_name(h, "mlp_ln2")
        mlp_in = h
        mlp_lora = lora_on and ({"fc1", "fc2"} & set(spec.lora_targets))
        if cfg.mlp_impl == "pallas" and not mlp_lora:
            from climb_tpu.ops.pallas_mlp import fused_mlp

            k1, b1 = _DenseParams(d, cfg.intermediate_size, name="fc1")()
            k2, b2 = _DenseParams(cfg.intermediate_size, d, name="fc2")()
            h = fused_mlp(
                h.astype(dtype), k1.astype(dtype), b1.astype(dtype),
                k2.astype(dtype), b2.astype(dtype),
            )
        else:
            h = lora("fc1", h, dense(cfg.intermediate_size, "fc1")(h))
            # named so the fused_self_remat MLP checkpoint saves these
            # activations; backward then recomputes nothing in the MLP
            h = checkpoint_name(h, "mlp_fc1")
            h = nn.gelu(h, approximate=False)  # HF 'gelu' is exact erf GELU
            h = checkpoint_name(h, "mlp_gelu")
            h = lora("fc2", h, dense(d, "fc2")(h))
        h = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(h)
        if self.adapter_spec is not None and self.adapter_spec.output_adapter:
            adapter_input = mlp_in if self.adapter_spec.is_parallel else h
            delta_base = apply_task_adapters(
                self, adapter_input, placement="mlp", spec=self.adapter_spec,
                adapter_tasks=self.adapter_tasks, active_adapter=self.active_adapter,
                hidden_size=d, dtype=dtype,
            )
            h = h + (delta_base - adapter_input) if self.adapter_spec.is_parallel else delta_base
        return x + h


def _remat_policy(cfg):
    """jax.checkpoint policy for the configured remat_policy name."""
    if cfg.remat_policy == "dots":
        # Save only batch-dim-free GEMM outputs (the dense matmuls); the
        # O(S^2) attention einsums, softmax, LN, and GELU are recomputed in
        # backward — near-optimal memory at ~15% extra FLOPs vs full-block
        # remat's ~33%.
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if cfg.remat_policy == "selective":
        return jax.checkpoint_policies.save_anything_except_these_names(
            "attn_probs"
        )
    return jax.checkpoint_policies.nothing_saveable


class ViltCore(nn.Module):
    """The full ViLT encoder: text+image embeddings -> blocks -> LN -> pooler.

    Inputs (all fixed-shape device arrays):
      input_ids        (B, L) int32  — tokenized text, right-padded
      text_mask        (B, L) {0,1}
      pixel_values     (B, H, W, C) float — normalized, canvas-padded images
      patch_hw         (B, 2) int32  — valid patch (rows, cols) per sample
      image_token_type_idx (B,) int32 or None — modality row for the image
                       tokens (1 normally; 1/2 for NLVR2's image pairs)
      token_type_ids   (B, L) int32 or None — BERT segment ids (default 0)
      text_embeds      (B, L, D) or None — pre-computed text representations
                       (the ViLT-BERT path feeds frozen BERT outputs here,
                       reference viltbert.py:135-151)

    Returns (sequence_output, pooled_output, joint_mask).
    """

    cfg: ViltConfig
    adapter_spec: Optional[AdapterSpec] = None
    adapter_tasks: Tuple[str, ...] = ()
    active_adapter: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        input_ids,
        text_mask,
        pixel_values,
        patch_hw,
        image_token_type_idx=None,
        token_type_ids=None,
        text_embeds=None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        d = cfg.hidden_size
        dtype = cfg.compute_dtype
        emb_init = nn.initializers.normal(cfg.initializer_range)
        b, l = input_ids.shape

        # ---- text embeddings (HF TextEmbeddings semantics) ----
        word_emb = self.param("word_embeddings", emb_init, (cfg.vocab_size, d), jnp.float32)
        text_pos = self.param(
            "text_position_embeddings", emb_init, (cfg.max_text_len, d), jnp.float32
        )
        type_emb = self.param(
            "token_type_embeddings", emb_init, (cfg.type_vocab_size, d), jnp.float32
        )
        if text_embeds is None:
            text_embeds = jnp.take(word_emb, input_ids, axis=0)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        t = text_embeds + jnp.take(type_emb, token_type_ids, axis=0) + text_pos[None, :l, :]
        t = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="text_layernorm")(t.astype(jnp.float32))
        t = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(t)

        # ---- visual embeddings (HF visual_embed semantics, fixed grid) ----
        # The grid comes from the traced pixel shape, not the config: aspect
        # bucketing feeds narrower canvases (e.g. 384x512 for 4:3 photos) to
        # the same module/params, and each distinct canvas is just another
        # static-shape jit specialization. Parameters are grid-independent
        # (the pretrained pos grid is interpolated per sample).
        grid_h = pixel_values.shape[1] // cfg.patch_size
        grid_w = pixel_values.shape[2] // cfg.patch_size
        patches = patchify(pixel_values.astype(dtype), cfg.patch_size)
        if cfg.dense_impl in ("int8", "int8_static") and deterministic:
            from climb_tpu.ops.quant import module_int8_dense

            pk, pb = _DenseParams(
                patches.shape[-1], d, name="patch_projection"
            )()
            proj = module_int8_dense(
                self, patches, pk, pb, "patch_projection", cfg.dense_impl, dtype
            )
        else:
            proj = nn.Dense(d, dtype=dtype, name="patch_projection")(patches)
        vis_pos = self.param(
            "visual_position_embeddings",
            nn.initializers.zeros,
            (cfg.pos_grid * cfg.pos_grid + 1, d),
            jnp.float32,
        )
        pos_grid_param = vis_pos[1:].reshape(cfg.pos_grid, cfg.pos_grid, d)
        pos = interpolate_visual_pos_embed(pos_grid_param, patch_hw, grid_h, grid_w)
        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, d), jnp.float32)
        cls = jnp.broadcast_to(cls_token + vis_pos[0][None, None, :], (b, 1, d))
        img = jnp.concatenate([cls.astype(jnp.float32), proj.astype(jnp.float32) + pos], axis=1)
        img = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(img)
        img_mask = jnp.concatenate(
            [jnp.ones((b, 1), jnp.float32), patch_grid_mask(patch_hw, grid_h, grid_w)],
            axis=1,
        )

        # ---- modality-type embeddings (added after text LN, HF order) ----
        mod_emb = self.param(
            "modality_type_embeddings",
            emb_init,
            (cfg.modality_type_vocab_size, d),
            jnp.float32,
        )
        if image_token_type_idx is None:
            image_token_type_idx = jnp.ones((b,), jnp.int32)
        t = t + mod_emb[0][None, None, :]
        img = img + jnp.take(mod_emb, image_token_type_idx, axis=0)[:, None, :]

        # ---- concat + encoder ----
        x = jnp.concatenate([t, img], axis=1).astype(dtype)
        joint_mask = jnp.concatenate([text_mask.astype(jnp.float32), img_mask], axis=1)
        mask_bias = mask_to_bias(joint_mask, dtype=jnp.float32)

        if cfg.pp_stages > 1 and not self.is_initializing():
            # Pipeline-parallel path: the stacked block params already exist
            # (created by the scan branch during init — layouts identical);
            # stream microbatches through the stage schedule instead of
            # scanning layers. See _pipelined_encoder.
            x = self._pipelined_encoder(x, mask_bias, deterministic)
        else:
            block_cls = ViltBlock
            if cfg.remat and not ViltBlock.fused_self_remat(cfg, self.adapter_spec):
                block_cls = nn.remat(
                    ViltBlock, prevent_cse=False, policy=_remat_policy(cfg)
                )
            ScannedBlocks = nn.scan(
                block_cls,
                variable_axes={"params": 0, "quant": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.num_layers,
                in_axes=nn.broadcast,
                unroll=cfg.scan_unroll,
                metadata_params={nn.meta.PARTITION_NAME: "layers"},
            )
            x, _ = ScannedBlocks(
                cfg,
                adapter_spec=self.adapter_spec,
                adapter_tasks=self.adapter_tasks,
                active_adapter=self.active_adapter,
                deterministic=deterministic,
                name="encoder",
            )(x, mask_bias)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="final_layernorm")(x)
        pooled = nn.Dense(d, dtype=dtype, name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled, joint_mask

    def _pipelined_encoder(self, x, mask_bias, deterministic):
        """Run the stacked encoder blocks through the GPipe/circular pipeline
        (``parallel/pipeline.py``) over ``cfg.pp_mesh``'s 'pipe' axis.

        The stored parameter tree is untouched: stacked leaves in canonical
        layer order under 'encoder', exactly as the scan path creates them —
        checkpoints, freeze masks, and HF grafting are pipeline-agnostic.
        Stage placement comes from sharding the leading layer axis over
        'pipe' (``sharding.param_spec(pp=True)``); with ``pp_virtual > 1``
        the circular layout is applied per apply (a gather of the stacked
        tree — stored params stay canonical so save/restore never reorders).
        Differentiable end to end (ppermute transposes to the reverse
        ppermute), so the same path serves train and eval.
        """
        from climb_tpu.parallel.mesh import DATA_AXIS
        from climb_tpu.parallel.pipeline import (
            PIPE_AXIS,
            interleave_for_pipeline,
            pipeline_layers,
        )

        cfg = self.cfg
        if cfg.hidden_dropout > 0.0 and not deterministic:
            raise ValueError(
                "pipeline parallelism requires hidden_dropout == 0.0 (block "
                "applications inside the schedule carry no dropout rng)"
            )
        mesh = cfg.pp_mesh
        if mesh is None or PIPE_AXIS not in mesh.axis_names:
            raise ValueError(
                "pp_stages > 1 requires cfg.pp_mesh with a 'pipe' axis "
                "(make_dp_pp_mesh)"
            )
        stacked = self.get_variable("params", "encoder")
        block = ViltBlock(
            cfg,
            adapter_spec=self.adapter_spec,
            adapter_tasks=self.adapter_tasks,
            active_adapter=self.active_adapter,
            deterministic=deterministic,
            parent=None,
        )

        def apply_block(lp, io):
            y, _ = block.apply({"params": lp}, io["x"], io["mask_bias"])
            return {"x": y, "mask_bias": io["mask_bias"]}

        if cfg.remat and not ViltBlock.fused_self_remat(cfg, self.adapter_spec):
            apply_block = jax.checkpoint(
                apply_block, prevent_cse=False, policy=_remat_policy(cfg)
            )

        n_stages = mesh.shape[PIPE_AXIS]
        if cfg.pp_virtual > 1:
            stacked = interleave_for_pipeline(stacked, n_stages, cfg.pp_virtual)
        batch_axis = (
            DATA_AXIS
            if DATA_AXIS in mesh.axis_names and mesh.shape[DATA_AXIS] > 1
            else None
        )
        out = pipeline_layers(
            apply_block,
            stacked,
            {"x": x, "mask_bias": mask_bias},
            n_micro=cfg.pp_microbatches or n_stages,
            mesh=mesh,
            batch_axis=batch_axis,
            n_virtual=cfg.pp_virtual,
        )
        return out["x"]
