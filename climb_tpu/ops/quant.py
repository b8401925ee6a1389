"""Int8 quantized dense layers for the serving/eval forward path.

TPU v5e's MXU runs int8xint8->int32 matmuls at 2x the bf16 rate (394 TOPS
vs 197 TFLOPS peak), and the forward-only serving path (`cli/predict.py`,
eval loops) has no gradient to protect — so weight+activation int8 with
per-channel weight scales and dynamic per-row activation scales is the
idiomatic TPU serving speedup. The reference has no quantized path at all
(serving = the same fp32 torch forward, reference src/modeling/vilt.py
forward); this is a beyond-reference capability.

Scheme (symmetric, zero-point-free — MXU int8 has no zero-point support,
and LayerNorm'd activations are near-zero-mean so symmetric loses little):

  w_q[d, e]  = round(w[d, e] / s_w[e]),   s_w[e] = max_d |w[d, e]| / 127
  a_q[t, d]  = round(a[t, d] / s_a[t]),   s_a[t] = max_d |a[t, d]| / 127
  y[t, e]    = (a_q @ w_q)[t, e] * s_a[t] * s_w[e] + bias[e]

The int32 accumulator is exact; all error comes from the two roundings.
Weight quantization happens inside the jitted forward (XLA hoists it out
of any scan over layers; at (768, 768) it is ~0.6 M cheap VPU ops vs a
33 GFLOP GEMM — negligible), so checkpoints keep their normal f32/bf16
pytrees and every existing loader/converter works unchanged.

Gradients are NOT defined (round() has no useful derivative); the int8
path is gated to deterministic forwards by the model config plumbing
(`ViltConfig.dense_impl` is only honored when `deterministic=True`).
"""

import jax
import jax.numpy as jnp


def quantize_per_channel(w: jax.Array):
    """(D, E) float weights -> (int8 weights, (E,) f32 scales), symmetric
    per-output-channel."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    wq = jnp.clip(jnp.round(wf / s[None, :]), -127, 127).astype(jnp.int8)
    return wq, s


def quantize_per_row(a: jax.Array):
    """(..., D) float activations -> (int8, (...,) f32 scales), symmetric
    dynamic per-row (per token)."""
    af = a.astype(jnp.float32)
    s = jnp.max(jnp.abs(af), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-12)
    aq = jnp.clip(jnp.round(af / s[..., None]), -127, 127).astype(jnp.int8)
    return aq, s


def int8_dense_prequant(aq, sa, w, bias, out_dtype):
    """y = dequant(aq @ quant(w)) + bias for an activation already
    quantized with `quantize_per_row` — lets one quantization of a shared
    input (e.g. LN1's output feeding q, k AND v) serve several GEMMs; the
    dynamic-quant reduce+scale passes over the activation are the dominant
    cost of the int8 path at ViLT shapes."""
    wq, sw = quantize_per_channel(w)
    acc = jax.lax.dot_general(
        aq, wq,
        (((aq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sa[..., None] * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def int8_dense(a: jax.Array, w: jax.Array, bias, out_dtype=None):
    """y = a @ w + bias with an int8 MXU matmul.

    a: (..., D) float; w: (D, E) float (quantized here, hoisted by XLA);
    bias: (E,) float or None. Returns (..., E) in `out_dtype` (default:
    a.dtype).
    """
    aq, sa = quantize_per_row(a)
    return int8_dense_prequant(aq, sa, w, bias, out_dtype or a.dtype)


def int8_dense_static(a: jax.Array, w: jax.Array, bias, amax, out_dtype=None):
    """y = a @ w + bias with an int8 MXU matmul and a CALIBRATED static
    per-tensor activation scale (`amax` = running abs-max from a PTQ
    calibration pass, a scalar).

    Unlike the dynamic path, quantization here is purely elementwise (no
    per-row reduce), so XLA fuses it into the producing op's epilogue and
    the GEMM input shrinks to 1 byte/element — measured ~1.2x the bf16
    forward at ViLT-base shapes where the dynamic path is a wash (the
    reduce breaks the LN->GEMM fusion and re-reads the activation)."""
    s = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0
    aq = jnp.clip(jnp.round(a.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    wq, sw = quantize_per_channel(w)
    acc = jax.lax.dot_general(
        aq, wq,
        (((aq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype or a.dtype)


def module_int8_dense(module, h, kernel, bias, name, dense_impl, out_dtype):
    """The quantized-dense apply shared by every encoder call site
    (ViltBlock._dense, the patch projection, BertLayer): routes between
    dynamic int8, PTQ calibration recording, and calibrated static int8
    based on `dense_impl` and the state of the module's 'quant' collection.

    Semantics:
    - 'int8': dynamic per-row activation scales — no state needed.
    - 'int8_static' with the 'quant' collection MUTABLE (calibration pass):
      record the running activation abs-max, compute in the normal dtype.
    - 'int8_static' with a calibrated 'quant' collection provided: static
      per-tensor scales (the fast fully-fused serving mode).
    - 'int8_static' with NO calibration available (e.g. the per-epoch eval
      inside a training run, where nothing has calibrated scales yet):
      fall back to dynamic int8 instead of crashing — deterministic, needs
      no state, and matches the user's intent of int8 eval.
    """
    if dense_impl == "int8":
        return int8_dense(h, kernel, bias, out_dtype=out_dtype)
    var_name = f"{name}_amax"
    if module.is_mutable_collection("quant"):
        amax = module.variable("quant", var_name, lambda: jnp.zeros((), jnp.float32))
        amax.value = jnp.maximum(
            amax.value, jnp.max(jnp.abs(h)).astype(jnp.float32)
        )
        return (
            h @ kernel.astype(out_dtype) + bias.astype(out_dtype)
        ).astype(out_dtype)
    if not module.has_variable("quant", var_name):
        return int8_dense(h, kernel, bias, out_dtype=out_dtype)
    amax = module.variable("quant", var_name, lambda: jnp.zeros((), jnp.float32))
    return int8_dense_static(h, kernel, bias, amax.value, out_dtype=out_dtype)
