"""Sequence-parallel attention (ring / Ulysses) vs single-device reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.ops.attention import mask_to_bias, mha_xla
from climb_tpu.ops.sp_attention import sequence_parallel_attention
from climb_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("impl", ["ring", "ulysses"])
def test_sp_attention_matches_reference(rng, impl):
    b, s, h, d = 2, 64, 8, 16  # h=8 divisible by 8 devices (ulysses)
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32) * 0.3)
    mask = np.ones((b, s), np.float32)
    mask[1, 50:] = 0.0

    ref = mha_xla(q, k, v, mask_to_bias(jnp.asarray(mask)))

    mesh = make_mesh(n_data=1, n_model=8)
    out = sequence_parallel_attention(q, k, v, jnp.asarray(mask), mesh,
                                      axis_name="model", impl=impl)
    # masked-out query rows may differ (they attend to nothing); compare valid
    np.testing.assert_allclose(
        np.asarray(out)[0], np.asarray(ref)[0], atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out)[1, :50], np.asarray(ref)[1, :50], atol=3e-5, rtol=1e-4
    )
