"""Pipeline parallelism over the stacked layer axis (GPipe via shard_map +
ppermute): equivalence with the sequential layer scan, gradients through the
schedule, and the real ViltBlock stage function."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climb_tpu.parallel.pipeline import (
    PIPE_AXIS,
    make_pipe_mesh,
    pipeline_layers,
    shard_stacked_params,
)

L, D = 8, 16  # 8 layers over up to 8 stages


def _stacked_mlp_params(rng, l=L, d=D):
    return {
        "w": jnp.asarray(rng.randn(l, d, d) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.randn(l, d) * 0.1, jnp.float32),
    }


def _mlp_block(lp, inputs):
    x, scale = inputs["x"], inputs["scale"]
    x = jnp.tanh(x @ lp["w"] + lp["b"]) * scale[:, None]
    return {"x": x, "scale": scale}


def _sequential(params, inputs):
    def body(h, lp):
        return _mlp_block(lp, h), None

    out, _ = jax.lax.scan(body, inputs, params)
    return out


@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 4), (8, 2), (4, 1)])
def test_pipeline_matches_sequential(rng, n_stages, n_micro):
    mesh = make_pipe_mesh(n_stages)
    params = _stacked_mlp_params(rng)
    batch = 8
    inputs = {
        "x": jnp.asarray(rng.randn(batch, D), jnp.float32),
        "scale": jnp.asarray(rng.rand(batch) + 0.5, jnp.float32),
    }
    want = _sequential(params, inputs)
    got = pipeline_layers(_mlp_block, params, inputs, n_micro, mesh)
    np.testing.assert_allclose(got["x"], want["x"], rtol=1e-6, atol=1e-6)
    # side inputs ride through unchanged
    np.testing.assert_allclose(got["scale"], inputs["scale"], rtol=1e-6)


def test_pipeline_gradients_match_sequential(rng):
    mesh = make_pipe_mesh(4)
    params = _stacked_mlp_params(rng)
    batch = 8
    inputs = {
        "x": jnp.asarray(rng.randn(batch, D), jnp.float32),
        "scale": jnp.ones((batch,), jnp.float32),
    }

    def loss_pipe(p):
        return (pipeline_layers(_mlp_block, p, inputs, 4, mesh)["x"] ** 2).sum()

    def loss_seq(p):
        return (_sequential(p, inputs)["x"] ** 2).sum()

    g_pipe = jax.grad(loss_pipe)(params)
    g_seq = jax.grad(loss_seq)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5),
        g_pipe,
        g_seq,
    )


def test_pipeline_under_jit_with_sharded_params(rng):
    """Params placed with the stage axis sharded over 'pipe'; the whole
    pipeline jitted end to end."""
    mesh = make_pipe_mesh(4)
    params = shard_stacked_params(_stacked_mlp_params(rng), mesh)
    batch = 8
    inputs = {
        "x": jnp.asarray(rng.randn(batch, D), jnp.float32),
        "scale": jnp.ones((batch,), jnp.float32),
    }
    fn = jax.jit(
        lambda p, i: pipeline_layers(_mlp_block, p, i, n_micro=4, mesh=mesh)
    )
    got = fn(params, inputs)
    want = _sequential(params, inputs)
    np.testing.assert_allclose(got["x"], want["x"], rtol=1e-6, atol=1e-6)


def test_pipeline_real_vilt_blocks(rng):
    """The actual encoder stack (ViltBlock params from a tiny ViltCore init)
    pipelined over 2 stages matches the unpipelined forward."""
    from types import SimpleNamespace

    from climb_tpu.models.model_config import ViltConfig
    from climb_tpu.models.vilt_core import ViltBlock, ViltCore

    cfg = ViltConfig(
        vocab_size=128, hidden_size=32, num_layers=4, num_heads=4,
        intermediate_size=64, image_height=64, image_width=96,
        patch_size=32, pretrain_image_size=64,
    )
    core = ViltCore(cfg)
    b = 4
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 128, (b, cfg.max_text_len)), jnp.int32),
        "text_mask": jnp.ones((b, cfg.max_text_len), jnp.float32),
        "pixel_values": jnp.asarray(
            rng.randn(b, cfg.image_height, cfg.image_width, 3), jnp.float32),
        "patch_hw": jnp.broadcast_to(jnp.array([cfg.grid_h, cfg.grid_w]), (b, 2)),
    }
    params = core.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["text_mask"],
        batch["pixel_values"], batch["patch_hw"],
    )["params"]
    seq_out, _, _ = core.apply(
        {"params": params}, batch["input_ids"], batch["text_mask"],
        batch["pixel_values"], batch["patch_hw"],
    )

    # Re-run just the block stack through the pipeline: grab the pre-encoder
    # embedding by zero-layer... instead, reproduce the encoder input by
    # applying the stack inverse-free: run a 0-layer core is not expressible,
    # so pipeline the stack and compare to scanning the same stack directly.
    block = ViltBlock(cfg, deterministic=True)
    stacked = params["encoder"]
    x = jnp.asarray(rng.randn(b, cfg.seq_len, cfg.hidden_size), jnp.float32)
    mask_bias = jnp.zeros((b, 1, 1, cfg.seq_len), jnp.float32)

    def block_fn(lp, inputs):
        y, _ = block.apply({"params": lp}, inputs["x"], inputs["mask_bias"])
        return {"x": y, "mask_bias": inputs["mask_bias"]}

    def seq_stack(inputs):
        def body(h, lp):
            return block_fn(lp, h), None

        out, _ = jax.lax.scan(body, inputs, stacked)
        return out

    want = seq_stack({"x": x, "mask_bias": mask_bias})["x"]
    mesh = make_pipe_mesh(2)
    got = pipeline_layers(
        block_fn, stacked, {"x": x, "mask_bias": mask_bias}, n_micro=2, mesh=mesh
    )["x"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(seq_out)).all()


def test_pipeline_composes_with_data_parallelism(rng):
    """DP x PP on a ('data','pipe') 2x4 mesh: batch sharded over 'data',
    stages over 'pipe'; output equals the sequential stack."""
    import numpy as np
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", PIPE_AXIS))
    params = _stacked_mlp_params(rng)
    batch = 8
    inputs = {
        "x": jnp.asarray(rng.randn(batch, D), jnp.float32),
        "scale": jnp.ones((batch,), jnp.float32),
    }
    want = _sequential(params, inputs)
    got = pipeline_layers(
        _mlp_block, params, inputs, n_micro=2, mesh=mesh, batch_axis="data"
    )
    np.testing.assert_allclose(got["x"], want["x"], rtol=1e-6, atol=1e-6)


# ---- circular / interleaved virtual stages (n_virtual > 1) ----------------

def _stacked(rng, l, d=D):
    return {
        "w": jnp.asarray(rng.randn(l, d, d) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.randn(l, d) * 0.1, jnp.float32),
    }


@pytest.mark.parametrize(
    "n_stages,n_virtual,n_micro,layers",
    [(2, 2, 4, 8), (4, 2, 8, 8), (2, 4, 2, 8), (4, 3, 4, 24), (2, 2, 5, 8)],
)
def test_circular_pipeline_matches_sequential(rng, n_stages, n_virtual, n_micro, layers):
    """V>1 sends each microbatch around the ring V times, one layer chunk per
    hop; the result must equal the plain sequential stack (params pre-laid
    out with interleave_for_pipeline)."""
    from climb_tpu.parallel.pipeline import interleave_for_pipeline

    mesh = make_pipe_mesh(n_stages)
    params = _stacked(rng, layers)
    batch = 2 * n_micro
    inputs = {
        "x": jnp.asarray(rng.randn(batch, D), jnp.float32),
        "scale": jnp.asarray(rng.rand(batch) + 0.5, jnp.float32),
    }
    want = _sequential(params, inputs)
    laid_out = interleave_for_pipeline(params, n_stages, n_virtual)
    got = pipeline_layers(
        _mlp_block, laid_out, inputs, n_micro, mesh, n_virtual=n_virtual
    )
    np.testing.assert_allclose(got["x"], want["x"], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got["scale"], inputs["scale"], rtol=1e-6)


def test_circular_pipeline_gradients_match_sequential(rng):
    """Gradients flow through injection masks, chunk selection, the masked
    output writes, AND the interleave gather back to original layer order."""
    from climb_tpu.parallel.pipeline import interleave_for_pipeline

    mesh = make_pipe_mesh(4)
    params = _stacked(rng, 8)
    inputs = {
        "x": jnp.asarray(rng.randn(8, D), jnp.float32),
        "scale": jnp.ones((8,), jnp.float32),
    }

    def loss_pipe(p):
        laid_out = interleave_for_pipeline(p, 4, 2)
        out = pipeline_layers(_mlp_block, laid_out, inputs, 4, mesh, n_virtual=2)
        return (out["x"] ** 2).sum()

    def loss_seq(p):
        return (_sequential(p, inputs)["x"] ** 2).sum()

    g_pipe = jax.grad(loss_pipe)(params)
    g_seq = jax.grad(loss_seq)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5),
        g_pipe,
        g_seq,
    )


def test_pipeline_schedule_collision_free_and_complete():
    """Pure schedule property check over a grid of (M, P, V): every
    microbatch is injected once, visits all V*P virtual stages in order with
    no two microbatches on one device at one tick, and completes exactly at
    its out_ok slot."""
    from climb_tpu.parallel.pipeline import pipeline_schedule

    for P in (2, 3, 4, 8):
        for V in (1, 2, 3):
            for M in (1, 2, P - 1, P, P + 1, 2 * P, 3 * P + 1):
                if M < 1:
                    continue
                VP = V * P
                n_ticks, s = pipeline_schedule(M, P, V)
                # injections: exactly M, at tau_j = (j//P)*VP + j%P, in order
                inj_ticks = [t for t in range(n_ticks) if s["inj_ok"][t]]
                assert [int(s["inj_idx"][t]) for t in inj_ticks] == list(range(M))
                taus = {int(s["inj_idx"][t]): t for t in inj_ticks}
                assert all(
                    taus[j] == (j // P) * VP + j % P for j in range(M)
                )
                # device occupancy: microbatch j sits on device k%P at tick
                # tau_j+k for k in [0, VP) — no collisions anywhere
                occupied = {}
                for j in range(M):
                    for k in range(VP):
                        key = (taus[j] + k, (k % P))
                        assert key not in occupied, (P, V, M, key)
                        occupied[key] = j
                # outputs: exactly M, microbatch j at tick tau_j + VP - 1
                out_ticks = [t for t in range(n_ticks) if s["out_ok"][t]]
                assert len(out_ticks) == M
                for t in out_ticks:
                    j = int(s["out_idx"][t])
                    assert t == taus[j] + VP - 1


def test_circular_schedule_shrinks_bubble():
    """The V-fold bubble claim, on the schedule itself: total cost in
    layer-applications per device = n_ticks * L/(V*P); at M % P == 0 the
    circular schedule strictly beats GPipe and approaches the ideal M*L/P."""
    from climb_tpu.parallel.pipeline import pipeline_schedule

    L, P, M = 48, 4, 8
    ideal = M * L / P
    costs = {}
    for V in (1, 2, 4):
        n_ticks, _ = pipeline_schedule(M, P, V)
        costs[V] = n_ticks * L / (V * P)
    assert costs[1] > costs[2] > costs[4] > ideal
    # exact bubble fractions: (P-1)/(V*M + P-1)
    for V, cost in costs.items():
        assert cost == pytest.approx(ideal * (1 + (P - 1) / (V * M)))
