"""Hermetic exercise of the from-pretrained loading path.

The reference loads ``dandelin/vilt-b32-mlm`` via ``ViltModel.from_pretrained``
(vilt.py:497-500); no network here, so a random-init HF ``ViltModel`` saved to
disk in HF format stands in. This drives the *factory* branches end-to-end
(``create_cl_model`` -> ``_graft_pretrained`` and ``load_encoder_params``),
not just the tensor converters, and asserts the grafted tree equals the
fixture weights tensor-for-tensor (so a silent fall-back-to-random cannot
pass).
"""

from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402

from climb_tpu.configs import task_configs  # noqa: E402
from climb_tpu.models.hf_import import import_hf_vilt  # noqa: E402
from climb_tpu.models.surgery import expand_modality_type_embeddings  # noqa: E402
from climb_tpu.train.model_factory import (  # noqa: E402
    create_cl_model,
    load_encoder_params,
    vilt_config_from_args,
)

# matches the `tiny=True` ViltConfig in model_factory.vilt_config_from_args
HF_KW = dict(
    vocab_size=2048,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    image_size=64,
    patch_size=32,
    max_position_embeddings=40,
    max_image_length=-1,
    modality_type_vocab_size=2,
)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    torch.manual_seed(0)
    model = transformers.ViltModel(transformers.ViltConfig(**HF_KW))
    with torch.no_grad():  # give the zero-init embeddings signal
        model.embeddings.position_embeddings.normal_(0, 0.02)
        model.embeddings.cls_token.normal_(0, 0.02)
    d = tmp_path_factory.mktemp("hf_vilt_fixture")
    model.save_pretrained(str(d))
    return str(d), model


def _assert_tree_equal(actual, expected, prefix=""):
    """Every leaf of `expected` must exist in `actual` and match exactly."""
    assert set(expected).issubset(set(actual)), (
        f"{prefix}: missing {set(expected) - set(actual)}"
    )
    for k, v in expected.items():
        if isinstance(v, dict):
            _assert_tree_equal(actual[k], v, f"{prefix}/{k}")
        else:
            np.testing.assert_allclose(
                np.asarray(actual[k], np.float32), np.asarray(v, np.float32),
                rtol=1e-6, atol=1e-7, err_msg=f"{prefix}/{k}",
            )


def _args(path, tasks):
    return SimpleNamespace(
        batch_size=4, seed=0, ordered_cl_tasks=tasks, encoder_name="vilt",
        pretrained_model_name=path, tiny=True, synthetic=True,
    )


def test_create_cl_model_grafts_pretrained(hf_dir):
    path, hf = hf_dir
    model = create_cl_model(_args(path, ["snli-ve"]), task_configs)
    expected = import_hf_vilt(hf.state_dict(), model.cfg)
    _assert_tree_equal(model.params["vilt"], expected, "vilt")
    # heads stay freshly initialized (not part of the pretrained graft)
    assert "head_snli_ve" in model.params


def test_create_cl_model_pretrained_with_nlvr2_expansion(hf_dir):
    """NLVR2 in the sequence: 2->3 modality rows with row2 := copy of row1
    (reference expand_modality_type_embeddings, vilt.py:98-109) applied ON
    TOP of the pretrained weights inside the factory."""
    path, hf = hf_dir
    model = create_cl_model(_args(path, ["nlvr2", "snli-ve"]), task_configs)
    assert model.cfg.modality_type_vocab_size == 3
    base_cfg = model.cfg.replace(modality_type_vocab_size=2)
    expected = import_hf_vilt(hf.state_dict(), base_cfg)
    expected, _ = expand_modality_type_embeddings(expected, base_cfg)
    _assert_tree_equal(model.params["vilt"], expected, "vilt")


def test_load_encoder_params_pretrained(hf_dir):
    """Phase II encoder loading (reference load_vilt_encoder, vilt.py:481-514)
    from a local HF directory, no upstream checkpoint."""
    path, hf = hf_dir
    cfg = vilt_config_from_args(SimpleNamespace(tiny=True), needs_three_modalities=False)
    params, out_cfg = load_encoder_params(None, cfg, pretrained=path)
    expected = import_hf_vilt(hf.state_dict(), out_cfg)
    _assert_tree_equal(params, expected, "encoder")


def test_load_encoder_params_nlvr2_checkpoint_name(hf_dir):
    """'nlvr2' in the checkpoint *name* expands modality rows even when the
    checkpoint file itself is absent (reference vilt.py:503-506 semantics)."""
    path, hf = hf_dir
    cfg = vilt_config_from_args(SimpleNamespace(tiny=True), needs_three_modalities=False)
    params, out_cfg = load_encoder_params(
        "/nonexistent/task1_nlvr2/encoder", cfg, pretrained=path
    )
    assert out_cfg.modality_type_vocab_size == 3
    base_cfg = out_cfg.replace(modality_type_vocab_size=2)
    expected = import_hf_vilt(hf.state_dict(), base_cfg)
    expected, _ = expand_modality_type_embeddings(expected, base_cfg)
    _assert_tree_equal(params, expected, "encoder")


def test_missing_pretrained_falls_back_to_random(hf_dir):
    """An unloadable pretrained name degrades to random init with a warning
    (never crashes a driver run) — and the result differs from the fixture."""
    path, hf = hf_dir
    model = create_cl_model(_args("/nonexistent/vilt-b32", ["snli-ve"]), task_configs)
    expected = import_hf_vilt(hf.state_dict(), model.cfg)
    word = jax.tree_util.tree_leaves(model.params["vilt"]["word_embeddings"])[0]
    exp_word = jax.tree_util.tree_leaves(expected["word_embeddings"])[0]
    assert not np.allclose(np.asarray(word, np.float32), np.asarray(exp_word, np.float32))
