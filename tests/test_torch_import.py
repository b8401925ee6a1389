"""Reference (PyTorch CLiMB) checkpoint ingestion.

Fabricates torch state dicts with the reference's exact key layouts
(full model ``vilt_encoder.vilt.* + task_layer.*``, encoder-wrapper
``vilt.*``, and bare HF ``ViltModel``), saves them with ``torch.save``, and
verifies ``load_params`` auto-detects + converts them into trees that merge
cleanly (all encoder and head leaves matched) into an initialized model.

Reference layouts: ``train_upstream_continual_learning.py:260-267`` (what is
saved), ``modeling/vilt.py:147-203`` (attribute/head structure).
"""

import numpy as np
import pytest
import torch

from climb_tpu.ckpt import (
    is_torch_checkpoint,
    load_params,
    partial_load,
    save_params,
)

TINY = dict(
    vocab_size=2048, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=128, image_size=64, patch_size=32,
    max_position_embeddings=40, modality_type_vocab_size=2,
)


def _tiny_hf_vilt_sd():
    from transformers import ViltConfig, ViltModel

    torch.manual_seed(0)
    model = ViltModel(ViltConfig(**TINY))
    return {k: v for k, v in model.state_dict().items()}


def _reference_heads_sd():
    """Torch Sequential heads exactly as reference add_task_layer builds them."""
    torch.manual_seed(1)
    clf = torch.nn.Sequential(  # 'classification' (vilt.py:190-195)
        torch.nn.Linear(64, 128), torch.nn.LayerNorm(128),
        torch.nn.GELU(), torch.nn.Linear(128, 3),
    )
    mc = torch.nn.Sequential(  # 'multi-choice' (vilt.py:199-202)
        torch.nn.Dropout(0.1), torch.nn.Linear(64, 1),
    )
    sd = {}
    for k, v in clf.state_dict().items():
        sd[f"task_layer.snli-ve.{k}"] = v
    for k, v in mc.state_dict().items():
        sd[f"task_layer.vcr.{k}"] = v
    return sd


def _tiny_model_params():
    """Initialized tiny ViltContinualLearner param tree (snli-ve + vcr heads)."""
    from types import SimpleNamespace

    from climb_tpu.configs.task_configs import task_configs
    from climb_tpu.train.model_factory import create_cl_model

    args = SimpleNamespace(
        ordered_cl_tasks=["snli-ve", "vcr"], encoder_name="vilt", tiny=True,
        pretrained_model_name="scratch", seed=0,
    )
    return create_cl_model(args, task_configs).params


def test_detects_torch_vs_msgpack(tmp_path):
    tp = tmp_path / "model"
    torch.save({"x": torch.zeros(2)}, tp)
    assert is_torch_checkpoint(str(tp))
    mp = tmp_path / "m.msgpack"
    save_params({"a": np.zeros(2)}, str(mp))
    assert not is_torch_checkpoint(str(mp))
    tree = load_params(str(mp))
    assert tree["a"].shape == (2,)


def test_full_model_checkpoint_roundtrip(tmp_path):
    sd = {f"vilt_encoder.vilt.{k}": v for k, v in _tiny_hf_vilt_sd().items()}
    sd.update(_reference_heads_sd())
    path = tmp_path / "model"
    torch.save(sd, path)

    tree = load_params(str(path))
    assert set(k for k in tree if k.startswith("head_")) == {"head_snli_ve", "head_vcr"}

    # linear weights transposed, layernorm mapped to scale/bias
    np.testing.assert_allclose(
        tree["head_snli_ve"]["fc1"]["kernel"],
        sd["task_layer.snli-ve.0.weight"].numpy().T,
    )
    np.testing.assert_allclose(
        tree["head_snli_ve"]["ln"]["scale"], sd["task_layer.snli-ve.1.weight"].numpy()
    )
    np.testing.assert_allclose(
        tree["head_vcr"]["fc"]["kernel"], sd["task_layer.vcr.1.weight"].numpy().T
    )

    # merges cleanly into an initialized model: every leaf of the converted
    # tree lands (partial_load reports missing only for keys absent in source,
    # e.g. nothing here — shapes all line up with the tiny config)
    params = _tiny_model_params()
    merged, loaded, missing = partial_load(params, tree)
    n_leaves = len(jax_leaves(params))
    assert len(loaded) == n_leaves, f"unmatched: {missing}"


def test_encoder_wrapper_checkpoint(tmp_path):
    sd = {f"vilt.{k}": v for k, v in _tiny_hf_vilt_sd().items()}
    path = tmp_path / "encoder"
    torch.save(sd, path)
    tree = load_params(str(path))
    assert "vilt" in tree and "word_embeddings" in tree["vilt"]
    assert tree["vilt"]["encoder"]["q"]["kernel"].shape == (2, 64, 64)


def test_bare_hf_state_dict(tmp_path):
    path = tmp_path / "hf.pt"
    torch.save(_tiny_hf_vilt_sd(), path)
    tree = load_params(str(path))
    assert tree["vilt"]["word_embeddings"].shape == (2048, 64)


def test_forward_logit_parity_through_torch_head(tmp_path):
    """Our ClassificationHead on converted weights == torch Sequential head."""
    import jax.numpy as jnp

    from climb_tpu.models.heads import ClassificationHead

    torch.manual_seed(2)
    seq = torch.nn.Sequential(
        torch.nn.Linear(64, 128), torch.nn.LayerNorm(128),
        torch.nn.GELU(), torch.nn.Linear(128, 3),
    )
    sd = {f"vilt_encoder.vilt.{k}": v for k, v in _tiny_hf_vilt_sd().items()}
    sd.update({f"task_layer.snli-ve.{k}": v for k, v in seq.state_dict().items()})
    path = tmp_path / "model"
    torch.save(sd, path)
    tree = load_params(str(path))

    x = np.random.RandomState(0).randn(4, 64).astype(np.float32)
    want = seq(torch.from_numpy(x)).detach().numpy()
    got = ClassificationHead(num_labels=3, encoder_dim=64).apply(
        {"params": tree["head_snli_ve"]}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_rejects_unknown_layout(tmp_path):
    path = tmp_path / "junk"
    torch.save({"foo.bar": torch.zeros(3)}, path)
    with pytest.raises(ValueError, match="unrecognized"):
        load_params(str(path))


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


# --- export (reverse migration): our params -> reference torch layout -------


def test_export_roundtrip_model():
    """export(kind='model') then convert back == identity on every leaf."""
    import jax

    from climb_tpu.ckpt import convert_torch_state_dict, export_torch_state_dict

    params = _tiny_model_params()
    sd = export_torch_state_dict(params, kind="model")
    assert any(k.startswith("vilt_encoder.vilt.") for k in sd)
    assert "task_layer.snli-ve.0.weight" in sd and "task_layer.vcr.1.weight" in sd

    back = convert_torch_state_dict(sd)
    want = {k: v for k, v in params.items() if k == "vilt" or k.startswith("head_")}
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        want, back,
    )


def test_export_hf_layout_strict_load(tmp_path):
    """kind='hf' export must load into HF ViltModel with strict=True and
    reproduce the source tensors exactly (transposes/reshapes inverted)."""
    from transformers import ViltConfig as HFCfg, ViltModel

    from climb_tpu.ckpt import export_torch_state_dict
    from climb_tpu.models.hf_import import import_hf_vilt
    from types import SimpleNamespace

    torch.manual_seed(3)
    hf = ViltModel(HFCfg(**TINY))
    enc = import_hf_vilt(hf.state_dict(), SimpleNamespace(num_layers=2))
    sd = export_torch_state_dict({"vilt": enc}, kind="hf")

    hf2 = ViltModel(HFCfg(**TINY))
    missing, unexpected = hf2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    for k, v in hf.state_dict().items():
        np.testing.assert_allclose(
            hf2.state_dict()[k].numpy(), v.numpy(), atol=1e-6, err_msg=k
        )


def test_driver_resumes_from_reference_torch_checkpoint(tmp_path):
    """Migration end-to-end: a reference-layout torch 'model' file placed in
    the experiment's checkpoint dir is picked up by the upstream driver's
    resume path (task skipped, params loaded), mirroring the reference's
    resume behavior (train_upstream_continual_learning.py:222-240)."""
    from climb_tpu.cli.train_upstream_continual_learning import main as upstream_main

    # run once to learn the experiment dir name + produce a native checkpoint
    base = [
        "--encoder_name", "vilt",
        "--pretrained_model_name", "scratch",
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--output_dir", str(tmp_path),
        "--ordered_cl_tasks", "snli-ve",
        "--cl_algorithm", "singletask_ft",
        "--do_train",
    ]
    upstream_main(base)
    exp_dir = tmp_path / "vilt-singletask_ft-task0_snli-ve"
    ckpt_dir = exp_dir / "checkpoints" / "task0_snli-ve"
    assert (ckpt_dir / "model").is_file()

    # replace the native checkpoint with a reference-layout torch save of
    # the same params (as a migrating user would have)
    from climb_tpu.ckpt import load_params, save_reference_checkpoint

    params = load_params(str(ckpt_dir / "model"))
    save_reference_checkpoint(params, str(ckpt_dir / "model"), kind="model")
    (ckpt_dir / "encoder").unlink()

    # resume run: must load the torch file and skip training
    upstream_main(base)
    # the resume path re-saves merged params natively when keys were missing;
    # either way the file must load as a native tree afterwards
    tree = load_params(str(ckpt_dir / "model"))
    assert "vilt" in tree and "head_snli_ve" in tree


def test_nlvr2_torch_encoder_checkpoint_expands_modalities(tmp_path):
    """An 'nlvr2'-path torch encoder with 3 modality rows loads through
    load_encoder_params: cfg expands to modality_type_vocab_size=3 and the
    3-row table lands (reference load_vilt_encoder semantics,
    vilt.py:503-511)."""
    from transformers import ViltConfig as HFCfg, ViltModel

    from climb_tpu.models.model_config import ViltConfig
    from climb_tpu.train.model_factory import load_encoder_params

    torch.manual_seed(4)
    hf = ViltModel(HFCfg(**{**TINY, "modality_type_vocab_size": 3}))
    sd = {f"vilt.{k}": v for k, v in hf.state_dict().items()}
    d = tmp_path / "task1_nlvr2"
    d.mkdir()
    torch.save(sd, d / "encoder")

    cfg = ViltConfig(
        vocab_size=2048, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, image_height=64, image_width=96,
        patch_size=32, pretrain_image_size=64,
    )
    params, cfg2 = load_encoder_params(str(d / "encoder"), cfg, pretrained="scratch")
    assert cfg2.modality_type_vocab_size == 3
    assert params["modality_type_embeddings"].shape == (3, 64)
    np.testing.assert_allclose(
        np.asarray(params["modality_type_embeddings"]),
        hf.state_dict()["embeddings.token_type_embeddings.weight"].numpy(),
    )


def test_export_roundtrip_viltbert():
    """viltbert trees export as viltbert_encoder.{vilt,bert}.* and convert
    back to the identical nested tree."""
    import jax

    from climb_tpu.ckpt import convert_torch_state_dict, export_torch_state_dict
    from climb_tpu.models.model_config import ViltConfig
    from climb_tpu.train.model_factory import load_encoder_params

    cfg = ViltConfig(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, image_height=64, image_width=96,
        patch_size=32, pretrain_image_size=64,
    )
    enc, _ = load_encoder_params(None, cfg, pretrained="scratch",
                                 encoder_name="viltbert")
    tree = {"viltbert": enc}

    sd = export_torch_state_dict(tree, kind="model")
    assert any(k.startswith("viltbert_encoder.vilt.") for k in sd)
    assert any(k.startswith("viltbert_encoder.bert.") for k in sd)
    back = convert_torch_state_dict(sd)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        tree, back,
    )

    # encoder-wrapper layout keeps both sides too (vilt.* + bert.*)
    sd2 = export_torch_state_dict(tree, kind="encoder")
    assert any(k.startswith("bert.") for k in sd2)
    back2 = convert_torch_state_dict(sd2)
    assert set(back2["viltbert"]) == {"vilt", "bert"}


def test_save_reference_checkpoint_loads_back(tmp_path):
    from climb_tpu.ckpt import load_params, save_reference_checkpoint

    params = _tiny_model_params()
    path = str(tmp_path / "model")
    save_reference_checkpoint(params, path, kind="model")
    tree = load_params(path)  # auto-detects the torch file we just wrote
    np.testing.assert_allclose(
        np.asarray(tree["vilt"]["word_embeddings"]),
        np.asarray(params["vilt"]["word_embeddings"]),
        atol=1e-6,
    )
