"""HF-layout export (`checkpoint/hf_export.py`): the inverse of the
importer. Round-trips flax -> torch state_dict -> flax bit-exactly, and the
exported dict drives the reference's own modified torch model to the same
logits (so checkpoints trained here are usable from the reference stack)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.checkpoint.hf_export import (
    export_prompt_tokens,
    export_torch_state_dict,
    save_torch_checkpoint,
)
from semisupervisedobjectdetection_tpu.checkpoint.hf_import import (
    import_torch_state_dict,
    load_torch_checkpoint,
)
from semisupervisedobjectdetection_tpu.core.config import MiTConfig
from semisupervisedobjectdetection_tpu.models.segformer import SegFormer

TINY = dict(depths=(2, 1, 1, 2), hidden_sizes=(8, 16, 32, 64),
            num_heads=(1, 2, 4, 8), sr_ratios=(8, 4, 2, 1),
            decoder_hidden=32, num_labels=1, drop_path_rate=0.0)


def _init(cfg, seed=0):
    v = jax.jit(SegFormer(cfg).init)(jax.random.PRNGKey(seed),
                                     jnp.zeros((1, 64, 64, 3)))
    return v["params"], v["batch_stats"]


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = {jax.tree_util.keystr(k): l
          for k, l in jax.tree_util.tree_leaves_with_path(b)}
    assert len(fa) == len(fb)
    for k, la in fa:
        np.testing.assert_array_equal(np.asarray(la, np.float32),
                                      np.asarray(fb[jax.tree_util.keystr(k)],
                                                 np.float32), err_msg=str(k))


def test_export_import_roundtrip_exact():
    cfg = MiTConfig(**TINY)
    params, stats = _init(cfg)
    sd = export_torch_state_dict(cfg, params, stats)
    # fresh differently-seeded target proves values come from the export
    tparams, tstats = _init(cfg, seed=1)
    got_p, got_s = import_torch_state_dict(sd, cfg, tparams, tstats)
    _tree_equal(params, got_p)
    _tree_equal(stats, got_s)


def test_export_covers_prompt_and_cls_separately():
    cfg = MiTConfig(prompt_tokens=(4, 4, 4, 4), prompt_per_layer=False,
                    cls_tokens=(1, 1, 1, 1), **TINY)
    params, stats = _init(cfg)
    sd = export_torch_state_dict(cfg, params, stats)
    # cls_proj IS a torch module param (modeling_segformer.py:711-715)...
    assert "decode_head.linear_c.0.cls_proj.weight" in sd
    # ...but prompt/CLS tokens are not (SegFormerModel.py:69-101): they
    # export through the side channel
    assert not any("prompt" in k or "cls_token" in k for k in sd)
    prompts, cls = export_prompt_tokens(cfg, params)
    for i in range(4):
        np.testing.assert_array_equal(
            prompts[i], np.asarray(params["encoder"][f"prompt_tokens_{i}"],
                                   np.float32))
        assert cls[i].shape == (1, cfg.hidden_sizes[i])


def test_save_formats_roundtrip(tmp_path):
    pytest.importorskip("safetensors")
    cfg = MiTConfig(**TINY)
    params, stats = _init(cfg)
    sd = export_torch_state_dict(cfg, params, stats)
    for name in ("ck.safetensors", "ck.pth"):
        path = str(tmp_path / name)
        if name.endswith(".pth"):
            pytest.importorskip("torch")
        save_torch_checkpoint(path, sd)
        back = load_torch_checkpoint(path)
        assert set(back) == set(sd)
        # a non-trivially-transposed weight (catches view-vs-buffer
        # serialization bugs that singleton-dim tensors cannot)
        for key in ("decode_head.linear_c.0.proj.weight",
                    "decode_head.classifier.weight"):
            np.testing.assert_array_equal(np.asarray(back[key]), sd[key])


def test_api_export_hf_load_hf_roundtrip(tmp_path):
    pytest.importorskip("safetensors")
    from semisupervisedobjectdetection_tpu.api import SegFormerModel

    cfg = MiTConfig(**TINY)
    a = SegFormerModel(config=cfg, seed=0)
    path = str(tmp_path / "export.safetensors")
    a.export_hf(path)
    b = SegFormerModel(config=cfg, seed=5, hf_weights=path)
    _tree_equal(a.state.params, b.state.params)
    _tree_equal(a.state.batch_stats, b.state.batch_stats)


def test_exported_state_dict_drives_reference_oracle():
    """Gold interop check: load the export into the reference's own
    modified torch model and diff logits against our forward."""
    torch = pytest.importorskip("torch")
    from _ref_oracle import load_reference_segformer

    RefConfig, RefModel = load_reference_segformer()
    cfg = MiTConfig(**TINY)
    params, stats = _init(cfg)
    sd = export_torch_state_dict(cfg, params, stats)

    hf_cfg = RefConfig(
        num_channels=3, num_encoder_blocks=4,
        depths=list(cfg.depths), sr_ratios=list(cfg.sr_ratios),
        hidden_sizes=list(cfg.hidden_sizes),
        num_attention_heads=list(cfg.num_heads),
        patch_sizes=list(cfg.patch_sizes), strides=list(cfg.strides),
        decoder_hidden_size=cfg.decoder_hidden, num_labels=cfg.num_labels,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        classifier_dropout_prob=0.0, drop_path_rate=0.0,
        reshape_last_stage=True)
    ref = RefModel(hf_cfg).eval()
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    # the modified reference creates cls_proj unconditionally; a no-CLS
    # export legitimately leaves it fresh — nothing else may be missing
    assert all("cls_proj" in k for k in missing), missing

    x = np.random.default_rng(3).uniform(
        0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out, _ = ref(torch.tensor(x))
    want = out.logits.numpy()
    logits, _ = jax.jit(SegFormer(cfg).apply)(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(logits, np.float32).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
