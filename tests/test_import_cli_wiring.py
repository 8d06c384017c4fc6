"""End-to-end CLI wiring of the pretrained-weight importers: a hub-format
DINOv2 file warm-starts `cli.vit_pipeline`, and a torchvision-format
ResNeXt file warm-starts `cli.baseline_cnn` (reference load sites:
`models/VitSegModel.py:20`, `main_other/baseline_segmentation.py:154-162`).
"""

import numpy as np
import pytest


def _save_hub_dinov2(path, dim=32, depth=2, patch=8, img=518):
    import torch

    torch.manual_seed(0)
    n = (img // patch) ** 2
    sd = {
        "cls_token": torch.randn(1, 1, dim),
        "pos_embed": torch.randn(1, n + 1, dim),
        "patch_embed.proj.weight": torch.randn(dim, 3, patch, patch),
        "patch_embed.proj.bias": torch.randn(dim),
        "norm.weight": torch.randn(dim),
        "norm.bias": torch.randn(dim),
    }
    hidden = dim * 4
    for i in range(depth):
        b = f"blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": torch.randn(dim),
            f"{b}.norm1.bias": torch.randn(dim),
            f"{b}.norm2.weight": torch.randn(dim),
            f"{b}.norm2.bias": torch.randn(dim),
            f"{b}.attn.qkv.weight": torch.randn(3 * dim, dim) * 0.02,
            f"{b}.attn.qkv.bias": torch.zeros(3 * dim),
            f"{b}.attn.proj.weight": torch.randn(dim, dim) * 0.02,
            f"{b}.attn.proj.bias": torch.zeros(dim),
            f"{b}.ls1.gamma": torch.full((dim,), 1e-5),
            f"{b}.ls2.gamma": torch.full((dim,), 1e-5),
            f"{b}.mlp.fc1.weight": torch.randn(hidden, dim) * 0.02,
            f"{b}.mlp.fc1.bias": torch.zeros(hidden),
            f"{b}.mlp.fc2.weight": torch.randn(dim, hidden) * 0.02,
            f"{b}.mlp.fc2.bias": torch.zeros(dim),
        })
    torch.save(sd, path)


def test_vit_pipeline_dinov2_flag(tmp_path, capsys):
    from semisupervisedobjectdetection_tpu.cli.vit_pipeline import main

    # vit_small + --vit-depth 2: embed 384, 2 blocks, patch 8. The saved
    # hub checkpoint matches those dims but carries the 518-image pos-embed
    # grid, exercising the importer's bicubic resample too.
    ckpt = str(tmp_path / "dinov2_tiny.pth")
    _save_hub_dinov2(ckpt, dim=384, depth=2, patch=8, img=518)
    main(["--synthetic", "--mode", "seg", "--vit", "small",
          "--img-size", "32", "--patch-size", "8", "--epochs", "1",
          "--synthetic-n", "4", "--batch-size", "2",
          "--checkpoint-dir", "", "--dtype", "float32",
          "--vit-depth", "2", "--dinov2-weights", ckpt])
    assert "warm-started" in capsys.readouterr().out


def test_dinov2_depth_mismatch_raises(tmp_path):
    import jax
    import jax.numpy as jnp

    from semisupervisedobjectdetection_tpu.checkpoint.dinov2_import import (
        import_dinov2_state_dict,
        load_dinov2_checkpoint,
    )
    from semisupervisedobjectdetection_tpu.models.vit import DinoViT

    ckpt = str(tmp_path / "d2.pth")
    _save_hub_dinov2(ckpt, dim=32, depth=2, patch=8, img=32)
    model = DinoViT(img_size=32, patch_size=8, embed_dim=32, depth=3,
                    num_heads=2)
    v = jax.jit(model.init)(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)))
    with pytest.raises(ValueError, match="blocks"):
        import_dinov2_state_dict(load_dinov2_checkpoint(ckpt),
                                 v["params"])


def test_baseline_cnn_encoder_weights_flag(tmp_path):
    from tests.test_resnext_import import build_torch_trunk
    import torch
    from semisupervisedobjectdetection_tpu.cli.baseline_cnn import main

    trunk = build_torch_trunk()
    ckpt = str(tmp_path / "resnext_tiny.pth")
    torch.save(trunk.state_dict(), ckpt)
    main(["--synthetic", "--img-size", "64", "--epochs", "1",
          "--synthetic-n", "4", "--batch-size", "2", "--archs",
          "deeplabv3p", "--encoder-depths", "1,1,1,1",
          "--encoder-groups", "2", "--encoder-base-width", "8",
          "--checkpoint-dir", "", "--dtype", "float32",
          "--encoder-weights", ckpt])
