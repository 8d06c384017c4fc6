"""Pipeline parallelism (parallel/pipeline.py): stage-per-device predict
matches the single-device forward; devices hold only their stage's params."""

import jax
import jax.numpy as jnp
import numpy as np

from semisupervisedobjectdetection_tpu.core.config import mit_b0
from semisupervisedobjectdetection_tpu.models.segformer import (
    SegFormer,
    predict_masks,
)
from semisupervisedobjectdetection_tpu.parallel.pipeline import (
    PipelinedSegFormer,
)

CFG = mit_b0(depths=(1, 1, 2, 1), hidden_sizes=(16, 32, 64, 128),
             num_heads=(1, 2, 4, 8), decoder_hidden=32,
             cls_tokens=(1, 1, 1, 1))


def _setup():
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(4, 64, 64, 3)),
                    jnp.float32)
    variables = jax.jit(SegFormer(CFG).init)(jax.random.PRNGKey(0), x)
    return x, variables


def test_pipeline_matches_single_device():
    x, variables = _setup()
    logits, _ = jax.jit(SegFormer(CFG).apply)(variables, x)
    ref = predict_masks(logits, (64, 64))

    pipe = PipelinedSegFormer(CFG, variables)
    for micro in (0, 2):
        out = pipe.predict(x, micro_batch=micro)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_stages_are_on_distinct_devices():
    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs >=4 devices")
    x, variables = _setup()
    pipe = PipelinedSegFormer(CFG, variables)
    devs = {i: pipe.stage_params[i][f"patch_embed_{i}"]["proj"]["kernel"]
            .devices() for i in range(4)}
    assert devs[0] != devs[1] and devs[1] != devs[2] and devs[2] != devs[3]
    # each stage shard holds ONLY that stage's keys
    for i in range(4):
        assert all(k.endswith(f"_{i}") for k in pipe.stage_params[i])
