"""Torch-oracle parity for the MODIFIED (prompt/CLS) SegFormer path.

The reference's scientific core is its set of modifications to the vendored
HF SegFormer (SURVEY.md §2.3): prompt-aware SR reduction
(`segformer_source/models/segformer/modeling_segformer.py:186-205`),
per-layer prefix strip (`:352-363`), carried CLS (`:444-465`) and
decode-head CLS injection (`:711-724`). Stock transformers (covered by
test_hf_parity.py) lacks all of them — these tests import the reference's
OWN modified torch model from /root/reference (read-only; its vendored
transformers snapshot needs a stubbed dependency_versions_check because the
installed tokenizers is newer than the 2023 pin) and diff logits directly.

Also covers VERDICT round-2 missing #2: a parity slice at REAL B5
dimensions (stage-3: 1024 tokens, 320 ch, 5 heads, sr 2; stage-4 512 ch
feeding the hardcoded cls_dim=512 `cls_proj`; decoder_hidden 768).
"""

import numpy as np

import jax
import jax.numpy as jnp

from semisupervisedobjectdetection_tpu.core.config import MiTConfig

from _ref_oracle import build_pair as _build_pair  # noqa: E402


def _diff_logits(ref, flax_model, variables, x_nchw):
    import torch

    with torch.no_grad():
        out, ref_cls = ref(torch.tensor(x_nchw))
    torch_logits = out.logits.numpy()
    logits, cls_list = jax.jit(flax_model.apply)(
        variables, jnp.asarray(x_nchw.transpose(0, 2, 3, 1)))
    ours = np.asarray(logits, np.float32).transpose(0, 3, 1, 2)
    assert ours.shape == torch_logits.shape
    np.testing.assert_allclose(ours, torch_logits, atol=2e-4, rtol=1e-3)
    return ref_cls, cls_list


TINY = dict(hidden_sizes=(8, 16, 32, 64), num_heads=(1, 2, 4, 8),
            sr_ratios=(8, 4, 2, 1), decoder_hidden=32, num_labels=1,
            drop_path_rate=0.0)


def test_shared_prompt_tokens_match_reference_oracle():
    """Prompt-aware SR reduction + per-layer prefix strip (`:186-205`,
    `:352-363`) with per-stage shared prompts (isSamePerLayer=True)."""
    cfg = MiTConfig(depths=(2, 2, 2, 2), prompt_tokens=(10, 10, 10, 10),
                    prompt_per_layer=False, **TINY)
    ref, fm, variables = _build_pair(cfg, prompt=(10, 10, 10, 10))
    x = np.random.default_rng(0).uniform(
        0, 1, (2, 3, 64, 64)).astype(np.float32)
    _diff_logits(ref, fm, variables, x)


def test_per_layer_prompt_tokens_match_reference_oracle():
    """Per-layer distinct prompts (`add_prompt_token(..., False)` ->
    (depth, T, C) tokens indexed per layer, `modeling_segformer.py:444-453`)."""
    cfg = MiTConfig(depths=(2, 2, 2, 2), prompt_tokens=(4, 4, 4, 4),
                    prompt_per_layer=True, **TINY)
    ref, fm, variables = _build_pair(cfg, prompt=(4, 4, 4, 4),
                                     per_layer=True)
    x = np.random.default_rng(1).uniform(
        0, 1, (2, 3, 64, 64)).astype(np.float32)
    _diff_logits(ref, fm, variables, x)


def test_gradients_match_reference_oracle():
    """BACKWARD parity vs the reference's own modified torch model: forward
    logit parity cannot catch backward-path semantic bugs (a stray
    stop_gradient, a wrong custom VJP, grads not flowing through the
    prompt-aware SR reduction). Loss = mean(W * logits) for a fixed random
    W — linear in the logits, so it isolates the MODEL backward from any
    loss-implementation difference — and every parameter gradient is
    compared through the same hf_import name mapping the weights use.
    Prompt-token leaves are excluded (the reference's tokens are raw
    non-parameter tensors outside autograd, `SegFormerModel.py:69-91`)."""
    import torch

    from semisupervisedobjectdetection_tpu.checkpoint.hf_import import (
        import_torch_state_dict,
    )

    cfg = MiTConfig(depths=(2, 2, 2, 2), prompt_tokens=(4, 4, 4, 4),
                    prompt_per_layer=False, **TINY)
    ref, fm, variables = _build_pair(cfg, prompt=(4, 4, 4, 4))
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    out, _ = ref(torch.tensor(x))
    w = rng.normal(size=out.logits.shape).astype(np.float32)
    (torch.tensor(w) * out.logits).mean().backward()

    # route the torch grads through the SAME tensor-name mapping as the
    # weights: a state_dict whose parameter entries are their grads
    gsd = dict(ref.state_dict())
    for name, p in ref.named_parameters():
        gsd[name] = (p.grad if p.grad is not None
                     else torch.zeros_like(p)).detach()
    want_grads, _ = import_torch_state_dict(
        gsd, cfg, variables["params"], variables["batch_stats"])

    w_nhwc = jnp.asarray(w.transpose(0, 2, 3, 1))

    def loss_fn(params):
        logits, _ = fm.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             jnp.asarray(x.transpose(0, 2, 3, 1)))
        return jnp.mean(w_nhwc * logits.astype(jnp.float32))

    got_grads = jax.jit(jax.grad(loss_fn))(variables["params"])

    flat_want = [(jax.tree_util.keystr(kp), np.asarray(v, np.float32))
                 for kp, v in
                 jax.tree_util.tree_flatten_with_path(want_grads)[0]]
    # GLOBAL noise floor: mathematically-zero grads (e.g. attention key
    # bias — softmax is invariant to a per-query constant) are pure
    # accumulation noise (~1e-15) on BOTH sides; a per-leaf floor would
    # still select them, so scale to the whole gradient instead.
    gmax = max(float(np.max(np.abs(a))) for k, a in flat_want
               if "prompt_tokens" not in k and "cls_token" not in k)
    gfloor = 1e-4 * gmax
    checked = 0
    for (key, a), got in zip(flat_want, jax.tree.leaves(got_grads)):
        if "prompt_tokens" in key or "cls_token" in key:
            continue  # torch side: non-parameter tensors, no autograd
        b = np.asarray(got, np.float32)
        sel = np.abs(a) > gfloor
        checked += int(sel.sum())
        np.testing.assert_allclose(
            a[sel], b[sel], rtol=2e-2, atol=2.0 * gfloor,
            err_msg=f"grad mismatch at {key}")
        if float(np.max(np.abs(a), initial=0.0)) > gfloor:
            # the leaf's overall scale must agree (catches a dead branch)
            np.testing.assert_allclose(
                float(np.linalg.norm(a)), float(np.linalg.norm(b)),
                rtol=2e-2, atol=2.0 * gfloor,
                err_msg=f"grad norm mismatch at {key}")
    assert checked > 1000


def test_cls_and_prompts_match_reference_oracle_at_b5_dims():
    """Carried CLS (`:444-465`) + decode-head CLS injection (`:711-724`)
    need hidden_sizes[-1]==512 (the reference hardcodes cls_dim=512), so
    this runs at REAL B5 widths/heads/sr (depths shortened to (2,1,2,1) for
    CPU time) at 512x512 input — stage 3 sees 1024 tokens at 320 ch /
    5 heads / sr 2 and the decode head fuses at decoder_hidden 768,
    closing the dims-dependent-bug gap (VERDICT round 2, missing #2)."""
    cfg = MiTConfig(depths=(2, 1, 2, 1),
                    hidden_sizes=(64, 128, 320, 512),
                    num_heads=(1, 2, 5, 8), sr_ratios=(8, 4, 2, 1),
                    decoder_hidden=768, num_labels=1, drop_path_rate=0.0,
                    prompt_tokens=(10, 10, 10, 10), prompt_per_layer=False,
                    cls_tokens=(1, 1, 1, 1))
    ref, fm, variables = _build_pair(cfg, prompt=(10, 10, 10, 10),
                                     cls=True)
    x = np.random.default_rng(2).uniform(
        0, 1, (1, 3, 512, 512)).astype(np.float32)
    ref_cls, cls_list = _diff_logits(ref, fm, variables, x)

    # The reference forward also returns sigmoid(final-stage CLS)
    # (`modeling_segformer.py:848-850`); ours returns the raw carried CLS.
    want = np.asarray(ref_cls.detach().numpy(), np.float32)
    got = np.asarray(jax.nn.sigmoid(
        cls_list[-1].astype(jnp.float32)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
