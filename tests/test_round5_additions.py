"""Round-5 additions: --grad-accum on the few-shot CLI (the last
gradient loop without it) and the static cls_loss_weight fix.

The accumulation oracles + the seg CLI smoke run in a fresh interpreter
(tests/_fewshot_accum_main.py via test_grad_accum.py — the compile-cache
serializer hazard). Here: only the fail-fast path, which raises BEFORE
any compile and is safe in-worker.
"""

import pytest


def test_fewshot_cli_grad_accum_ae_fails_fast_on_tiny_microbatch(
        tmp_path):
    # few_shot_batch_size is 2 (reference `config.py:40`); accum=2 would
    # leave 1-sample microbatches, which the intra-domain cosine loss
    # cannot pair — the CLI must refuse BEFORE compiling anything.
    from semisupervisedobjectdetection_tpu.cli import fewshot

    with pytest.raises(SystemExit, match="< 2 samples"):
        fewshot.main([
            "--synthetic", "--synthetic-n", "6", "--variant", "b0",
            "--img-size", "64", "--batch-size", "2", "--dtype",
            "float32", "--epochs", "1", "--mode", "ae",
            "--iterations", "1", "--grad-accum", "2",
            "--checkpoint-dir", str(tmp_path / "ck")])
