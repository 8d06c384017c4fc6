"""`python -m semisupervisedobjectdetection_tpu` — install self-test.

The reference has no way to check an environment short of launching a real
training run against the private dataset (`readme.md:18-19` — edit a
script, hope the stack works). This entry point validates the whole stack
in about a minute on any backend: device discovery, jitted init, one
supervised train step (loss finite AND improving over a few steps), a
binarized predict, checkpoint save/restore round-trip, and — when more
than one device is visible — a data-parallel sharded step on a real
`jax.sharding.Mesh`.

Exit code 0 = every check passed; 1 = the named check failed. Use
`--quick` to skip the multi-device check (e.g. on the single tunneled
TPU).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _check(name: str, fn, results: list) -> bool:
    t0 = time.time()
    try:
        detail = fn() or ""
        results.append((name, True, time.time() - t0, detail))
        print(f"  ok    {name} ({time.time() - t0:.1f}s) {detail}",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — a self-test reports, not raises
        results.append((name, False, time.time() - t0, f"{type(e).__name__}: {e}"))
        print(f"  FAIL  {name}: {type(e).__name__}: {e}", flush=True)
        return False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true",
                   help="skip the multi-device sharded-step check")
    p.add_argument("--size", type=int, default=64,
                   help="self-test tile size (default 64)")
    p.add_argument("--cpu", type=int, metavar="N", default=0,
                   help="force the CPU backend with N virtual devices "
                        "(exercises the sharded-step check without TPUs; "
                        "a plain JAX_PLATFORMS=cpu is ignored when a TPU "
                        "plugin pre-registers itself, so this flag flips "
                        "jax.config instead)")
    args = p.parse_args(argv)

    if args.cpu:
        # Drop any inherited device-count flag so --cpu N always wins
        # (a stale =1 from a test harness would silently skip the
        # multi-device check while reporting success).
        kept = [f for f in os.environ.get("XLA_FLAGS", "").split()
                if "xla_force_host_platform_device_count" not in f]
        kept.append(f"--xla_force_host_platform_device_count={args.cpu}")
        os.environ["XLA_FLAGS"] = " ".join(kept)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        from semisupervisedobjectdetection_tpu.utils.cache import (
            setup_compile_cache,
        )

        setup_compile_cache("/tmp/jax_selftest_cache",
                            min_compile_secs=0.5)
    import jax.numpy as jnp
    import numpy as np

    import semisupervisedobjectdetection_tpu as pkg
    from semisupervisedobjectdetection_tpu.core.config import (
        TrainConfig,
        mit_b0,
    )

    devs = jax.devices()
    print(f"semisupervisedobjectdetection_tpu {pkg.__version__} — "
          f"jax {jax.__version__}, backend={devs[0].platform} "
          f"({len(devs)} device(s))", flush=True)

    cfg = mit_b0(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
                 num_heads=(1, 2, 4, 8), decoder_hidden=32,
                 dtype="float32")
    s = args.size
    results: list = []
    state_box: dict = {}

    def init_and_train():
        from semisupervisedobjectdetection_tpu.models import SegFormer
        from semisupervisedobjectdetection_tpu.train import TrainState
        from semisupervisedobjectdetection_tpu.train.supervised import (
            train_step,
        )

        rng = jax.random.PRNGKey(0)
        imgs = jax.random.uniform(rng, (4, s, s, 3))
        masks = (jax.random.uniform(jax.random.fold_in(rng, 1),
                                    (4, s, s)) > 0.7).astype(jnp.float32)
        variables = jax.jit(SegFormer(cfg).init)(
            rng, jnp.zeros((1, s, s, 3)))
        state = TrainState.create(variables, TrainConfig(lr=3e-3))
        losses = []
        for i in range(8):
            state, loss, _ = train_step(state, imgs, masks,
                                        jax.random.fold_in(rng, i), cfg)
            losses.append(float(loss))
        if not all(np.isfinite(losses)):
            raise RuntimeError(f"non-finite losses: {losses}")
        if not losses[-1] < losses[0] - 1e-3:
            raise RuntimeError(f"loss did not improve: {losses[0]:.4f} -> "
                               f"{losses[-1]:.4f}")
        state_box["state"] = state
        return f"loss {losses[0]:.3f} -> {losses[-1]:.3f}"

    def predict():
        from semisupervisedobjectdetection_tpu.train.supervised import (
            predict_step,
        )

        state = state_box["state"]
        probs = predict_step(state, jnp.zeros((2, s, s, 3)), cfg)
        m = np.asarray(probs)
        if m.shape != (2, s, s) or not np.isfinite(m).all():
            raise RuntimeError(f"bad predict output {m.shape}")
        if m.min() < 0.0 or m.max() > 1.0:
            raise RuntimeError("probabilities outside [0, 1]")
        return f"mask {m.shape}, p in [{m.min():.2f}, {m.max():.2f}]"

    def checkpoint_roundtrip():
        import tempfile

        from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
            restore_state,
            save_state,
        )
        from semisupervisedobjectdetection_tpu.models import SegFormer
        from semisupervisedobjectdetection_tpu.train import TrainState

        state = state_box["state"]
        d = tempfile.mkdtemp(prefix="sso_selftest_")
        save_state(f"{d}/ck", state)
        fresh = TrainState.create(
            jax.jit(SegFormer(cfg).init)(jax.random.PRNGKey(7),
                                         jnp.zeros((1, s, s, 3))),
            TrainConfig(lr=3e-3))
        got = restore_state(f"{d}/ck", fresh)
        for a, b in zip(jax.tree.leaves(got.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        return "params bit-identical after restore"

    def sharded_step():
        from semisupervisedobjectdetection_tpu.parallel import (
            get_mesh,
            shard_batch,
        )
        from semisupervisedobjectdetection_tpu.parallel.mesh import (
            replicate,
        )
        from semisupervisedobjectdetection_tpu.train.supervised import (
            train_step,
        )

        n = len(jax.devices())
        mesh = get_mesh()
        state = replicate(mesh, state_box["state"])
        b = max(n, 4) // n * n    # batch divisible by the device count
        rng = jax.random.PRNGKey(2)
        bi, bm = shard_batch(mesh, (
            jax.random.uniform(rng, (b, s, s, 3)),
            (jax.random.uniform(jax.random.fold_in(rng, 1),
                                (b, s, s)) > 0.7).astype(jnp.float32)))
        state, loss, _ = train_step(state, bi, bm, rng, cfg)
        if not np.isfinite(float(loss)):
            raise RuntimeError(f"non-finite sharded loss {float(loss)}")
        return f"dp step over {n} devices, loss {float(loss):.3f}"

    ok = _check("jitted init + 8 train steps", init_and_train, results)
    if ok:
        _check("predict (binarizable probabilities)", predict, results)
        _check("checkpoint save/restore round-trip", checkpoint_roundtrip,
               results)
        if not args.quick and len(devs) > 1:
            _check(f"data-parallel step ({len(devs)} devices)",
                   sharded_step, results)
        elif not args.quick:
            print("  skip  data-parallel step (1 device)", flush=True)
    n_fail = sum(1 for _, passed, _, _ in results if not passed)
    n_pass = len(results) - n_fail
    print(f"self-test: {n_pass} passed, {n_fail} failed", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
