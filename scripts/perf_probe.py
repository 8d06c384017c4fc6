"""TPU perf probe: time individual pieces of the flagship semi step.

Measures, per configuration (remat policy / scan unroll / batch / dtype):
  fwd     - teacher forward + thresholding (pseudo_label_infer_step)
  train   - single-model fwd+bwd+update (pseudo_label_step, update on)
  semi    - the full bench step (pseudo phase + labeled step, 2 models)
  dispatch- empty-jit round-trip through the axon tunnel

Usage examples:
  python scripts/perf_probe.py --what train --remat full
  python scripts/perf_probe.py --what train --remat save:gelu+dwconv+ffn1
  python scripts/perf_probe.py --what semi --remat full,full,save:gelu,none
  python scripts/perf_probe.py --what train --trace /tmp/trace1

Keeps a persistent compile cache in /tmp/jax_tpu_cache so repeated probes
skip the ~200s B5 compile.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="train",
                   choices=["fwd", "train", "semi", "dispatch",
                            "labeled", "stacked", "semistack", "ema"])
    p.add_argument("--remat", default="full")
    p.add_argument("--unroll", type=int, default=2)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--inner", type=int, default=4)
    p.add_argument("--gelu-exact", action="store_true")
    p.add_argument("--attn", default="xla")
    p.add_argument("--trace", default="",
                   help="dump a jax profiler trace to this dir")
    args = p.parse_args()

    import jax

    from semisupervisedobjectdetection_tpu.utils.cache import (
        setup_compile_cache,
    )

    setup_compile_cache("/tmp/jax_tpu_cache")
    import jax.numpy as jnp

    from semisupervisedobjectdetection_tpu.core.config import (
        TrainConfig, mit_b5,
    )
    from semisupervisedobjectdetection_tpu.models.segformer import SegFormer
    from semisupervisedobjectdetection_tpu.train.state import TrainState
    from semisupervisedobjectdetection_tpu.train.teacher_student import (
        labeled_step, labeled_step_stacked, pseudo_label_infer_step,
        pseudo_label_step,
    )

    platform = jax.devices()[0].platform
    print(f"# platform={platform}", file=sys.stderr)

    if args.what == "dispatch":
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros(())
        x = f(x); float(x)
        t0 = time.time()
        n = 50
        for _ in range(n):
            x = f(x)
            float(x)
        sync_rt = (time.time() - t0) / n
        t0 = time.time()
        for _ in range(n):
            x = f(x)
        float(x)
        async_rt = (time.time() - t0) / n
        print(json.dumps({"what": "dispatch",
                          "sync_roundtrip_ms": round(sync_rt * 1e3, 3),
                          "async_dispatch_ms": round(async_rt * 1e3, 3)}))
        return


    cfg = mit_b5(dtype="bfloat16", gelu_approx=not args.gelu_exact,
                 scan_unroll=args.unroll, remat=args.remat,
                 attn_impl=args.attn)
    tc = TrainConfig()
    model = SegFormer(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (args.batch, args.size,
                                            args.size, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(0, 1, (args.batch, args.size,
                                           args.size)) > 0.7, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1])
    teacher = TrainState.create(variables, tc, lr=5e-7)

    update_t = jnp.asarray(True)
    sup_w = jnp.asarray(0.8)

    if args.what == "fwd":
        def step(t, s, i):
            out = pseudo_label_infer_step(t, images, cfg)
            return out.teacher_state, s, out.loss
        student = None
    elif args.what == "train":
        def step(t, s, i):
            out = pseudo_label_step(t, images, update_t, cfg)
            return out.teacher_state, s, out.loss
        student = None
    elif args.what in ("labeled", "stacked"):
        student = TrainState.create(variables, tc, lr=3e-5)
        fn = labeled_step if args.what == "labeled" else labeled_step_stacked

        def step(t, s, i):
            lout = fn(t, s, images, masks, sup_w, cfg, denoise_label=True)
            return lout.teacher_state, lout.student_state, \
                lout.student_loss_total
    elif args.what == "semistack":
        student = TrainState.create(variables, tc, lr=3e-5)

        def step(t, s, i):
            out = pseudo_label_infer_step(t, images, cfg)
            lout = labeled_step_stacked(out.teacher_state, s, images, masks,
                                        sup_w, cfg, denoise_label=True)
            return lout.teacher_state, lout.student_state, \
                lout.student_loss_total
    elif args.what == "ema":
        # The flagship fused EMA step (bench.py default mode).
        from semisupervisedobjectdetection_tpu.train.ema import (
            ema_semi_step,
        )

        student = TrainState.create(variables, tc, lr=3e-5)
        unlabeled = jnp.asarray(
            np.random.default_rng(1).uniform(
                0, 1, (args.batch, args.size, args.size, 3)), jnp.float32)
        decay = jnp.asarray(0.999)

        def step(t, s, i):
            out = ema_semi_step(t, s, unlabeled, images, masks, sup_w,
                                decay, cfg)
            return out.teacher_state, out.student_state, \
                out.student_loss_total
    else:  # semi: the exact bench composition
        student = TrainState.create(variables, tc, lr=3e-5)

        def step(t, s, i):
            if i % 4 == 0:
                out = pseudo_label_step(t, images, update_t, cfg)
            else:
                out = pseudo_label_infer_step(t, images, cfg)
            lout = labeled_step(out.teacher_state, s, images, masks,
                                sup_w, cfg, denoise_label=True)
            return lout.teacher_state, lout.student_state, \
                lout.student_loss_total

    t0 = time.time()
    teacher, student, loss = step(teacher, student, 0)
    float(loss)
    teacher, student, loss = step(teacher, student, 1)
    float(loss)
    compile_s = time.time() - t0

    if args.trace:
        import jax.profiler
        jax.profiler.start_trace(args.trace)

    times = []
    idx = 0
    for _ in range(max(2, args.iters // 2)):
        t0 = time.time()
        for _ in range(args.inner):
            teacher, student, loss = step(teacher, student, idx)
            idx += 1
        float(loss)
        times.append((time.time() - t0) / args.inner)

    if args.trace:
        jax.profiler.stop_trace()

    step_s = float(np.median(times))
    print(json.dumps({
        "what": args.what, "remat": args.remat, "unroll": args.unroll,
        "batch": args.batch, "gelu_exact": args.gelu_exact,
        "attn": args.attn,
        "step_ms": round(step_s * 1e3, 2),
        "compile_s": round(compile_s, 1),
        "times_ms": [round(t * 1e3, 1) for t in times],
    }))


if __name__ == "__main__":
    main()
