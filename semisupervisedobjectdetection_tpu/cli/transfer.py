"""Prompt-tuning transfer-learning CLI —
`main_segformer/segFormer_transfer_learning_main.py`.

Run:  python -m semisupervisedobjectdetection_tpu.cli.transfer \
          --synthetic --variant b0 --img-size 128 --epochs 2 \
          --frozen 0,1 --prompt-tokens 10,10,10,10

Warm-starts from an autoencoder (or any) checkpoint, freezes encoder
stages, adds prompt tokens and fine-tunes supervised (ref `:199-206`).
`--tune` sweeps lr x frozen-set x token-count like `Hyperparameter_Tuning`
(`:107-160`: tokens in {1, 10, 100}).
"""

from __future__ import annotations

from semisupervisedobjectdetection_tpu.api import SegFormerModel
from semisupervisedobjectdetection_tpu.cli import common
from semisupervisedobjectdetection_tpu.cli.supervised import train_loop
from semisupervisedobjectdetection_tpu.core.config import (
    MIT_VARIANTS,
    product_grid,
)
from semisupervisedobjectdetection_tpu.utils import preemption
from semisupervisedobjectdetection_tpu.utils.logging import MetricLogger


def build_model(args, tc, cfg, frozen, tokens, same_per_layer=True,
                lr=None):
    model = SegFormerModel(pretrain_weight=args.pretrain_weight,
                           train_config=tc, config=cfg, lr=lr,
                           hf_weights=args.hf_weights,
                           grad_accum=args.grad_accum)
    if frozen:
        model.frozen_encoder(layers=frozen)
    if any(tokens):
        model.add_prompt_token(tokens, isSamePerLayer=same_per_layer)
    return model


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--frozen", default="0,1",
                   help="comma-separated encoder stages to freeze")
    p.add_argument("--prompt-tokens", default="10,10,10,10")
    p.add_argument("--per-layer-prompts", action="store_true")
    p.add_argument("--tune", action="store_true",
                   help="grid search lr x frozen x token count")
    p.add_argument("--tune-lrs", default="1e-4,5e-5,1e-5")
    p.add_argument("--tune-tokens", default="1,10,100",
                   help="token counts for --tune (reference grid "
                        "{1,10,100}, `:181-184`)")
    p.add_argument("--resume", action="store_true",
                   help="crash-safe mode: write a <ckpt-dir>/*_last "
                        "checkpoint every epoch and continue from it when "
                        "present (ignored under --tune: grid points must "
                        "not share one _last)")
    args = p.parse_args(argv)
    common.warn_parallel_unsupported(args, 'transfer')
    if args.tune and args.resume:
        print("--resume is ignored under --tune (each grid point would "
              "otherwise restore the previous point's _last checkpoint)")
        args.resume = False
    dcfg, tc = common.configs_from_args(args)
    dcfg = common.ensure_data(args, dcfg)
    loaders = common.make_loaders(dcfg, args.seed)
    common.check_grad_accum(args, loaders["train"])
    cfg = MIT_VARIANTS[args.variant](dtype=args.dtype)
    cfg = common.apply_perf_preset(cfg, args)
    logger = MetricLogger(args.metrics_csv)

    frozen = [int(x) for x in args.frozen.split(",") if x != ""]
    tokens = tuple(int(x) for x in args.prompt_tokens.split(","))

    if args.tune:
        lrs = [float(x) for x in args.tune_lrs.split(",") if x]
        toks = [int(x) for x in args.tune_tokens.split(",") if x != ""]
        grid = product_grid(lrs, [tuple(frozen), (0, 1, 2)],
                            toks, shuffle=True, seed=args.seed)

        def point(pt, plog):
            lr, fz, tok = pt
            model = build_model(args, tc, cfg, list(fz), (tok,) * 4,
                                lr=lr)
            return train_loop(
                model, loaders, dcfg,
                tc.replace(epochs=max(tc.epochs // 5, 1)),
                args, plog, save_model=False)

        common.sweep_grid(
            args, grid, point,
            tag_of=lambda p: (f"lr{p[0]}_fz{'-'.join(map(str, p[1]))}"
                              f"_tok{p[2]}"),
            show_of=lambda p: f"lr={p[0]} frozen={p[1]} tokens={p[2]}",
            empty_hint="check --tune-lrs / --tune-tokens")
        return

    model = build_model(args, tc, cfg, frozen, tokens,
                        not args.per_layer_prompts)
    train_loop(model, loaders, dcfg, tc, args, logger)
    logger.close()
    common.maybe_plot_curves(args)


if __name__ == "__main__":
    preemption.install()
    main()
