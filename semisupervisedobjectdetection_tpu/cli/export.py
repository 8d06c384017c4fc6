"""Export an AOT serving artifact from a trained checkpoint.

`python -m semisupervisedobjectdetection_tpu.cli.export --pretrain-weight
CKPT --out model.ssod` compiles the eval-mode predict at one pinned batch
shape and writes a single self-contained file (weights baked into the
StableHLO program — `checkpoint/serving_export.py`). Serve it with
`cli.serve --artifact model.ssod` or load it in any jax process via
`load_serving`; no flax, model code, or checkpoint tree needed at serving
time.

The reference has no deployment story beyond re-running its training
scripts in `Prediction()` mode (`main_segformer/segFormer_main.py:103-144`);
this is the TPU-native production substitute.
"""

from __future__ import annotations


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Export a self-contained AOT serving artifact.")
    p.add_argument("--variant", default="b5")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--pretrain-weight", help="orbax checkpoint to restore")
    p.add_argument("--hf-weights",
                   help="torch .pth/.safetensors SegFormer weights")
    p.add_argument("--int8", action="store_true",
                   help="quantize to the int8 serving path first (~4x "
                        "smaller artifact, ~2x MXU rate on v5e)")
    p.add_argument("--fp8", action="store_true",
                   help="quantize to the fp8 (e4m3) serving path first "
                        "— native-rate on fp8-MXU TPUs (v6e+)")
    p.add_argument("--batch", type=int, default=8,
                   help="compiled batch size (smaller requests are padded "
                        "at serving time; larger ones rejected)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--perf", action="store_true",
                   help="tanh-approx GELU preset (the benched fast config)")
    p.add_argument("--out", required=True, help="artifact path to write")
    args = p.parse_args(argv)

    from semisupervisedobjectdetection_tpu.api import SegFormerModel
    from semisupervisedobjectdetection_tpu.core.config import MIT_VARIANTS

    cfg = MIT_VARIANTS[args.variant](dtype=args.dtype)
    if args.perf:
        cfg = cfg.replace(gelu_approx=True)
    model = SegFormerModel(pretrain_weight=args.pretrain_weight,
                           config=cfg, hf_weights=args.hf_weights)
    if not (args.pretrain_weight or args.hf_weights):
        print("WARNING: exporting randomly initialized weights "
              "(no --pretrain-weight / --hf-weights)")
    if args.int8 and args.fp8:
        raise SystemExit("--int8 and --fp8 are mutually exclusive")
    if args.int8 or args.fp8:
        model.quantize(kind="fp8" if args.fp8 else "int8")
    header = model.export_serving(
        args.out, batch_size=args.batch, img_size=args.img_size,
        platforms=tuple(s for s in args.platforms.split(",") if s))
    import os

    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB): "
          f"{header}")


if __name__ == "__main__":
    main()
