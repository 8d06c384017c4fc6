"""Shared CLI plumbing for the six workload entry points.

The reference is driven by hand-edited scripts (`readme.md:18-19`,
SURVEY.md §5 config row); here every workload is an argparse CLI with a
`--synthetic` mode that generates Georgia-shaped tiles on the fly so any
workload runs end-to-end without the private dataset.
"""

from __future__ import annotations

import argparse
import os
import tempfile
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from semisupervisedobjectdetection_tpu.core.config import (
    DataConfig,
    MIT_VARIANTS,
    TrainConfig,
)
from semisupervisedobjectdetection_tpu.data.augment import (
    augment_batch,
    eval_batch,
)
from semisupervisedobjectdetection_tpu.data.loader import TileLoader
from semisupervisedobjectdetection_tpu.data.synthetic import (
    write_synthetic_dataset,
)
from semisupervisedobjectdetection_tpu.data.tiles import TileDataset


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--dataset", help="labeled train tile dir")
    p.add_argument("--evalset", help="labeled eval tile dir")
    p.add_argument("--maskdir", help="mask dir")
    p.add_argument("--unlabeledset", help="unlabeled tile dir")
    p.add_argument("--pseudoset", help="unlabeled tiles for pseudo-labels")
    p.add_argument("--synthetic", action="store_true",
                   help="generate synthetic tiles (no real data needed)")
    p.add_argument("--synthetic-n", type=int, default=24)
    p.add_argument("--variant", default="b0", choices=sorted(MIT_VARIANTS),
                   help="MiT encoder size (reference uses b5)")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=0,
                   help="0 = DataConfig default")
    p.add_argument("--epochs", type=int, default=0,
                   help="0 = TrainConfig default (50)")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--weight-decay", type=float, default=None)
    p.add_argument("--scheduler", type=float, default=None,
                   help="ExponentialLR gamma")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--pretrain-weight", help="orbax checkpoint to restore")
    p.add_argument("--hf-weights",
                   help="torch .pth/.safetensors SegFormer weights")
    p.add_argument("--metrics-csv", help="CSV metrics path")
    p.add_argument("--plot-curves", action="store_true",
                   help="after training, render --metrics-csv to a "
                        "loss/metric-curve PNG next to it "
                        "(utils/plot_metrics.py — replaces the "
                        "reference's figures/ dumps, "
                        "segFormer_main.py:88-98)")
    p.add_argument("--profile-dir", help="jax.profiler trace dir")
    p.add_argument("--no-quirks", action="store_true",
                   help="disable reference-quirk parity (train prompts, "
                        "dropout on in supervised training)")
    p.add_argument("--reference-eval-aug", action="store_true",
                   help="quirk: run the randomized augmentation chain at "
                        "eval time too, as the reference does "
                        "(config.py:27-38)")
    p.add_argument("--skip-bad-tiles", action="store_true",
                   help="substitute a readable tile (with a one-time "
                        "warning) when one fails to decode, instead of "
                        "crashing the run — production guard for corrupt "
                        "files; forces the Python decode path (the native "
                        "C++ loader fails fast)")
    p.add_argument("--cache-tiles", type=float, default=0.0, metavar="MB",
                   help="LRU-cache decoded tiles in host RAM up to this "
                        "many megabytes, ONE budget shared by all the "
                        "run's datasets (~1 MB per 512² labeled tile): "
                        "epochs after the first skip PNG decode + resize "
                        "entirely. 0 (default) re-decodes every epoch like "
                        "the reference; forces the Python decode path")
    p.add_argument("--perf", action="store_true",
                   help="TPU throughput preset: tanh-approx GELU + scan "
                        "unroll 4 — the bench.py EMA-mode config (exact-"
                        "erf GELU and unroll 2 stay the defaults for "
                        "mIoU-parity runs)")
    p.add_argument("--prefetch", type=int, default=1,
                   help="train-batch device prefetch depth (background "
                        "thread stages decode + H2D + augment ahead of "
                        "the running step, data/prefetch.py); 0 disables. "
                        "Measured on TPU (B5 EMA CLI): depth 1 beats 0 and "
                        "2 (~9.0 vs 11.1 / 11.4 s per epoch) — one staged "
                        "batch hides host IO; two adds HBM+tunnel "
                        "contention")
    p.add_argument("--parallel", default="none",
                   choices=["none", "dp", "fsdp", "tp", "pp", "dp_pp"],
                   help="multi-chip strategy (parallel/): 'dp' replicates "
                        "params and shards batches over all devices, "
                        "'fsdp' additionally shards params+optimizer state "
                        "ZeRO-3-style over the data axis, 'tp' builds a "
                        "(data, tp) mesh with FFN column/row- and "
                        "head-parallel attention tensor parallelism "
                        "(parallel/tp.py) and installs it as the ambient "
                        "mesh (enables ffn_impl='collective'), 'pp' trains "
                        "pipeline-parallel (one MiT stage + its optimizer "
                        "state per device, GPipe microbatch wavefronts — "
                        "parallel/pipeline_train.py; supervised CLI only, "
                        "--grad-accum sets the microbatch count), 'dp_pp' "
                        "composes --dp replica groups of that pipeline. "
                        "'none' (default) keeps the single-device behavior")
    p.add_argument("--tp", type=int, default=2,
                   help="tp-axis size for --parallel tp (must divide the "
                        "device count)")
    p.add_argument("--dp", type=int, default=2,
                   help="replica-group count for --parallel dp_pp (must "
                        "divide the device count)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="gradient accumulation: split each batch into N "
                        "microbatches scanned inside one jitted update "
                        "(peak activation memory of one microbatch, one "
                        "optimizer step) — train effective batches that "
                        "do not fit HBM (supervised/autoencoder/transfer "
                        "CLIs and the EMA loop; ignored by the "
                        "two-gradient-model loops)")
    p.add_argument("--ffn-impl", default=None,
                   choices=["xla", "collective"],
                   help="MixFFN dataflow override (MiTConfig.ffn_impl): "
                        "'collective' = explicit ring AG-matmul + "
                        "row-parallel psum over the ambient tp mesh "
                        "(requires --parallel tp; falls back to the XLA "
                        "chain on non-divisible stages)")
    return p


def apply_perf_preset(cfg, args):
    """Apply --perf (the benched fast config) to a MiTConfig."""
    if getattr(args, "perf", False):
        cfg = cfg.replace(gelu_approx=True, scan_unroll=4)
    if getattr(args, "ffn_impl", None):
        cfg = cfg.replace(ffn_impl=args.ffn_impl)
    return cfg


# Set by setup_parallel; device_train_batch/device_eval_batch consult it
# so host batches land on the mesh data-sharded (one slot: CLIs are
# single-run processes; tests restore via teardown_parallel).
_DATA_SHARDING = [None]
_AMBIENT_MESH = [None]


def teardown_parallel() -> None:
    """Undo setup_parallel's process-global effects (tests only — a CLI
    process exits instead). Restores the previous ambient mesh and stops
    sharding staged batches."""
    _DATA_SHARDING[0] = None
    handle = _AMBIENT_MESH[0]
    _AMBIENT_MESH[0] = None
    if handle is not None:
        handle.__exit__(None, None, None)


def setup_parallel(args, states, cfg=None):
    """Provision the --parallel device mesh and shard TrainStates onto it.

    `states` is a tuple of TrainState (one per model — the semi loops
    carry a teacher and a student); returns (mesh | None, states) with
    every state re-placed. Also flips the module-level batch sharding so
    `device_train_batch`/`device_eval_batch` put host batches onto the
    mesh data-sharded — from there GSPMD runs the existing jitted steps
    SPMD with no step-code changes (the reference is single-GPU,
    `SURVEY.md §5`; this is TPU-scaling capability with no counterpart).
    """
    mode = getattr(args, "parallel", "none")
    if mode in (None, "none", "pp", "dp_pp"):
        # pp modes build their own stage-per-device trainer inside the
        # supervised train loop (parallel/pipeline_train.py) — no mesh or
        # state re-placement here.
        if getattr(args, "ffn_impl", None) == "collective":
            print("note: --ffn-impl collective without --parallel tp "
                  "falls back to the XLA chain (no ambient tp mesh)")
        return None, states
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semisupervisedobjectdetection_tpu.parallel.mesh import (
        fsdp_shard,
        get_mesh,
        replicate,
    )

    ndev = len(jax.devices())
    if mode == "dp":
        mesh = get_mesh()
        states = tuple(replicate(mesh, s) for s in states)
    elif mode == "fsdp":
        mesh = get_mesh()
        states = tuple(fsdp_shard(mesh, s) for s in states)
    else:  # tp
        from semisupervisedobjectdetection_tpu.parallel.tp import (
            dp_tp_mesh,
            tp_shard,
        )

        tp = max(1, getattr(args, "tp", 2))
        if ndev % tp:
            raise SystemExit(
                f"--tp {tp} does not divide the {ndev} available devices")
        mesh = dp_tp_mesh(dp=ndev // tp, tp=tp)
        heads = getattr(cfg, "num_heads", None) if cfg is not None else None
        states = tuple(
            s.replace(params=tp_shard(mesh, s.params,
                                      num_heads_by_stage=heads))
            for s in (replicate(mesh, s) for s in states))
        # Ambient mesh for the whole run: ffn_impl="collective" resolves
        # its static guard against it (models/segformer.py::MixFFN).
        _AMBIENT_MESH[0] = jax.set_mesh(mesh)
    _DATA_SHARDING[0] = NamedSharding(mesh, P("data"))
    shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    print(f"--parallel {mode}: {shape} mesh over {ndev} "
          f"{jax.devices()[0].platform} device(s)")
    return mesh, states


def warn_parallel_unsupported(args, cli_name: str) -> None:
    """CLIs not yet routed through setup_parallel accept --parallel from
    the shared parser but cannot honor it — say so instead of silently
    ignoring the flag."""
    if getattr(args, "parallel", "none") not in (None, "none"):
        print(f"warning: --parallel has no effect for {cli_name} "
              "(supervised/teacher_student only)")


def _stage(x):
    """Host array -> device array, data-sharded when a --parallel mesh is
    active. An odd tail batch that does not divide the data axis is
    placed replicated instead (correct, just not split for that batch)."""
    if x is None:
        return None
    s = _DATA_SHARDING[0]
    if s is None:
        return jnp.asarray(x)
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = s.mesh.shape["data"]
    if getattr(x, "shape", ()) and x.shape[0] % n == 0:
        return jax.device_put(x, s)
    return jax.device_put(x, NamedSharding(s.mesh, P()))


def warn_perf_unsupported(args, cli_name: str) -> None:
    """CLIs whose models aren't MiTConfig-based accept --perf from the
    shared parser but cannot honor it — say so instead of silently
    ignoring the flag."""
    if getattr(args, "perf", False):
        print(f"warning: --perf has no effect for {cli_name} "
              "(MiT SegFormer preset only)")


def configs_from_args(args) -> Tuple[DataConfig, TrainConfig]:
    # Multi-host bootstrap first: jax.distributed must initialize before
    # anything touches the XLA backend. No-op single-process (the default).
    from semisupervisedobjectdetection_tpu.parallel.distributed import (
        init_distributed,
    )
    init_distributed()
    dcfg = DataConfig(
        dataset=args.dataset, evalset=args.evalset, maskdir=args.maskdir,
        unlabeledset=getattr(args, "unlabeledset", None),
        pseudoset=getattr(args, "pseudoset", None),
        img_h=args.img_size, img_w=args.img_size,
        canvas=max(args.img_size, 64),
        crop=max(int(args.img_size * 500 / 512), 32),
    )
    if args.batch_size:
        dcfg = dcfg.replace(batch_size=args.batch_size)
    if getattr(args, "reference_eval_aug", False):
        dcfg = dcfg.replace(reference_eval_aug=True)
    if getattr(args, "skip_bad_tiles", False):
        dcfg = dcfg.replace(bad_tile_policy="substitute")
    if getattr(args, "cache_tiles", 0.0) > 0:
        dcfg = dcfg.replace(cache_mb=args.cache_tiles)
    tc = TrainConfig()
    if args.epochs:
        tc = tc.replace(epochs=args.epochs)
    if args.lr is not None:
        tc = tc.replace(lr=args.lr)
    if args.weight_decay is not None:
        tc = tc.replace(weight_decay=args.weight_decay)
    if args.scheduler is not None:
        tc = tc.replace(lr_decay=args.scheduler)
    if args.no_quirks:
        tc = tc.replace(reference_quirks=False)
    return dcfg, tc


def ensure_data(args, dcfg: DataConfig, need_unlabeled: bool = False
                ) -> DataConfig:
    """Materialize synthetic datasets when --synthetic (or no dirs given)."""
    if not args.synthetic and dcfg.dataset:
        return dcfg
    root = tempfile.mkdtemp(prefix="sso_synth_")
    size = max(dcfg.canvas, 64)
    write_synthetic_dataset(os.path.join(root, "train"),
                            os.path.join(root, "masks"),
                            n=args.synthetic_n, size=size, seed=args.seed)
    write_synthetic_dataset(os.path.join(root, "eval"),
                            os.path.join(root, "masks"),
                            n=max(args.synthetic_n // 3, 4), size=size,
                            seed=args.seed + 1)
    upd = dict(dataset=os.path.join(root, "train"),
               evalset=os.path.join(root, "eval"),
               maskdir=os.path.join(root, "masks"))
    if need_unlabeled:
        write_synthetic_dataset(os.path.join(root, "unlabeled"), None,
                                n=args.synthetic_n, size=size,
                                seed=args.seed + 2, unlabeled=True)
        upd["unlabeledset"] = os.path.join(root, "unlabeled")
        upd["pseudoset"] = os.path.join(root, "unlabeled")
    print(f"synthetic dataset at {root}")
    return dcfg.replace(**upd)


def check_grad_accum(args, train_loader, dp_pp_capable: bool = False
                     ) -> None:
    """Fail fast on a batch the training step cannot divide.

    The jitted steps raise ValueError mid-trace on a non-divisible batch —
    after checkpoint load and a potentially multi-minute B5 compile.
    The required divisor is --grad-accum (microbatching), times --dp under
    `--parallel dp_pp` (the pipelined trainer shards batches across dp
    replica groups THEN into micro=grad-accum microbatches, so the step
    needs batch % (dp*micro) == 0 even at grad-accum 1) — but only on
    CLIs that actually construct the dp x pp trainer (`dp_pp_capable`;
    the others print a fallback warning and run single-device, where the
    dp factor must not reject valid configs). Three ways a bad batch
    reaches the step: --batch-size is not a multiple of the divisor;
    the tiny-dataset clamp in `make_loaders` shrank the batch below the
    requested size; or drop_last=False leaves a partial final batch."""
    accum = max(getattr(args, "grad_accum", 1), 1)
    div, label = accum, f"--grad-accum {accum}"
    if dp_pp_capable and getattr(args, "parallel", "none") == "dp_pp":
        dp = max(1, getattr(args, "dp", 2))
        div = accum * dp
        label = f"--parallel dp_pp (dp={dp} x --grad-accum {accum})"
    if div <= 1 or train_loader is None:
        return
    bs = train_loader.batch_size
    if bs % div:
        raise SystemExit(
            f"{label} does not divide the effective train "
            f"batch {bs} (a --batch-size smaller than the dataset may "
            f"have been clamped to the dataset size); use a divisor of "
            f"the effective batch")
    if (not train_loader.drop_last
            and getattr(train_loader, "num_shards", 1) == 1
            and len(train_loader.dataset) % bs):
        raise SystemExit(
            f"{label} with drop_last=False would hit a "
            f"partial final batch of "
            f"{len(train_loader.dataset) % bs}; enable drop_last")


def preempt_exit(args, saves, epoch: int, *, tuning: bool = False):
    """Checkpoint-and-exit after a preemption signal stopped a training
    loop mid-epoch (utils/preemption.py — the loops poll
    `preemption.stop_requested()` at batch boundaries and call this).

    `saves` is [(prefix, state, best_loss), ...] and `epoch` the
    INTERRUPTED epoch: the `*_last` checkpoint meta records epoch-1, so a
    `--resume` restart redoes the partial epoch from its start
    (at-least-once semantics; the redo is deterministic because every loop
    re-derives its augment stream by folding the restart epoch into the
    seed). Saved even when --resume was not passed — preemption is exactly
    when state must survive — and exits 0 so a supervisor treats the run
    as cleanly descheduled, not crashed. The reference loses everything
    but the last best-eval params on any kill (SURVEY.md §5 checkpoint
    row)."""
    from semisupervisedobjectdetection_tpu.utils import preemption

    # A --tune run's state is a throwaway grid point (trained at epochs//5
    # with swept hyperparameters): writing it to the shared `*_last` slot
    # would let a later `--resume` silently warm-start production training
    # from it. `tuning` is passed EXPLICITLY by each caller (sniffing flag
    # names like args.tune here would silently miss a CLI whose sweep flag
    # is spelled differently). Drop the saves; still exit cleanly.
    if tuning:
        saves = []
    wrote = []
    if args.checkpoint_dir:
        from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (
            save_last,
            wait_pending_saves,
        )
        # an in-flight --async-checkpoint write to the same path must land
        # before we overwrite it with the preemption state
        wait_pending_saves()
        for prefix, state, best in saves:
            save_last(args.checkpoint_dir, prefix, state, epoch - 1, best)
            wrote.append(f"{prefix}_last")
    msg = f"preempted ({preemption.signal_name()}) during epoch {epoch}: "
    if wrote:
        msg += (f"wrote {', '.join(wrote)} to {args.checkpoint_dir} — "
                f"restart with --resume to continue from epoch {epoch}")
    elif tuning:
        msg += "tune grid point state NOT saved (rerun the sweep)"
    else:
        msg += "no --checkpoint-dir set, training state NOT saved"
    print(msg, flush=True)
    raise SystemExit(0)


def make_loaders(dcfg: DataConfig, seed: int = 0,
                 flags=("train", "eval")) -> dict:
    out = {}
    for flag in flags:
        if flag == "train":
            ds = TileDataset(dcfg.dataset, dcfg.maskdir, canvas=dcfg.canvas,
                             cache_mb=dcfg.cache_mb)
        elif flag == "eval":
            ds = TileDataset(dcfg.evalset, dcfg.maskdir, canvas=dcfg.canvas,
                             cache_mb=dcfg.cache_mb)
        elif flag == "unlabeled":
            ds = TileDataset(dcfg.unlabeledset, None, canvas=dcfg.canvas,
                             has_mask=False, cache_mb=dcfg.cache_mb)
        elif flag == "pseudo":
            ds = TileDataset(dcfg.pseudoset, None, canvas=dcfg.canvas,
                             has_mask=False, cache_mb=dcfg.cache_mb)
        else:
            raise ValueError(flag)
        # drop_last matches the reference (`config.py:42`) but would yield
        # an empty loader when the dataset is smaller than one batch (tiny
        # synthetic smoke runs); clamp the batch size instead.
        bs = min(dcfg.batch_size, max(len(ds), 1))
        out[flag] = make_loader(ds, bs, dcfg, seed)
    return out


def make_loader(ds, bs, dcfg, seed):
    """Prefer the native (C++ threaded) decode path when built; fall back
    to the PIL loader. Multi-host sharding only on the Python loader for
    now (single-host pods use the native path). `--skip-bad-tiles`
    (bad_tile_policy='substitute') and `--cache-tiles`
    (cache_mb>0) also route through the Python loader — the native pool
    fails fast on corrupt files and decodes outside `__getitem__` (after
    the first epoch a RAM cache beats its threaded re-decode)."""
    from semisupervisedobjectdetection_tpu.data import native

    if (jax.process_count() == 1 and native.available()
            and dcfg.bad_tile_policy == "raise" and dcfg.cache_mb <= 0):
        return native.NativeBatchLoader(
            ds, bs, shuffle=dcfg.shuffle, drop_last=dcfg.drop_last,
            seed=seed)
    return TileLoader(
        ds, bs, shuffle=dcfg.shuffle, drop_last=dcfg.drop_last, seed=seed,
        num_shards=jax.process_count(), shard_index=jax.process_index(),
        on_bad_tile=dcfg.bad_tile_policy)


_make_loader = make_loader    # back-compat alias


def split_loaders(dcfg, dataset, seed: int) -> dict:
    """80/20 train/eval loaders over one labeled dataset — the reference's
    Hyperparameter_Tuning split (`segFormer_main.py:107-114`), shared by
    the --tune paths."""
    from semisupervisedobjectdetection_tpu.data.loader import split_dataset

    tr, va = split_dataset(dataset, 0.8, seed)
    return {
        "train": make_loader(tr, min(dcfg.batch_size, max(len(tr), 1)),
                             dcfg, seed),
        "eval": make_loader(va, min(dcfg.batch_size, max(len(va), 1)),
                            dcfg, seed),
    }


def tune_point_logger(args, tag: str):
    """Per-grid-point MetricLogger: suffix --metrics-csv with the point's
    tag. One shared sweep CSV would interleave rows of unrelated runs with
    repeating epoch numbers and no column identifying the point
    (MetricLogger pins its schema on the first row)."""
    from semisupervisedobjectdetection_tpu.utils.logging import MetricLogger

    base = getattr(args, "metrics_csv", None)
    if not base:
        return MetricLogger(None)
    root, ext = os.path.splitext(base)
    return MetricLogger(f"{root}.{tag}{ext or '.csv'}")


def sweep_grid(args, grid, run_point, *, tag_of, show_of=None,
               objective: str = "best eval", empty_hint: str = ""):
    """Generic --tune sweep core shared by EVERY grid-search CLI: per-point
    suffixed metrics CSV (tune_point_logger), empty-grid fail-fast, and an
    all-NaN sweep reporting "no finite objective" instead of crashing the
    summary. `grid` is a list of point tuples; `run_point(point, logger)`
    returns the point's objective value; `tag_of(point)` must encode every
    grid axis (singletons included) so two points can never alias a CSV.
    Returns (best, best_point_or_None)."""
    if not grid:
        raise SystemExit("--tune grid is empty" +
                         (f" ({empty_hint})" if empty_hint else ""))
    show_of = show_of or tag_of
    best, best_pt = float("inf"), None
    for pt in grid:
        plog = tune_point_logger(args, tag_of(pt))
        try:
            loss = run_point(pt, plog)
        finally:
            plog.close()
        print(f"{show_of(pt)}: {objective} {loss:.4f}")
        if loss < best:
            best, best_pt = loss, pt
    if best_pt is None:
        print(f"tune: no grid point produced a finite {objective} "
              f"({len(grid)} points tried)")
    else:
        print(f"best: {show_of(best_pt)} loss={best:.4f}")
    return best, best_pt


def run_tune_grid(args, tc, run_point, objective: str = "best eval"):
    """--tune sweep driver for the lr × weight-decay × scheduler-γ grids
    (autoencoder ref `segFormer_autoencoder_main.py:133-170`, few-shot ref
    `segFormer_fewshot_learning.py:362-363`): shuffled cartesian grid,
    first --tune-max points, each point trained at epochs//5 with
    checkpoints disabled. Returns (best, best_point_or_None)."""
    from semisupervisedobjectdetection_tpu.core.config import product_grid

    grid = product_grid(
        [float(x) for x in args.tune_lrs.split(",")],
        [float(x) for x in args.tune_wds.split(",")],
        [float(x) for x in args.tune_gammas.split(",")],
        shuffle=True, seed=args.seed)[:args.tune_max]

    def point(pt, plog):
        lr, wd, gamma = pt
        print(f"tuning: lr={lr} weight_decay={wd} scheduler={gamma}")
        tci = tc.replace(lr=lr, weight_decay=wd, lr_decay=gamma,
                         epochs=max(tc.epochs // 5, 1))
        return run_point(tci, plog)

    return sweep_grid(
        args, grid, point,
        tag_of=lambda p: f"lr{p[0]}_wd{p[1]}_g{p[2]}",
        show_of=lambda p: (f"lr={p[0]} weight_decay={p[1]} "
                           f"scheduler={p[2]}"),
        objective=objective,
        empty_hint="check --tune-lrs / --tune-wds / --tune-gammas / "
                   "--tune-max")


def maybe_plot_curves(args) -> None:
    """Render the run's metrics CSV to a loss-curve PNG when the CLI was
    invoked with --plot-curves (utils/plot_metrics.py; reference artifact:
    `segFormer_main.py:88-98`)."""
    if getattr(args, "plot_curves", False):
        from semisupervisedobjectdetection_tpu.utils.plot_metrics import (
            plot_metrics,
        )

        plot_metrics(getattr(args, "metrics_csv", None))


def host_floats(xs) -> list:
    """One stacked device->host transfer for a list of scalars.

    The axon TPU tunnel costs ~32ms per device->host round trip, so a
    train/eval loop calling `float(loss)` per step idles the chip for a
    round trip every step. Hot loops instead accumulate device scalars
    and sync once per epoch through this helper (also correct on plain
    numpy floats, so loops work unchanged on CPU)."""
    if not xs:
        return []
    return [float(v) for v in np.asarray(jnp.stack(
        [jnp.asarray(x) for x in xs]))]


def device_train_batch(rng, images_u8, masks_u8, dcfg: DataConfig):
    """Host uint8 -> device-augmented float batch (train chain)."""
    imgs = _stage(images_u8)
    masks = _stage(masks_u8)
    return augment_batch(rng, imgs, masks, crop=dcfg.crop,
                         out_h=dcfg.img_h, out_w=dcfg.img_w,
                         prob=dcfg.aug_prob,
                         with_mask=masks is not None)


_EVAL_AUG_COUNTER = [0]


def device_eval_batch(images_u8, masks_u8, dcfg: DataConfig, rng=None):
    """Host uint8 -> device float batch (eval chain).

    With `dcfg.reference_eval_aug` the reference's randomized train chain
    runs at eval time too (quirk — reference `config.py:27-38` is the
    transform for every loader flag). The rng is derived from a process-local
    counter when not supplied, keeping eval deterministic per run order.
    """
    imgs = _stage(images_u8)
    masks = _stage(masks_u8)
    if dcfg.reference_eval_aug:
        if rng is None:
            _EVAL_AUG_COUNTER[0] += 1
            rng = jax.random.PRNGKey(_EVAL_AUG_COUNTER[0])
        return augment_batch(rng, imgs, masks, crop=dcfg.crop,
                             out_h=dcfg.img_h, out_w=dcfg.img_w,
                             prob=dcfg.aug_prob,
                             with_mask=masks is not None)
    return eval_batch(imgs, masks, out_h=dcfg.img_h, out_w=dcfg.img_w,
                      with_mask=masks is not None)
