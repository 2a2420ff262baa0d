"""Training driver CLI.

Counterpart of the reference train.py (argparse contract kept for the
flags that matter: dataset, paths, views, ndepths, epochs, lr, batch size,
resume/loadckpt) — but TPU-native underneath: one jitted train step over a
device mesh, batch sharded along 'data', orbax-style pickled checkpoints
per epoch, print-based metrics like the reference.

Usage:
  python -m effi_mvs_plus_tpu.cli.train --mode train --trainpath ... \
      --trainlist lists/dtu/train.txt --testlist lists/dtu/test.txt \
      --logdir ckpts --epochs 16 --batch_size 16 --lr 1e-3
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser(profile_name="dtu_train"):
    from effi_mvs_plus_tpu.config import get_profile, apply_profile_defaults
    p = argparse.ArgumentParser("effi-mvs-plus-tpu train")
    p.add_argument("--profile", default=profile_name,
                   help="named preset from config.PROFILES "
                        "(dtu_train / blend_finetune)")
    p.add_argument("--mode", default="train",
                   choices=["train", "finetune", "test", "profile"])
    p.add_argument("--dataset")
    p.add_argument("--trainpath", required=False)
    p.add_argument("--testpath", default=None)
    p.add_argument("--trainlist", required=False)
    p.add_argument("--testlist", required=False)
    p.add_argument("--epochs", type=int)
    p.add_argument("--lr", type=float)
    p.add_argument("--wd", type=float)
    p.add_argument("--lossrate", type=float)
    p.add_argument("--batch_size", type=int)
    p.add_argument("--numdepth", type=int)
    p.add_argument("--interval_scale", type=float)
    p.add_argument("--trainviews", type=int)
    p.add_argument("--testviews", type=int)
    p.add_argument("--ndepths", type=str)
    p.add_argument("--GRUiters", type=str, default="3,3,3")
    p.add_argument("--CostNum", type=int)
    p.add_argument("--logdir", default="./checkpoints/run")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--loadckpt", default=None,
                   help="init weights from a checkpoint (.ckpt torch or "
                        ".pkl native) — finetune entry")
    p.add_argument("--summary_freq", type=int)
    p.add_argument("--save_freq", type=int)
    p.add_argument("--seed", type=int)
    p.add_argument("--num_workers", type=int)
    p.add_argument("--crop_wh", default=None,
                   help="DTU-family crop size 'W,H' (default the reference's"
                        " 640,512). Smaller values centre-crop the rectified"
                        " images AND shift the cam intrinsics' principal"
                        " point to match (datasets.DTUTrainDataset.camera);"
                        " GT pyramids crop consistently — valid on real DTU"
                        " data as well as crop-sized synthetic trees")
    p.add_argument("--device_cache", action="store_true",
                   help="upload the distinct dataset views to HBM once and"
                        " assemble batches on device (data/device_cache.py)"
                        " — for fits-in-HBM datasets / slow host links")
    p.add_argument("--data_parallel", type=int, default=None,
                   help="devices on the mesh data axis (default: all)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="devices on the mesh model axis; batch shards over"
                        " the remaining devices")
    p.add_argument("--shard_policy", default="views,depth",
                   help="comma list of model-axis layouts when"
                        " --model_parallel>1: views (FPN + per-view warps"
                        " sharded, view reduction psummed), depth"
                        " (cost-volume hypotheses), spatial (image rows;"
                        " measured 8x WORSE per-device HBM at the T&T shape"
                        " — GSPMD all-gathers H-sharded convs — see"
                        " SHARDING_TANK_r02.json; avoid)")
    apply_profile_defaults(p, get_profile(profile_name))
    return p


def make_config(args):
    from effi_mvs_plus_tpu.models import EffiMVSConfig
    return EffiMVSConfig(
        ndepths=tuple(int(x) for x in args.ndepths.split(",")),
        gru_iters=tuple(int(x) for x in args.GRUiters.split(",")),
        CostNum=args.CostNum)


def load_initial_params(args, cfg, rng):
    from effi_mvs_plus_tpu.models import init_params
    from effi_mvs_plus_tpu.io import load_torch_checkpoint
    from effi_mvs_plus_tpu.train import trainer as T
    if args.loadckpt:
        if args.loadckpt.endswith(".ckpt"):
            return load_torch_checkpoint(args.loadckpt), 0, None
        payload = T.load_checkpoint(args.loadckpt)
        return payload["params"], 0, None
    latest = T.latest_checkpoint(args.logdir) if args.resume else None
    if latest:
        payload = T.load_checkpoint(latest)
        print(f"resuming {latest} at epoch {payload['epoch'] + 1}")
        return payload["params"], payload["epoch"] + 1, payload["opt_state"]
    return init_params(rng, cfg), 0, None


def main(argv=None):
    # two-phase parse: --profile (or --mode finetune) picks the preset the
    # remaining defaults come from; explicit flags still win
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--profile", default=None)
    pre.add_argument("--mode", default="train")
    ns, _ = pre.parse_known_args(argv)
    profile = ns.profile or ("blend_finetune" if ns.mode == "finetune"
                             else "dtu_train")
    args = build_parser(profile).parse_args(argv)
    import jax
    # persistent compile cache: a resumed run (or repeated launches at the
    # same shapes) skips the multi-minute XLA compile
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from effi_mvs_plus_tpu import parallel
    from effi_mvs_plus_tpu.data import find_dataset
    from effi_mvs_plus_tpu.data.loader import Loader
    from effi_mvs_plus_tpu.parallel import (global_mesh, host_local_batch,
                                            is_main, mean_metrics, replicate)
    from effi_mvs_plus_tpu.train import trainer as T
    from effi_mvs_plus_tpu.train.optim import make_optimizer

    # multi-host rendezvous (no-op unless the env describes a multi-process
    # job — SURVEY §5.8's jax.distributed equivalent of init_method='env://')
    if parallel.initialize():
        print(f"process {jax.process_index()}/{jax.process_count()} up; "
              f"{len(jax.devices())} global devices")

    cfg = make_config(args)
    rng = jax.random.PRNGKey(args.seed)

    ds_cls = find_dataset(args.dataset)
    if args.crop_wh:
        import functools
        wh = tuple(int(x) for x in args.crop_wh.split(","))
        ds_cls = functools.partial(ds_cls, crop_wh=wh)
    test_ds = ds_cls(args.testpath or args.trainpath, args.testlist, "test",
                     args.testviews, args.numdepth)

    if args.mode == "test":
        return run_test(args, cfg, rng, test_ds)
    if args.mode == "profile":
        return run_profile(args, cfg, rng, test_ds)
    if args.mode == "finetune" and not args.loadckpt:
        raise SystemExit("--mode finetune requires --loadckpt")

    train_ds = ds_cls(args.trainpath, args.trainlist, "train",
                      args.trainviews, args.numdepth)
    # per-process loaders: each host reads its own 1/num_processes shard of
    # the sample stream (the DistributedSampler analogue); batch_size is the
    # per-host batch, global batch = batch_size * process_count.
    n_proc = jax.process_count()
    pid = jax.process_index()
    train_view = (parallel.partition(range(len(train_ds)), n_proc, pid)
                  if n_proc > 1 else None)
    test_view = (parallel.partition(range(len(test_ds)), n_proc, pid)
                 if n_proc > 1 else None)
    n_test = len(test_view) if test_view is not None else len(test_ds)
    eval_bs = args.batch_size if n_test >= args.batch_size \
        else max(1, n_test)
    if args.device_cache:
        from effi_mvs_plus_tpu.data.device_cache import DeviceCacheLoader
        assert n_proc == 1, "--device_cache is single-host for now"
        train_loader = DeviceCacheLoader(train_ds, args.batch_size,
                                         shuffle=True, seed=args.seed,
                                         drop_last=True)
        test_loader = DeviceCacheLoader(test_ds, eval_bs, drop_last=True)
        print(f"device cache: {train_loader.nbytes() / 1e9:.2f} GB train "
              f"+ {test_loader.nbytes() / 1e9:.2f} GB eval in HBM")
    else:
        train_loader = Loader(train_ds, args.batch_size, shuffle=True,
                              num_workers=args.num_workers, drop_last=True,
                              seed=args.seed, indices=train_view)
        test_loader = Loader(test_ds, eval_bs, shuffle=False, drop_last=True,
                             num_workers=args.num_workers,
                             indices=test_view)

    params, start_epoch, opt_state = load_initial_params(args, cfg, rng)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(params)
                   if hasattr(x, "shape"))
    print(f"model parameters: {n_params}")

    total_steps = len(train_loader) * args.epochs + 100
    optimizer, sched = make_optimizer(args.lr, total_steps,
                                      weight_decay=args.wd, params=params)
    if opt_state is None:
        opt_state = optimizer.init(params)

    policy = None
    if args.model_parallel > 1:
        import math
        from effi_mvs_plus_tpu.parallel import make_mesh, ShardingPolicy
        n = len(jax.devices())
        mp = args.model_parallel
        # the data axis must divide both the train and eval batch sizes
        # (same rule as the default path below)
        dp = args.data_parallel or math.gcd(n // mp,
                                            math.gcd(args.batch_size,
                                                     eval_bs))
        mesh = make_mesh(data=dp, model=mp, devices=jax.devices()[:dp * mp])
        kinds = {s.strip() for s in args.shard_policy.split(",")}
        policy = ShardingPolicy(mesh, shard_depth="depth" in kinds,
                                shard_views="views" in kinds,
                                shard_spatial="spatial" in kinds)
    elif args.data_parallel:
        from effi_mvs_plus_tpu.parallel import make_mesh
        mesh = make_mesh(data=args.data_parallel, model=1,
                         devices=jax.devices()[:args.data_parallel])
    elif n_proc > 1:
        mesh = global_mesh()
    else:
        # the data axis must divide both the train and eval batch sizes
        import math
        from effi_mvs_plus_tpu.parallel import fit_data_mesh
        mesh = fit_data_mesh(math.gcd(args.batch_size, eval_bs))
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    if policy is not None:
        # constraint hooks read the active policy at trace time; keep it
        # active for the whole loop (first call of each jitted step traces)
        import contextlib
        _pol_stack = contextlib.ExitStack()
        _pol_stack.enter_context(parallel.use_policy(policy))

    train_step = T.make_train_step(cfg, optimizer, args.lossrate)
    eval_step = T.make_eval_step(cfg)

    from effi_mvs_plus_tpu.utils.logging import MetricsWriter
    writer = MetricsWriter(args.logdir) if is_main() else None
    if writer is not None and args.resume and start_epoch > 0:
        writer.event("resume", epoch=start_epoch,
                     ckpt=T.latest_checkpoint(args.logdir) or "")

    step_rng = jax.random.PRNGKey(args.seed + 1)
    gstep = start_epoch * len(train_loader)
    for epoch in range(start_epoch, args.epochs):
        t_epoch = time.time()
        for i, batch in enumerate(train_loader):
            batch.pop("filename", None)
            batch = host_local_batch(batch, mesh)
            step_rng, sub = jax.random.split(step_rng)
            params, opt_state, metrics = train_step(params, opt_state,
                                                    batch, sub)
            gstep += 1
            if i % args.summary_freq == 0 and is_main():
                # drop the 13 per-prediction terms (l0..l12), keep 'loss'
                m = {k: float(v) for k, v in metrics.items()
                     if not (k[0] == "l" and k[1:].isdigit())}
                writer.scalars(gstep, {**m, "lr": float(sched(gstep))},
                               prefix="train/")
                print(f"epoch {epoch} iter {i}/{len(train_loader)} "
                      f"lr {float(sched(gstep)):.2e} " +
                      " ".join(f"{k}={v:.4f}" for k, v in m.items()),
                      flush=True)
        if epoch % args.save_freq == 0 and is_main():
            path = os.path.join(args.logdir, f"model_{epoch:06d}.ckpt")
            T.save_checkpoint(path, jax.device_get(params),
                              jax.device_get(opt_state), epoch)
            print(f"saved {path}")

        meter = T.DictMeter()
        for batch in test_loader:
            batch.pop("filename", None)
            batch = host_local_batch(batch, mesh)
            m, _ = eval_step(params, batch)
            meter.update({k: float(v) for k, v in m.items()})
        means = mean_metrics(meter.mean())
        if is_main():
            writer.scalars(gstep, means, prefix="eval/")
            print(f"epoch {epoch} eval: " +
                  " ".join(f"{k}={v:.4f}" for k, v in means.items()) +
                  f" ({time.time() - t_epoch:.1f}s)", flush=True)


def run_test(args, cfg, rng, test_ds):
    """Standalone metric run over the eval split (reference --mode test,
    train.py:213-226)."""
    import jax
    from effi_mvs_plus_tpu.data.loader import Loader
    from effi_mvs_plus_tpu.parallel import fit_data_mesh, replicate, shard_batch
    from effi_mvs_plus_tpu.train import trainer as T

    params, _, _ = load_initial_params(args, cfg, rng)
    mesh = fit_data_mesh(args.batch_size)
    params = replicate(params, mesh)
    eval_step = T.make_eval_step(cfg)
    meter = T.DictMeter()
    loader = Loader(test_ds, args.batch_size,
                    num_workers=args.num_workers)
    for batch in loader:
        batch.pop("filename", None)
        batch = shard_batch(batch, mesh)
        m, _ = eval_step(params, batch)
        meter.update({k: float(v) for k, v in m.items()})
    print("test: " + " ".join(f"{k}={v:.4f}"
                              for k, v in meter.mean().items()), flush=True)
    return meter.mean()


def run_profile(args, cfg, rng, test_ds):
    """Timed + traced iterations (reference --mode profile,
    train.py:355-383): warmup, fenced wall-clock per step, then a
    jax.profiler device trace to `logdir`/trace."""
    import jax
    from effi_mvs_plus_tpu.data.loader import Loader
    from effi_mvs_plus_tpu.parallel import fit_data_mesh, replicate, shard_batch
    from effi_mvs_plus_tpu.train import trainer as T
    from effi_mvs_plus_tpu.train.optim import make_optimizer
    from effi_mvs_plus_tpu.utils.profiling import Timer, profile_trace

    params, _, _ = load_initial_params(args, cfg, rng)
    optimizer, _ = make_optimizer(args.lr, 1000, weight_decay=args.wd,
                                  params=params)
    opt_state = optimizer.init(params)
    mesh = fit_data_mesh(args.batch_size)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    train_step = T.make_train_step(cfg, optimizer, args.lossrate)

    loader = Loader(test_ds, args.batch_size, num_workers=args.num_workers)
    batch = next(iter(loader))
    batch.pop("filename", None)
    batch = shard_batch(batch, mesh)
    sub = jax.random.PRNGKey(0)

    state = {"params": params, "opt_state": opt_state}

    def one_step():
        state["params"], state["opt_state"], metrics = train_step(
            state["params"], state["opt_state"], batch, sub)
        return metrics["loss"]

    dt = Timer(lambda: one_step(), warmup=3, iters=5).measure()
    print(f"profile: {dt * 1e3:.1f} ms/step "
          f"({args.batch_size / dt:.2f} samples/s)", flush=True)
    trace_dir = os.path.join(args.logdir, "trace")
    with profile_trace(trace_dir):
        one_step()
        float(jax.device_get(state["params"]["PixelwiseNet"]["3"]["bias"][0]))
    print(f"trace written to {trace_dir}", flush=True)
    return dt


if __name__ == "__main__":
    main()
