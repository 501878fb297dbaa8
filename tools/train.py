"""Training CLI (reference tools/train.py).

Single-host entry; multi-host via ``jax.distributed.initialize`` when
JAX_COORDINATOR_ADDRESS is set.  The hot loop lives in
gdmae_tpu/runtime/train.py as one jitted, donated step over a data mesh.

Usage:
    python tools/train.py --cfg_file cfgs/kitti_models/gd_mae.yaml \
        [--batch_size N] [--epochs N] [--pretrained_model ckpt.pkl] \
        [--set KEY VALUE ...]
"""
from __future__ import annotations

import argparse
import datetime
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from gdmae_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file, log_config_to_file
from gdmae_tpu.utils import common_utils


def parse_config():
    parser = argparse.ArgumentParser(description="gdmae_tpu training")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--pretrained_model", type=str, default=None)
    parser.add_argument("--fix_random_seed", action="store_true")
    parser.add_argument("--max_ckpt_save_num", type=int, default=30)
    parser.add_argument("--ckpt_save_interval", type=int, default=1)
    parser.add_argument("--synthetic", type=int, default=0, metavar="N",
                        help="train on N synthetic random scenes (no dataset "
                             "files needed; drives the full pipeline)")
    parser.add_argument("--bench_json", type=str, default=None,
                        help="write loader-in-the-loop sustained throughput "
                             "(scans/s, compile step excluded) to this JSON "
                             "file at the end of each epoch")
    parser.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER,
                        default=None)
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = "/".join(args.cfg_file.split("/")[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, cfg_ = parse_config()

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    from gdmae_tpu.datasets import build_dataloader
    from gdmae_tpu.models.detectors.detector3d_template import DatasetMeta, build_network
    from gdmae_tpu.parallel import mesh as mesh_lib
    from gdmae_tpu.runtime import checkpoint as ckpt_lib
    from gdmae_tpu.runtime import optimization
    from gdmae_tpu.runtime import train as train_lib

    if args.fix_random_seed:
        common_utils.set_random_seed(666 + jax.process_index())

    batch_size = args.batch_size or cfg_.OPTIMIZATION.BATCH_SIZE_PER_GPU
    total_epochs = args.epochs or cfg_.OPTIMIZATION.NUM_EPOCHS

    output_dir = REPO / "output" / cfg_.EXP_GROUP_PATH / cfg_.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    output_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / f"log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    logger = common_utils.create_logger(log_file, rank=jax.process_index())
    logger.info("**********************Start logging**********************")
    log_config_to_file(cfg_, logger=logger)
    tb_writer = None
    if jax.process_index() == 0:
        try:
            from tensorboardX import SummaryWriter

            tb_writer = SummaryWriter(str(output_dir / "tensorboard"))
        except ImportError:
            pass

    if args.synthetic:
        cfg_.DATA_CONFIG.DATASET = "SyntheticDataset"
        cfg_.DATA_CONFIG.SYNTHETIC = {"NUM_SAMPLES": args.synthetic}
    data_path = Path(cfg_.DATA_CONFIG.DATA_PATH)
    if not data_path.is_absolute():
        data_path = (REPO / "tools" / data_path).resolve()
    from gdmae_tpu.datasets import build_dataset, build_loader

    dataset = build_dataset(
        dataset_cfg=cfg_.DATA_CONFIG, class_names=cfg_.CLASS_NAMES,
        root_path=data_path, training=True, logger=logger,
        total_epochs=total_epochs)

    meta = DatasetMeta(
        class_names=cfg_.CLASS_NAMES,
        point_cloud_range=cfg_.DATA_CONFIG.POINT_CLOUD_RANGE,
        voxel_size=dataset.voxel_size,
        grid_size=dataset.grid_size,
        num_point_features=dataset.point_feature_encoder.num_point_features,
        max_points=dataset.max_points,
        max_pillars=dataset.max_pillars,
    )
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_network(cfg_.MODEL, num_class=len(cfg_.CLASS_NAMES),
                          dataset=meta, dtype=dtype)

    # Host-side index building (datasets.processor.host_pillarize): the
    # loader pre-sorts points + precomputes the pillar tables for DynVFE,
    # and for MAE pretraining additionally draws the mask and groups the GT
    # point sets — index-only work that cost ~45 ms/step on-device at
    # batch 16 and overlaps with device compute here.  Opt-outs:
    # MODEL.VFE.TPU_HOST_PILLARIZE: false / BACKBONE_3D.TPU_HOST_MAE_TARGETS:
    # false fall back to the fully in-graph paths.
    host_prep_fns = []
    b3d = cfg_.MODEL.get("BACKBONE_3D", {})
    if (cfg_.MODEL.get("VFE", {}).get("NAME") == "DynVFE"
            and bool(cfg_.MODEL.VFE.get("TPU_HOST_PILLARIZE", True))):
        from gdmae_tpu.datasets.processor.host_pillarize import (
            pillarize_batch_np,
        )

        from gdmae_tpu.datasets.processor.host_pillarize import (
            vfe_host_features_cfg,
        )

        def host_pil_fn(bt):
            tabs, pts_s, pm_s = pillarize_batch_np(
                bt["points"], bt["point_mask"], meta.point_cloud_range,
                meta.voxel_size, meta.grid_size, meta.max_pillars)
            bt["points"], bt["point_mask"] = pts_s, pm_s
            bt.update(tabs)
            # per-point VFE MLP features too (gradient-free geometry;
            # ~7 ms/step of device gathers at batch 16 — r5 trace)
            bt.update(vfe_host_features_cfg(
                cfg_.MODEL.VFE, pts_s, pm_s, tabs,
                meta.point_cloud_range, meta.voxel_size))

        host_prep_fns.append(host_pil_fn)
    if (b3d.get("NAME") == "SPTBackboneMAE"
            and b3d.get("MASK_CONFIG") is not None
            and bool(b3d.get("TPU_HOST_MAE_TARGETS", True))):
        from gdmae_tpu.datasets.processor.host_pillarize import (
            mae_host_targets,
        )
        from gdmae_tpu.models.backbones_3d.spt_backbone import (
                mae_dec_cap, mae_enc_cap)
        # per-batch rng derived from a base seed + the batch's frame ids:
        # the prep runs inside FORKED loader workers, where a shared
        # Generator object would be duplicated and every worker would draw
        # the same mask sequence
        import zlib
        base_seed = ((0 if args.fix_random_seed
                      else (int(time.time()) % 2 ** 20))
                     * 1000003 + jax.process_index())

        def host_mae_fn(bt):
            fid = "/".join(str(f) for f in bt.get("frame_id", ["0"]))
            # fold the epoch in: a (base_seed, frame) pair alone would give
            # a frame the IDENTICAL mask every epoch (ADVICE r4 medium) —
            # the reference draws a fresh mask per iteration
            rng = np.random.default_rng(
                (base_seed, int(bt.get("cur_epoch", 0)),
                 zlib.crc32(fid.encode())))
            bt.update(mae_host_targets(
                bt["points"], bt["point_mask"], meta.point_cloud_range,
                meta.voxel_size, meta.grid_size, meta.max_pillars,
                float(b3d.MASK_CONFIG.RATIO),
                int(b3d.MASK_CONFIG.NUM_GT_POINTS),
                mae_dec_cap(b3d, meta.max_pillars), rng,
                m_enc=mae_enc_cap(b3d, meta.max_pillars),
                tables=(bt if "host_pillar_start" in bt else None)))

        host_prep_fns.append(host_mae_fn)
        if (b3d.get("TPU_WINDOW_MODE") == "joint"
                and b3d.get("TPU_JOINT_BUDGETS") is not None
                and host_prep_fns and len(host_prep_fns) == 2
                and bool(b3d.get("TPU_HOST_WINDOW_PLANS", True))):
            # window plans on host too (ops.window_host, ~32 ms/step
            # in-graph); needs the pillar tables + mae mask from the two
            # fns above
            from gdmae_tpu.ops.window_host import mae_host_plans

            host_prep_fns.append(lambda bt: bt.update(mae_host_plans(
                b3d, bt["host_pillar_coords"], bt["host_pillar_mask"],
                bt["host_mae_mask"],
                (int(meta.grid_size[1]), int(meta.grid_size[0])))))

    def host_prep(bt):
        for fn in host_prep_fns:
            fn(bt)
        return bt

    # the prep runs INSIDE the loader workers (collate-time): it
    # parallelizes across --workers processes instead of serializing on
    # the training loop
    dataloader, sampler = build_loader(
        dataset, batch_size, workers=args.workers, training=True,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        host_prep_fn=host_prep if host_prep_fns else None)

    # build example batch for init (already prepped by the collate)
    example = next(iter(dataloader))
    device_batch = {k: jnp.asarray(v) for k, v in example.items()
                    if isinstance(v, np.ndarray)}
    params, batch_stats = train_lib.init_model(model, device_batch)
    n_params = sum(np.prod(np.shape(x)) for x in jax.tree_util.tree_leaves(params))
    logger.info("model params: %.2fM", n_params / 1e6)

    iters_per_epoch = len(dataloader)
    tx, lr_fn = optimization.build_optimizer(
        cfg_.OPTIMIZATION, iters_per_epoch, total_epochs)
    freeze = cfg_.MODEL.get("FREEZE_LAYERS", None)
    if freeze:
        tx = optimization.apply_freeze(tx, params, freeze)
    state = train_lib.TrainState.create(params, batch_stats, tx)

    start_epoch = 0
    img_pre = cfg_.MODEL.get("IMG_BACKBONE", {}).get("PRETRAINED", None)
    if img_pre:
        # local hub-format DLA-34 ImageNet weights (reference dla.py:196
        # downloads these; offline rigs point PRETRAINED at the file)
        from gdmae_tpu.runtime import torch_import
        new_params, new_bs, rep = torch_import.load_dla_hub_weights(
            img_pre, state.params, state.batch_stats, logger=logger)
        state = state.replace(params=new_params, batch_stats=new_bs)
        logger.info("loaded DLA-34 hub weights from %s (%d tensors)",
                    img_pre, len(rep["loaded"]))
    if args.pretrained_model:
        if args.pretrained_model.endswith(".pth"):
            # reference torch checkpoint (published weights / torch-trained
            # MAE encoders): name-mapped layout-transformed partial load
            from gdmae_tpu.runtime import torch_import
            sd = torch_import.load_torch_checkpoint(args.pretrained_model)
            new_params, new_bs, _ = torch_import.import_torch_state(
                sd, state.params, state.batch_stats, logger=logger)
        else:
            new_params, new_bs = ckpt_lib.load_params_partial(
                args.pretrained_model, state.params, state.batch_stats,
                logger=logger,
                rename_map={"backbone_3d": "backbone_3d/encoder"})
        state = state.replace(params=new_params, batch_stats=new_bs)
    latest = ckpt_lib.latest_checkpoint(ckpt_dir) if args.ckpt is None else args.ckpt
    if latest is not None and Path(str(latest)).exists():
        state, start_epoch, _ = ckpt_lib.load_checkpoint(latest, state)
        logger.info("resumed from %s (epoch %d)", latest, start_epoch)

    mesh = mesh_lib.make_mesh()
    step_fn = train_lib.make_train_step(model)
    pstep = mesh_lib.make_parallel_train_step(step_fn, mesh)
    state = jax.device_put(state, mesh_lib.replicated(mesh))

    key = jax.random.PRNGKey(int(time.time()) % 2 ** 31)
    meter = common_utils.AverageMeter()

    def prefetch_device_batches(depth=int(os.environ.get(
            "GDMAE_PREFETCH_DEPTH", "2"))):
        """Pipeline loader -> host_prep -> H2D against device compute.

        A daemon thread runs the numpy host pipeline and FORCES the
        device transfer (block_until_ready) before enqueueing, so the
        main loop's step dispatch never blocks on either (measured on the
        tunneled chip: dispatch was blocking ~1.2 s/step on synchronous
        batch upload).  depth=2 keeps one batch in flight."""
        import queue as _q
        import threading

        if depth <= 0:
            # plain async loop: jax dispatch doesn't block on small
            # batches, so the device pipeline forms by itself — measured
            # FASTER than the thread on core-starved hosts (40.5 vs 22
            # scans/s on the 1-core dev VM; the thread + worker processes
            # just add contention there)
            for b in dataloader:
                db = {k: v for k, v in b.items()
                      if isinstance(v, np.ndarray)}
                yield mesh_lib.shard_batch(db, mesh)
            return

        q = _q.Queue(maxsize=depth)
        err = []

        def producer():
            try:
                for b in dataloader:  # host_prep already ran in the workers
                    db = {k: v for k, v in b.items()
                          if isinstance(v, np.ndarray)}
                    db = mesh_lib.shard_batch(db, mesh)
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), db)
                    q.put(db)
            except BaseException as e:  # surfaced in the main loop
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                if err:
                    raise err[0]
                return
            yield item

    for epoch in range(start_epoch, total_epochs):
        dataset.set_epoch(epoch, total_epochs)
        if sampler is not None:
            sampler.set_epoch(epoch)
        t_end = time.perf_counter()
        sustained_t0 = None  # set after the compile step finishes
        sustained_scans = 0
        for it, device_batch in enumerate(prefetch_device_batches()):
            data_time = time.perf_counter() - t_end
            key, sub = jax.random.split(key)
            state, metrics = pstep(state, device_batch, sub)
            # NO per-iter readback: a float() here would fence the device
            # every step and serialize the host pipeline against compute.
            # Metrics are only pulled at log points.
            batch_time = time.perf_counter() - t_end
            t_end = time.perf_counter()
            meter.update(batch_time)
            if sustained_t0 is None:
                # first iteration pays the jit compile: fence it, then
                # start the sustained clock (loader + host_prep + device
                # step all inside the timed region from here on)
                float(jnp.sum(metrics["loss"]))
                sustained_t0 = time.perf_counter()
                t_end = sustained_t0
            else:
                sustained_scans += next(iter(device_batch.values())).shape[0]
            if it % 20 == 0:
                loss = float(metrics["loss"])
                cur_lr = float(lr_fn(int(state.step)))
                logger.info(
                    "epoch %d iter %d/%d loss=%.4f lr=%.2e d_time=%.2fs "
                    "b_time=%.2fs", epoch, it, iters_per_epoch, loss, cur_lr,
                    data_time, batch_time)
                if tb_writer is not None:
                    gstep = int(state.step)
                    tb_writer.add_scalar("train/loss", loss, gstep)
                    tb_writer.add_scalar("meta_data/learning_rate", cur_lr, gstep)
                    for k, v in metrics.items():
                        if k != "loss" and hasattr(v, "item"):
                            tb_writer.add_scalar(f"train/{k}", float(v), gstep)
        if sustained_t0 is not None and sustained_scans > 0:
            # fence: all dispatched steps must finish inside the clock
            float(jnp.sum(metrics["loss"]))
            dt = time.perf_counter() - sustained_t0
            sustained = sustained_scans / dt
            logger.info(
                "epoch %d sustained (loader-in-the-loop, %d scans, compile "
                "step excluded): %.2f scans/s", epoch, sustained_scans,
                sustained)
            if args.bench_json and jax.process_index() == 0:
                import json
                with open(args.bench_json, "w") as f:
                    json.dump({"train_sustained_scans_per_sec":
                               round(sustained, 2),
                               "scans": sustained_scans, "epoch": epoch,
                               "elapsed_s": round(dt, 2)}, f)
        if jax.process_index() == 0 and (epoch + 1) % args.ckpt_save_interval == 0:
            path = ckpt_lib.save_checkpoint(
                state, ckpt_dir, epoch + 1, max_ckpt_save_num=args.max_ckpt_save_num)
            logger.info("saved %s", path)
    logger.info("**********************End training**********************")


if __name__ == "__main__":
    main()
