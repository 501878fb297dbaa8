"""Evaluation CLI (reference tools/test.py + tools/eval_utils/eval_utils.py).

Loads a checkpoint, runs the jitted eval step over the test split, converts
fixed-capacity device predictions to per-frame annotation dicts via the
dataset's ``generate_prediction_dicts``, and scores them with the official
protocol (``dataset.evaluation``).
"""
from __future__ import annotations

import argparse
import datetime
import pickle
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from gdmae_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
from gdmae_tpu.utils import common_utils


def parse_config():
    parser = argparse.ArgumentParser(description="gdmae_tpu evaluation")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--save_to_file", action="store_true")
    parser.add_argument("--eval_all", action="store_true",
                        help="poll the ckpt dir and evaluate every new "
                             "checkpoint (reference test.py repeat_eval_ckpt)")
    parser.add_argument("--ckpt_dir", type=str, default=None,
                        help="checkpoint dir for --eval_all")
    parser.add_argument("--eval_tag", type=str, default="default")
    parser.add_argument("--start_epoch", type=int, default=0)
    parser.add_argument("--max_waiting_mins", type=int, default=30)
    parser.add_argument("--synthetic", type=int, default=0, metavar="N",
                        help="evaluate on N synthetic random scenes (no "
                             "dataset files needed)")
    parser.add_argument("--fuse_conv_bn", action="store_true",
                        help="fold BatchNorm into preceding convs before eval "
                             "(reference eval_utils.py:40-41)")
    parser.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = "/".join(args.cfg_file.split("/")[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def compute_recalls(gt_boxes, pred_boxes, thresh_list):
    """Per-threshold gt recall (reference detector3d_template.py:317-359),
    host-side via the native rotated 3D IoU."""
    from gdmae_tpu.datasets.once.once_eval.evaluation import iou3d_with_heading

    counts = {t: 0 for t in thresh_list}
    total_gt = 0
    valid = np.any(np.abs(gt_boxes) > 1e-6, axis=-1)
    gt = gt_boxes[valid][:, :7]
    total_gt += len(gt)
    if len(gt) and len(pred_boxes):
        iou = iou3d_with_heading(gt.astype(np.float64),
                                 pred_boxes[:, :7].astype(np.float64),
                                 with_heading=False)
        best = iou.max(axis=1)
        for t in thresh_list:
            counts[t] += int((best > t).sum())
    return counts, total_gt


def eval_one_epoch(model, variables, dataloader, dataset, class_names, logger,
                   result_dir=None, recall_thresh_list=(0.3, 0.5, 0.7)):
    """Reference eval_utils.eval_one_epoch (:23-130)."""
    import jax
    import jax.numpy as jnp

    from gdmae_tpu.runtime import train as train_lib

    eval_step = train_lib.make_eval_step(model)
    det_annos = []
    infer_times = []
    recall_counts = {t: 0 for t in recall_thresh_list}
    recall_gt = 0
    for batch in dataloader:
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                        if isinstance(v, np.ndarray)}
        t0 = time.perf_counter()
        out = eval_step(variables["params"], variables.get("batch_stats", {}),
                        device_batch)
        boxes = np.asarray(out["final_boxes"])
        scores = np.asarray(out["final_scores"])
        labels = np.asarray(out["final_labels"])
        valid = np.asarray(out["final_valid"])
        infer_times.append((time.perf_counter() - t0) / len(boxes))

        pred_dicts = []
        for bi in range(len(boxes)):
            m = valid[bi]
            pred_dicts.append({
                "pred_boxes": boxes[bi][m][:, :7],
                "pred_scores": scores[bi][m],
                "pred_labels": labels[bi][m].astype(np.int64),
            })
            if "gt_boxes" in batch:
                c, g = compute_recalls(batch["gt_boxes"][bi],
                                       boxes[bi][m], recall_thresh_list)
                for t in recall_thresh_list:
                    recall_counts[t] += c[t]
                recall_gt += g
        annos = dataset.generate_prediction_dicts(
            batch, pred_dicts, class_names,
            output_path=result_dir if result_dir else None)
        det_annos += annos

    logger.info("p50 per-scan latency: %.1f ms",
                1000 * float(np.median(infer_times)))
    if recall_gt > 0:
        for t in recall_thresh_list:
            logger.info("recall_rcnn_%.1f: %.4f", t,
                        recall_counts[t] / max(recall_gt, 1))
    result_str, result_dict = dataset.evaluation(det_annos, class_names)
    if result_str:
        logger.info(result_str)
    return det_annos, result_dict


def main():
    args, cfg_ = parse_config()

    import jax
    import jax.numpy as jnp

    from gdmae_tpu.datasets import build_dataloader
    from gdmae_tpu.models.detectors.detector3d_template import DatasetMeta, build_network
    from gdmae_tpu.runtime import checkpoint as ckpt_lib
    from gdmae_tpu.runtime import train as train_lib

    np.random.seed(1024)
    batch_size = args.batch_size or cfg_.OPTIMIZATION.BATCH_SIZE_PER_GPU
    output_dir = REPO / "output" / cfg_.EXP_GROUP_PATH / cfg_.TAG / args.extra_tag
    result_dir = output_dir / "eval"
    result_dir.mkdir(parents=True, exist_ok=True)
    log_file = result_dir / f"log_eval_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    logger = common_utils.create_logger(log_file)

    if args.synthetic:
        cfg_.DATA_CONFIG.DATASET = "SyntheticDataset"
        cfg_.DATA_CONFIG.SYNTHETIC = {"NUM_SAMPLES": args.synthetic}
    data_path = Path(cfg_.DATA_CONFIG.DATA_PATH)
    if not data_path.is_absolute():
        data_path = (REPO / "tools" / data_path).resolve()
    dataset, dataloader, _ = build_dataloader(
        dataset_cfg=cfg_.DATA_CONFIG, class_names=cfg_.CLASS_NAMES,
        batch_size=batch_size, root_path=data_path, workers=args.workers,
        logger=logger, training=False)

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

    example = next(iter(dataloader))
    device_batch = {k: jnp.asarray(v) for k, v in example.items()
                    if isinstance(v, np.ndarray)}
    params, batch_stats = train_lib.init_model(model, device_batch)

    from flax import serialization

    from gdmae_tpu.models.model_utils.fusion_utils import fuse_conv_bn

    def eval_ckpt(ckpt_path, out_dir):
        if str(ckpt_path).endswith(".pth"):
            # reference torch checkpoint: name-mapped partial import
            from gdmae_tpu.runtime import torch_import
            sd = torch_import.load_torch_checkpoint(str(ckpt_path))
            p, bs, _ = torch_import.import_torch_state(
                sd, params, batch_stats, logger=logger)
            payload = {"epoch": "torch"}
        else:
            with open(ckpt_path, "rb") as f:
                payload = pickle.load(f)
            p = serialization.from_bytes(params, payload["params"])
            bs = serialization.from_bytes(batch_stats, payload["batch_stats"])
        if args.fuse_conv_bn:
            p, bs = fuse_conv_bn(p, bs)
        logger.info("loaded %s (epoch %s)", ckpt_path, payload.get("epoch"))
        out_dir.mkdir(parents=True, exist_ok=True)
        det_annos, result_dict = eval_one_epoch(
            model, {"params": p, "batch_stats": bs}, dataloader,
            dataset, cfg_.CLASS_NAMES, logger,
            result_dir=out_dir if args.save_to_file else None)
        with open(out_dir / "result.pkl", "wb") as f:
            pickle.dump(det_annos, f)
        for k, v in (result_dict or {}).items():
            logger.info("%s: %.4f", k, v)
        return result_dict

    if not args.eval_all:
        ckpt = args.ckpt or ckpt_lib.latest_checkpoint(output_dir / "ckpt")
        assert ckpt is not None, "no checkpoint found"
        eval_ckpt(ckpt, result_dir)
        return

    # repeat_eval_ckpt (reference test.py:87-131): poll the ckpt dir, evaluate
    # each new checkpoint once, give up after max_waiting_mins of no progress.
    ckpt_dir = Path(args.ckpt_dir) if args.ckpt_dir else output_dir / "ckpt"
    record_file = result_dir / "eval_list_val.txt"
    evaluated = set()
    if record_file.exists():
        evaluated = set(record_file.read_text().split())
    try:
        from tensorboardX import SummaryWriter
        tb = SummaryWriter(str(result_dir / "tensorboard_val"))
    except ImportError:
        tb = None
    wait_s = 0.0
    while True:
        cand = sorted(ckpt_dir.glob("checkpoint_epoch_*.pkl"),
                      key=lambda p: p.stat().st_mtime)
        todo = None
        for c in cand:
            epoch = c.stem.split("_")[-1]
            if epoch.isdigit() and int(epoch) < args.start_epoch:
                continue
            if str(c) not in evaluated:
                todo = (c, epoch)
                break
        if todo is None:
            if wait_s / 60 >= args.max_waiting_mins:
                logger.info("no new checkpoint for %d min, exiting",
                            args.max_waiting_mins)
                break
            time.sleep(30)
            wait_s += 30
            continue
        wait_s = 0.0
        c, epoch = todo
        result_dict = eval_ckpt(c, result_dir / f"epoch_{epoch}" / args.eval_tag)
        evaluated.add(str(c))
        with open(record_file, "a") as f:
            f.write(str(c) + "\n")
        if tb is not None and result_dict:
            for k, v in result_dict.items():
                try:
                    tb.add_scalar(f"eval/{k}", float(v), int(epoch))
                except (TypeError, ValueError):
                    pass
        logger.info("epoch %s evaluated", epoch)


if __name__ == "__main__":
    main()
