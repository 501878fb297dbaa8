"""NuScenes dataset — multi-sweep loading + devkit NDS/mAP evaluation
(reference pcdet/datasets/nuscenes/nuscenes_dataset.py)."""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        if root_path is None:
            root_path = Path(dataset_cfg.DATA_PATH) / dataset_cfg.VERSION
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names, training=training,
            root_path=root_path, logger=logger,
        )
        self.infos = []
        self.include_nuscenes_data(self.mode)
        if self.training and self.dataset_cfg.get("BALANCED_RESAMPLING", False):
            self.infos = self.balanced_infos_resampling(self.infos)

    def include_nuscenes_data(self, mode):
        infos = []
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            path = self.root_path / info_path
            if not path.exists():
                continue
            with open(path, "rb") as f:
                infos.extend(pickle.load(f))
        self.infos.extend(infos)
        if self.logger is not None:
            self.logger.info("Total samples for NuScenes dataset: %d", len(infos))

    def balanced_infos_resampling(self, infos):
        """Class-balanced duplication (reference :37-72)."""
        cls_infos = {name: [] for name in self.class_names}
        for info in infos:
            for name in set(info["gt_names"]):
                if name in self.class_names:
                    cls_infos[name].append(info)
        duplicated = sum(len(v) for v in cls_infos.values())
        if duplicated == 0:
            return infos
        frac = 1.0 / len(self.class_names)
        sampled = []
        for v in cls_infos.values():
            ratio = frac * duplicated / max(len(v), 1)
            sampled += np.random.choice(v, int(len(v) * ratio)).tolist() if v else []
        return sampled or infos

    def get_sweep(self, sweep_info):
        def remove_ego(points, r=1.0):
            keep = ~((np.abs(points[:, 0]) < r) & (np.abs(points[:, 1]) < r))
            return points[keep]

        pts = np.fromfile(
            str(self.root_path / sweep_info["lidar_path"]), dtype=np.float32
        ).reshape([-1, 5])[:, :4]
        pts = remove_ego(pts).T
        if sweep_info["transform_matrix"] is not None:
            n = pts.shape[1]
            pts[:3, :] = sweep_info["transform_matrix"].dot(
                np.vstack((pts[:3, :], np.ones(n))))[:3, :]
        times = sweep_info["time_lag"] * np.ones((1, pts.shape[1]))
        return pts.T, times.T

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        info = self.infos[index]
        pts = np.fromfile(
            str(self.root_path / info["lidar_path"]), dtype=np.float32
        ).reshape([-1, 5])[:, :4]
        sweep_pts = [pts]
        sweep_times = [np.zeros((pts.shape[0], 1))]
        n_sweeps = len(info.get("sweeps", []))
        for k in np.random.choice(n_sweeps, min(max_sweeps - 1, n_sweeps), replace=False):
            p, t = self.get_sweep(info["sweeps"][k])
            sweep_pts.append(p)
            sweep_times.append(t)
        points = np.concatenate(sweep_pts, axis=0)
        times = np.concatenate(sweep_times, axis=0).astype(points.dtype)
        return np.concatenate((points, times), axis=1)

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])
        points = self.get_lidar_with_sweeps(
            index, max_sweeps=self.dataset_cfg.MAX_SWEEPS)
        input_dict = {
            "points": points,
            "frame_id": Path(info["lidar_path"]).stem,
            "metadata": {"token": info["token"]},
        }
        if "gt_boxes" in info:
            min_pts = self.dataset_cfg.get("FILTER_MIN_POINTS_IN_GT", False)
            mask = (info["num_lidar_pts"] > min_pts - 1) if min_pts else None
            input_dict.update({
                "gt_names": info["gt_names"] if mask is None else info["gt_names"][mask],
                "gt_boxes": info["gt_boxes"] if mask is None else info["gt_boxes"][mask],
            })
        data_dict = self.prepare_data(data_dict=input_dict)
        if self.dataset_cfg.get("SET_NAN_VELOCITY_TO_ZEROS", False) and \
                "gt_boxes" in data_dict:
            gt = data_dict["gt_boxes"]
            gt[np.isnan(gt)] = 0
            data_dict["gt_boxes"] = gt
        if not self.dataset_cfg.get("PRED_VELOCITY", False) and "gt_boxes" in data_dict:
            data_dict["gt_boxes"] = data_dict["gt_boxes"][:, [0, 1, 2, 3, 4, 5, 6, -1]]
        return data_dict

    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names, output_path=None):
        annos = []
        for index, box_dict in enumerate(pred_dicts):
            scores = np.asarray(box_dict["pred_scores"])
            boxes = np.asarray(box_dict["pred_boxes"])
            labels = np.asarray(box_dict["pred_labels"]).astype(np.int64)
            out = {
                "name": np.array(class_names)[labels - 1] if len(scores)
                else np.zeros(0, dtype=object),
                "score": scores,
                "boxes_lidar": boxes,
                "pred_labels": labels,
                "frame_id": batch_dict["frame_id"][index],
                "metadata": batch_dict.get("metadata", [None] * (index + 1))[index],
            }
            annos.append(out)
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        try:
            from nuscenes.nuscenes import NuScenes
            from . import nuscenes_utils
        except ImportError as e:
            return f"nuscenes devkit unavailable ({e})", {}
        import json

        nusc = NuScenes(
            version=self.dataset_cfg.VERSION, dataroot=str(self.root_path),
            verbose=True)
        nusc_annos = nuscenes_utils.transform_det_annos_to_nusc_annos(det_annos, nusc)
        nusc_annos["meta"] = {
            "use_camera": False, "use_lidar": True, "use_radar": False,
            "use_map": False, "use_external": False,
        }
        output_path = Path(kwargs.get("output_path", "."))
        output_path.mkdir(exist_ok=True, parents=True)
        res_path = output_path / "results_nusc.json"
        with open(res_path, "w") as f:
            json.dump(nusc_annos, f)
        from nuscenes.eval.detection.config import config_factory
        from nuscenes.eval.detection.evaluate import NuScenesEval

        eval_version = "detection_cvpr_2019"
        nusc_eval = NuScenesEval(
            nusc, config=config_factory(eval_version),
            result_path=str(res_path),
            eval_set="val" if "train" in self.dataset_cfg.VERSION else "test",
            output_dir=str(output_path), verbose=True)
        metrics_summary = nusc_eval.main(plot_examples=0, render_curves=False)
        return str(metrics_summary), metrics_summary

    # -- raw-data tooling (reference nuscenes_dataset.py:252-339) --------- #
    def create_groundtruth_database(self, used_classes=None, max_sweeps=10):
        """Per-object point clips + db infos for the gt-sampling augmentor
        (reference :252-291).  Torch-free: the reference's
        ``points_in_boxes_gpu`` (one box id per point, first box wins)
        becomes a numpy corners/in-hull assignment on host."""
        from ...utils import box_utils

        database_save_path = self.root_path / f"gt_database_{max_sweeps}sweeps_withvelo"
        db_info_save_path = self.root_path / f"nuscenes_dbinfos_{max_sweeps}sweeps_withvelo.pkl"
        database_save_path.mkdir(parents=True, exist_ok=True)

        all_db_infos = {}
        for idx in range(len(self.infos)):
            info = self.infos[idx]
            points = self.get_lidar_with_sweeps(idx, max_sweeps=max_sweeps)
            gt_boxes = info["gt_boxes"]
            gt_names = info["gt_names"]
            if len(gt_boxes) == 0:
                continue
            corners = box_utils.boxes_to_corners_3d(
                np.asarray(gt_boxes[:, :7], np.float32))
            assigned = np.zeros(len(points), bool)
            for i in range(gt_boxes.shape[0]):
                inside = box_utils.in_hull(points[:, 0:3], corners[i]) & ~assigned
                assigned |= inside
                gt_points = points[inside].astype(np.float32)
                gt_points[:, :3] -= gt_boxes[i, :3]
                filename = "%s_%s_%d.bin" % (idx, gt_names[i], i)
                filepath = database_save_path / filename
                gt_points.tofile(filepath)
                if used_classes is None or gt_names[i] in used_classes:
                    db_info = {
                        "name": gt_names[i],
                        "path": str(filepath.relative_to(self.root_path)),
                        "image_idx": idx, "gt_idx": i,
                        "box3d_lidar": gt_boxes[i],
                        "num_points_in_gt": gt_points.shape[0],
                    }
                    all_db_infos.setdefault(str(gt_names[i]), []).append(db_info)
        for k, v in all_db_infos.items():
            print("Database %s: %d" % (k, len(v)))
        with open(db_info_save_path, "wb") as f:
            pickle.dump(all_db_infos, f)
        return db_info_save_path


def create_nuscenes_info(version, data_path, save_path, max_sweeps=10,
                         nusc=None, scene_splits=None):
    """Build the per-split info pkls from a raw nuScenes root (reference
    nuscenes_dataset.py:294-339).  ``nusc``/``scene_splits`` are injectable
    so the pipeline is testable without the devkit; by default they come
    from the nuscenes package (guarded import)."""
    from . import nuscenes_utils

    data_path, save_path = Path(data_path), Path(save_path)
    assert version in ("v1.0-trainval", "v1.0-test", "v1.0-mini")
    if scene_splits is None:
        from nuscenes.utils import splits
        scene_splits = {
            "v1.0-trainval": (splits.train, splits.val),
            "v1.0-test": (splits.test, []),
            "v1.0-mini": (splits.mini_train, splits.mini_val),
        }
    train_scenes, val_scenes = scene_splits[version]
    if nusc is None:
        from nuscenes.nuscenes import NuScenes
        nusc = NuScenes(version=version, dataroot=str(data_path), verbose=True)

    available = nuscenes_utils.get_available_scenes(nusc)
    names = [s["name"] for s in available]
    train_scenes = {available[names.index(s)]["token"]
                    for s in train_scenes if s in names}
    val_scenes = {available[names.index(s)]["token"]
                  for s in val_scenes if s in names}
    print("%s: train scene(%d), val scene(%d)"
          % (version, len(train_scenes), len(val_scenes)))

    train_infos, val_infos = nuscenes_utils.fill_trainval_infos(
        data_path=data_path, nusc=nusc, train_scenes=train_scenes,
        val_scenes=val_scenes, test="test" in version, max_sweeps=max_sweeps)

    save_path.mkdir(parents=True, exist_ok=True)
    if version == "v1.0-test":
        print("test sample: %d" % len(train_infos))
        with open(save_path / f"nuscenes_infos_{max_sweeps}sweeps_test.pkl", "wb") as f:
            pickle.dump(train_infos, f)
    else:
        print("train sample: %d, val sample: %d"
              % (len(train_infos), len(val_infos)))
        with open(save_path / f"nuscenes_infos_{max_sweeps}sweeps_train.pkl", "wb") as f:
            pickle.dump(train_infos, f)
        with open(save_path / f"nuscenes_infos_{max_sweeps}sweeps_val.pkl", "wb") as f:
            pickle.dump(val_infos, f)


if __name__ == "__main__":
    import argparse

    import yaml

    from ...config import as_easy
    from ...utils import common_utils

    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--version", default="v1.0-trainval")
    parser.add_argument("--with_gt_database", action="store_true",
                        default=True)
    args = parser.parse_args()

    with open(args.cfg_file) as f:
        dataset_cfg = as_easy(yaml.safe_load(f))
    dataset_cfg.VERSION = args.version
    create_nuscenes_info(
        version=args.version, data_path=Path(args.data_path),
        save_path=Path(args.data_path),
        max_sweeps=dataset_cfg.MAX_SWEEPS)
    ds = NuScenesDataset(
        dataset_cfg=dataset_cfg, class_names=None,
        root_path=Path(args.data_path),
        logger=common_utils.create_logger(), training=True)
    ds.create_groundtruth_database(max_sweeps=dataset_cfg.MAX_SWEEPS)
