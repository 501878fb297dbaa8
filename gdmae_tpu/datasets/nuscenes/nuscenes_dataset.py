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
