"""Official Waymo OD metrics wrapper (reference
pcdet/datasets/waymo/waymo_eval.py) — requires the waymo-open-dataset
package + TensorFlow; importing this module without them raises ImportError,
which WaymoDataset.evaluation catches and reports.
"""
from __future__ import annotations

import numpy as np
import tensorflow as tf
from waymo_open_dataset.metrics.python import detection_metrics
from waymo_open_dataset.protos import metrics_pb2

from ...utils import common_utils


class OpenPCDetWaymoDetectionMetricsEstimator(tf.test.TestCase):
    """Reference waymo_eval.py:23+ — TF graph computing the official AP/APH
    breakdowns in-process."""

    WAYMO_CLASSES = ["unknown", "Vehicle", "Pedestrian", "Sign", "Cyclist"]

    def generate_waymo_type_results(self, infos, class_names, is_gt=False,
                                    fake_gt_infos=True):
        frame_id, boxes3d, obj_type, score, overlap_nlz, difficulty = \
            [], [], [], [], [], []
        for frame_index, info in enumerate(infos):
            if is_gt:
                box_mask = np.array(
                    [n in class_names for n in info["name"]], dtype=bool)
                if "num_points_in_gt" in info:
                    zero_diff = info["difficulty"] == 0
                    info["difficulty"][zero_diff & (info["num_points_in_gt"] > 5)] = 1
                    info["difficulty"][zero_diff & (info["num_points_in_gt"] <= 5)] = 2
                    nonzero_mask = info["num_points_in_gt"] > 0
                    box_mask = box_mask & nonzero_mask
                num_boxes = box_mask.sum()
                box_name = info["name"][box_mask]
                difficulty.append(info["difficulty"][box_mask])
                score.append(np.ones(num_boxes))
                boxes3d.append(info["gt_boxes_lidar"][box_mask])
            else:
                num_boxes = len(info["boxes_lidar"])
                difficulty.append([0] * num_boxes)
                score.append(info["score"])
                boxes3d.append(np.array(info["boxes_lidar"][:, :7]))
                box_name = info["name"]
            obj_type += [self.WAYMO_CLASSES.index(name) for name in box_name]
            frame_id.append(np.array([frame_index] * num_boxes))
            overlap_nlz.append(np.zeros(num_boxes, dtype=bool))

        frame_id = np.concatenate(frame_id).reshape(-1).astype(np.int64)
        boxes3d = np.concatenate(boxes3d, axis=0)
        obj_type = np.array(obj_type).reshape(-1)
        score = np.concatenate(score).reshape(-1)
        overlap_nlz = np.concatenate(overlap_nlz).reshape(-1)
        difficulty = np.concatenate(difficulty).reshape(-1).astype(np.int8)
        boxes3d[:, -1] = common_utils.limit_period(
            boxes3d[:, -1], offset=0.5, period=np.pi * 2)
        return frame_id, boxes3d, obj_type, score, overlap_nlz, difficulty

    def build_config(self):
        config = metrics_pb2.Config()
        config_text = """
        breakdown_generator_ids: OBJECT_TYPE
        difficulties { levels: 1 levels: 2 }
        matcher_type: TYPE_HUNGARIAN
        iou_thresholds: 0.0
        iou_thresholds: 0.7
        iou_thresholds: 0.5
        iou_thresholds: 0.5
        iou_thresholds: 0.5
        box_type: TYPE_3D
        """
        for x in range(0, 100):
            config.score_cutoffs.append(x * 0.01)
        config.score_cutoffs.append(1.0)
        from google.protobuf import text_format

        text_format.Merge(config_text, config)
        return config

    def build_graph(self, graph):
        with graph.as_default():
            self._pd_frame_id = tf.compat.v1.placeholder(dtype=tf.int64)
            self._pd_bbox = tf.compat.v1.placeholder(dtype=tf.float32)
            self._pd_type = tf.compat.v1.placeholder(dtype=tf.uint8)
            self._pd_score = tf.compat.v1.placeholder(dtype=tf.float32)
            self._gt_frame_id = tf.compat.v1.placeholder(dtype=tf.int64)
            self._gt_bbox = tf.compat.v1.placeholder(dtype=tf.float32)
            self._gt_type = tf.compat.v1.placeholder(dtype=tf.uint8)
            self._gt_difficulty = tf.compat.v1.placeholder(dtype=tf.uint8)
            metrics = detection_metrics.get_detection_metric_ops(
                config=self.build_config(),
                prediction_frame_id=self._pd_frame_id,
                prediction_bbox=self._pd_bbox,
                prediction_type=self._pd_type,
                prediction_score=self._pd_score,
                prediction_overlap_nlz=tf.zeros_like(self._pd_frame_id, dtype=tf.bool),
                ground_truth_bbox=self._gt_bbox,
                ground_truth_type=self._gt_type,
                ground_truth_frame_id=self._gt_frame_id,
                ground_truth_difficulty=self._gt_difficulty,
            )
            return metrics

    def run_eval_ops(self, sess, graph, metrics, prediction_frame_id,
                     prediction_bbox, prediction_type, prediction_score,
                     ground_truth_frame_id, ground_truth_bbox,
                     ground_truth_type, ground_truth_difficulty):
        sess.run(
            [tf.group([value[1] for value in metrics.values()])],
            feed_dict={
                self._pd_bbox: prediction_bbox,
                self._pd_frame_id: prediction_frame_id,
                self._pd_type: prediction_type,
                self._pd_score: prediction_score,
                self._gt_bbox: ground_truth_bbox,
                self._gt_type: ground_truth_type,
                self._gt_frame_id: ground_truth_frame_id,
                self._gt_difficulty: ground_truth_difficulty,
            },
        )

    def waymo_evaluation(self, prediction_infos, gt_infos, class_name,
                         distance_thresh=100, fake_gt_infos=True):
        assert len(prediction_infos) == len(gt_infos)
        pd_frameid, pd_boxes3d, pd_type, pd_score, _, _ = \
            self.generate_waymo_type_results(prediction_infos, class_name, is_gt=False)
        gt_frameid, gt_boxes3d, gt_type, gt_score, _, gt_difficulty = \
            self.generate_waymo_type_results(
                gt_infos, class_name, is_gt=True, fake_gt_infos=fake_gt_infos)

        def mask_by_distance(boxes3d, *args):
            mask = np.linalg.norm(boxes3d[:, 0:2], axis=1) < distance_thresh + 0.5
            return (boxes3d[mask],) + tuple(a[mask] for a in args)

        pd_boxes3d, pd_frameid, pd_type, pd_score = mask_by_distance(
            pd_boxes3d, pd_frameid, pd_type, pd_score)
        gt_boxes3d, gt_frameid, gt_type, gt_score, gt_difficulty = mask_by_distance(
            gt_boxes3d, gt_frameid, gt_type, gt_score, gt_difficulty)

        graph = tf.Graph()
        metrics = self.build_graph(graph)
        with self.test_session(graph=graph) as sess:
            sess.run(tf.compat.v1.initializers.local_variables())
            self.run_eval_ops(
                sess, graph, metrics, pd_frameid, pd_boxes3d, pd_type,
                pd_score, gt_frameid, gt_boxes3d, gt_type, gt_difficulty)
            with tf.compat.v1.variable_scope("detection_metrics", reuse=True):
                aps = {name: sess.run([value[0]])
                       for name, value in metrics.items()}
        return aps
