"""Dataset registry + dataloader builder (reference
pcdet/datasets/__init__.py:47-76).

Uses the torch CPU DataLoader purely as a multi-worker host pipeline; the
collate function emits fixed-capacity numpy arrays ready for device_put.
"""
from __future__ import annotations

from functools import partial

from .dataset import DatasetTemplate
from .kitti.kitti_dataset import KittiDataset
from .kitti360.kitti360_dataset import Kitti360Dataset
from .synthetic import SyntheticDataset

__all__ = {
    "DatasetTemplate": DatasetTemplate,
    "KittiDataset": KittiDataset,
    "Kitti360Dataset": Kitti360Dataset,
    "SyntheticDataset": SyntheticDataset,
}


def _register_optional():
    """Datasets with heavier deps register lazily."""
    try:
        from .once.once_dataset import ONCEDataset

        __all__["ONCEDataset"] = ONCEDataset
    except ImportError:
        pass
    try:
        from .waymo.waymo_dataset import WaymoDataset

        __all__["WaymoDataset"] = WaymoDataset
    except ImportError:
        pass
    try:
        from .nuscenes.nuscenes_dataset import NuScenesDataset

        __all__["NuScenesDataset"] = NuScenesDataset
    except ImportError:
        pass


_register_optional()


def _collate_with_prep(collate, prep, samples):
    return prep(collate(samples))


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False, root_path=None,
                     workers=4, logger=None, training=True, total_epochs=0, seed=None,
                     process_index=0, process_count=1, host_prep_fn=None):
    """Build dataset + torch DataLoader with fixed-capacity collate.

    Multi-host data parallelism: pass process_index/process_count to give
    each host a strided shard of the dataset (replaces DistributedSampler;
    within-host devices split the batch via the data mesh).

    ``host_prep_fn``: optional ``fn(batch_dict) -> batch_dict`` applied
    AFTER collate INSIDE the loader workers — the host-side index building
    (pillarize tables, MAE targets, window plans) then parallelizes across
    ``workers`` processes instead of serializing on the training loop
    (fork start method: closures capture model config by copy).
    """
    dataset = build_dataset(dataset_cfg, class_names, root_path=root_path,
                            training=training, logger=logger,
                            total_epochs=total_epochs)
    return (dataset,) + build_loader(
        dataset, batch_size, workers=workers, training=training,
        process_index=process_index, process_count=process_count,
        host_prep_fn=host_prep_fn)


def build_dataset(dataset_cfg, class_names, root_path=None, training=True,
                  logger=None, total_epochs=0):
    dataset = __all__[dataset_cfg.DATASET](
        dataset_cfg=dataset_cfg,
        class_names=class_names,
        root_path=root_path,
        training=training,
        logger=logger,
    )
    if total_epochs:
        dataset.set_epoch(0, total_epochs)
    return dataset


def build_loader(dataset, batch_size, workers=4, training=True,
                 process_index=0, process_count=1, host_prep_fn=None):
    import torch.utils.data as torch_data

    sampler = None
    if process_count > 1:
        sampler = torch_data.distributed.DistributedSampler(
            dataset, num_replicas=process_count, rank=process_index,
            shuffle=training)

    dataloader = torch_data.DataLoader(
        dataset,
        batch_size=batch_size,
        pin_memory=False,
        num_workers=workers,
        shuffle=(training and sampler is None),
        collate_fn=(dataset.collate_batch if host_prep_fn is None
                    else partial(_collate_with_prep, dataset.collate_batch,
                                 host_prep_fn)),
        drop_last=training,
        sampler=sampler,
        timeout=0,
        persistent_workers=workers > 0,
    )
    return dataloader, sampler
