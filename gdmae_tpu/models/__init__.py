"""Model registry + public builders (reference pcdet/models/__init__.py).

``build_network`` assembles a detector pipeline from config;
``load_data_to_device`` is the H2D boundary (reference load_data_to_gpu);
``model_fn_decorator``'s role (forward + loss closure) is played by
runtime/train.make_train_step.
"""
from __future__ import annotations

import numpy as np

from .detectors.detector3d_template import (  # noqa: F401
    DETECTOR_MODULES,
    DatasetMeta,
    Detector3DTemplate,
    build_network,
)


def load_data_to_device(batch_dict, sharding=None):
    """Host batch -> device arrays (reference models/__init__.py:16
    load_data_to_gpu).  Non-array entries (frame ids, calib objects) stay on
    host."""
    import jax
    import jax.numpy as jnp

    out = {}
    for k, v in batch_dict.items():
        if isinstance(v, np.ndarray):
            arr = jnp.asarray(v)
            if sharding is not None and arr.ndim >= 1:
                arr = jax.device_put(arr, sharding)
            out[k] = arr
        else:
            out[k] = v
    return out
