"""Run the model-family smoke tests ON THE REAL TPU.

The pytest suite forces JAX_PLATFORMS=cpu (tests/conftest.py), so the
compiled kernels it exercises never touch the actual device.  That gap bit
once already: the rotated-IoU polygon clipper's vmapped tiny scatters
passed every CPU test but hard-crashed the TPU runtime at eval scale.
This script imports the same test functions and runs them against the
default (tunneled TPU) backend.

Usage: python tools/tpu_smoke.py [name-substring ...]
"""
from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CASES = [
    ("second_voxel3d", "tests.test_second_net", "test_second_train_eval"),
    ("ssd3d_pointnet2", "tests.test_point_models", "test_ssd3d_train_eval"),
    ("graphrcnn_two_stage", "tests.test_two_stage",
     "test_graph_rcnn_two_stage_train_eval"),
    ("centerpoint", "tests.test_center_head",
     ("test_centerpoint_train_eval", (False,))),
    ("centerpoint_iou", "tests.test_center_head",
     ("test_centerpoint_train_eval", (True,))),
    ("voxel_set_abstraction", "tests.test_pfe",
     "test_voxel_set_abstraction_shapes"),
]


def main():
    import importlib

    import jax

    filters = sys.argv[1:]
    print(f"devices: {jax.devices()}", flush=True)
    failed = []
    for name, mod_name, fn_spec in CASES:
        if filters and not any(f in name for f in filters):
            continue
        if isinstance(fn_spec, tuple):
            fn_name, args = fn_spec
        else:
            fn_name, args = fn_spec, ()
        t0 = time.perf_counter()
        try:
            mod = importlib.import_module(mod_name)
            getattr(mod, fn_name)(*args)
            print(f"OK   {name} ({time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception:
            failed.append(name)
            print(f"FAIL {name} ({time.perf_counter()-t0:.0f}s)", flush=True)
            traceback.print_exc()
    print(("FAILED: " + ", ".join(failed)) if failed else "ALL OK", flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
