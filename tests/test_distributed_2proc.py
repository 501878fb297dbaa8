"""2-process `jax.distributed` integration test for the commu facade.

The reference exercises its collectives (pcdet/utils/commu_utils.py:50-111
all_gather of arbitrary pickled objects, :143-145 average_reduce_value) and
the eval-result merge only on real multi-GPU launches; our equivalents in
gdmae_tpu/parallel/mesh.py had previously only ever run at world_size==1
(where they are no-ops).  This test launches TWO real OS processes with a
localhost `jax.distributed` coordinator — the same DCN rendezvous a
multi-host TPU pod uses — and checks the cross-process protocol:

 * all_gather_object with DIFFERENT pickle sizes per rank (the size-padding
   path, mirroring reference commu_utils.py:72-99)
 * average_reduce_value / reduce_dict
 * concat_all_gather of per-rank prediction arrays (the eval merge,
   reference common_utils.merge_results_dist:244-265)
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import json, os, sys
import numpy as np

rank = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
import jax
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=rank)
sys.path.insert(0, sys.argv[4])
from gdmae_tpu.utils import commu_utils as cu

assert cu.get_world_size() == 2, cu.get_world_size()
assert cu.get_rank() == rank

# deliberately different-size objects per rank (exercises size padding)
obj = {"rank": rank, "annos": ["pred"] * (3 + 40 * rank), "score": 0.5 + rank}
gathered = cu.all_gather(obj)

avg = cu.average_reduce_value(float(rank + 1))
red = cu.reduce_dict({"loss": 1.0 + rank, "recall": 0.25 * (rank + 1)},
                     average=True)
cat = cu.concat_all_gather(np.arange(3, dtype=np.int64) + 10 * rank)

out = {
    "gathered_ranks": [g["rank"] for g in gathered],
    "gathered_lens": [len(g["annos"]) for g in gathered],
    "gathered_scores": [g["score"] for g in gathered],
    "avg": avg,
    "red": {k: float(v) for k, v in sorted(red.items())},
    "cat": np.asarray(cat).tolist(),
    "is_main": cu.is_main_process(),
}
with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
    json.dump(out, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_commu_protocol(tmp_path):
    repo = str(Path(__file__).resolve().parent.parent)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()

    env = {k: v for k, v in os.environ.items()
           if "AXON" not in k and not k.startswith("PALLAS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(r), str(port), str(tmp_path),
             repo],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for r in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for r, (p, (so, se)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"rank {r} rc={p.returncode}\n{so.decode()[-2000:]}"
            f"\n{se.decode()[-2000:]}")

    results = [json.load(open(tmp_path / f"rank{r}.json")) for r in range(2)]
    for r, got in enumerate(results):
        # every process sees the same gathered list, in rank order
        assert got["gathered_ranks"] == [0, 1]
        assert got["gathered_lens"] == [3, 43]  # different pickle sizes
        assert got["gathered_scores"] == [0.5, 1.5]
        assert got["avg"] == pytest.approx(1.5)  # mean(1, 2)
        assert got["red"] == {"loss": pytest.approx(1.5),
                              "recall": pytest.approx(0.375)}
        assert got["cat"] == [0, 1, 2, 10, 11, 12]
        assert got["is_main"] == (r == 0)
