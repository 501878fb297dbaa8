"""Test config: force an 8-device CPU JAX platform for sharding tests.

The container's sitecustomize registers a remote `axon` TPU tunnel in every
interpreter (driven by PALLAS_AXON_POOL_IPS) before any conftest runs, and
jax computations then ride the network tunnel — unusable for unit tests.
If the tunnel env is present we scrub it and re-exec the interpreter with
JAX_PLATFORMS=cpu.  pytest has already fd-captured stdout/stderr by the
time this conftest runs, so the real output fds are recovered from the
parent process before exec (otherwise the re-exec'd run is silent).
"""
import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    # restore real stdout/stderr fds (pytest dup2'd a tempfile over them)
    try:
        ppid = os.getppid()
        for fd in (1, 2):
            target = os.readlink(f"/proc/{ppid}/fd/{fd}")
            for cand in os.listdir("/proc/self/fd"):
                try:
                    if os.readlink(f"/proc/self/fd/{cand}") == target:
                        os.dup2(int(cand), fd)
                        break
                except OSError:
                    continue
    except OSError:
        pass

    env = dict(os.environ)
    for k in list(env):
        if "AXON" in k or k.startswith("PALLAS_AXON"):
            env.pop(k)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    if "xla_cpu_collective" not in flags:
        # single-core host: 8-device shards execute serially, so the default
        # 20s/40s CPU-collective rendezvous timeouts fire spuriously
        flags += (" --xla_cpu_collective_timeout_seconds=1800"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
    env["XLA_FLAGS"] = flags
    env.setdefault("JAX_ENABLE_X64", "0")
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=1800"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache: full-model tests are compile-dominated on CPU,
# and their graphs are identical across runs
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES",
                      "xla_gpu_per_fusion_autotune_cache_dir")
