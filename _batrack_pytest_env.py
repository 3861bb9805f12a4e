"""Early-loaded pytest plugin that re-execs the test run on a CPU mesh.

This container registers a remote-TPU JAX backend from sitecustomize at
interpreter startup, which cannot be undone in-process. Tests must run on a
virtual 8-device CPU mesh (JAX_PLATFORMS=cpu + host_platform_device_count=8),
so the first thing the test session does is re-exec itself with the right
environment. This module is loaded via `addopts = -p _batrack_pytest_env`
(pyproject.toml), which imports it *before* pytest's capture manager replaces
the stdio file descriptors — a plain conftest.py re-exec would lose all
output.

Set BATRACK_TPU_TESTS_ON_TPU=1 to skip the re-exec and run against the real
TPU backend.
"""

import os
import sys

if (
    os.environ.get("_BATRACK_TPU_TEST_REEXEC") != "1"
    and os.environ.get("BATRACK_TPU_TESTS_ON_TPU") != "1"
):
    env = dict(os.environ)
    env["_BATRACK_TPU_TEST_REEXEC"] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable remote-TPU autoregistration
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
