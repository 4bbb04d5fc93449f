"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip shardings are validated without TPU hardware by forcing the host
platform and splitting it into 8 virtual devices (the TPU path is identical
code; only the mesh device list differs).
"""

import os
import sys

_ON_TPU = os.environ.get("PNP_TESTS_TPU") == "1"

if not _ON_TPU:
    # Must be set before jax is imported anywhere. Force (not setdefault):
    # the host environment exports JAX_PLATFORMS=axon (the tunneled TPU
    # plugin).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not _ON_TPU:
    # Parity tests compare against fp64 / torch oracles: force exact fp32
    # matmuls and convs (production code uses the fast default MXU
    # precision instead).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
# PNP_TESTS_TPU=1 (the real-chip parity tier, tests/test_tpu_parity.py):
# keep the axon platform AND the production MXU precision — the tier's
# tolerances are set for what production actually runs.

import pytest  # noqa: E402

# The pre-commit FAST tier (`python -m pytest tests/ -m fast -q`): the
# measured-quick files — 120 tests, ~2.5 min total on the CPU mesh vs
# ~42 min for the full suite (round-4 --durations run) — still covering
# the torch-oracle parity suite, the armed checkpoint-parity gate, the
# 2-process jax.distributed world, core ops/pipeline/metrics/train-step,
# and the deploy/serving CLIs. Everything else (whole-model forwards,
# interpret-mode kernels, baselines zoo) runs in the full suite.
_FAST_FILES = {
    "test_ablation_blocks.py", "test_compose.py", "test_convert.py",
    "test_data_prep.py",
    "test_data_prep_extra.py", "test_deform_conv.py", "test_degradations.py",
    "test_deploy_test_cli.py", "test_deployment_serving.py",
    "test_metrics.py", "test_multihost.py", "test_mv_raster.py",
    "test_niqe.py", "test_ops.py", "test_parity_gate.py",
    "test_pipeline.py", "test_torch_oracle.py", "test_train.py",
    "test_utils.py", "test_vimeo_bd.py",
}


# The SLOW tier (`-m slow`, excluded by `-m "not slow"`): the files that
# dominate full-suite wall time (round-4 durations: test_baselines ~14 min,
# test_e2e + zoo forwards most of the rest; test_protocol_eval drives
# dist_test.sh subprocesses at protocol geometry). CI budget guidance:
#   -m fast        ~2.5 min   pre-commit
#   -m "not slow"  ~12 min    per-PR
#   (everything)   ~40 min    nightly
_SLOW_FILES = {
    "test_baselines.py", "test_e2e.py", "test_upstream.py",
    "test_protocol_eval.py",
}


def pytest_collection_modifyitems(items):
    for it in items:
        if it.path.name in _FAST_FILES:
            it.add_marker(pytest.mark.fast)
        if it.path.name in _SLOW_FILES:
            it.add_marker(pytest.mark.slow)
