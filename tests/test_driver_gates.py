"""Regression tests for the driver's official gates and round-1 weak spots.

1. `dryrun_multichip(8)` must work when *imported* under an interpreter whose
   ambient backend has <8 devices (the driver's call path; MULTICHIP_r01
   failed exactly this way — the function now self-provisions an 8-device
   CPU mesh via subprocess re-exec).
2. `--flag False` must parse as False (round-1 `type=bool` footgun).
3. `all_reduce_metrics` must be a real collective mean, not an identity stub.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_import_call_self_provisions():
    """Simulate the driver: fresh interpreter, NO forced device count, import
    and call dryrun_multichip(8).  Must exit 0 and print the mesh line."""
    env = {k: v for k, v in os.environ.items()}
    flags = (env.get("XLA_FLAGS", "")
             .replace("--xla_force_host_platform_device_count=8", "")).strip()
    env.pop("XLA_FLAGS", None)
    if flags:
        env["XLA_FLAGS"] = flags
    code = ("import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"  # 1 CPU device
            "from __graft_entry__ import dryrun_multichip\n"
            "dryrun_multichip(8)\n")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=2400)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8)" in proc.stdout
    # flagship-shape AOT sharding validation (round-2 VERDICT item 6): the
    # gate must compile the base model at 2048/2048 under DP and FSDP at
    # the SHIPPED defaults (round 5: no-remat) and print the per-device
    # net memory estimate
    assert "flagship_aot(8dev,dp,shipped): compiled ok" in proc.stdout, \
        proc.stdout
    assert "flagship_aot(8dev,fsdp,shipped): compiled ok" in proc.stdout
    # true multi-process leg (round-4 VERDICT missing item 1)
    assert "dryrun_multiprocess(2x4dev)" in proc.stdout


def test_str2bool_flags_parse_false():
    sys.path.insert(0, REPO)
    import run_training_egom2p
    import run_training_vqvae

    args = run_training_egom2p.get_args(
        ["--data_config", "x.yaml", "--use_act_checkpoint", "False"])
    assert args.use_act_checkpoint is False
    args = run_training_vqvae.get_args(
        ["--post_mlp", "False", "--norm_codes", "false",
         "--kmeans_init", "True"])
    assert args.post_mlp is False and args.norm_codes is False
    assert args.kmeans_init is True


def test_str2bool_rejects_garbage():
    import argparse

    import pytest

    from egom2p_tpu.core.config import str2bool
    with pytest.raises(argparse.ArgumentTypeError):
        str2bool("maybe")


def test_all_reduce_metrics_real_mean(monkeypatch):
    """Force the collective path on the 8-device CPU mesh and prove the
    psum actually runs: perturb each device's contribution by +i at the
    array-construction seam, so the true mean is value + 3.5 — an identity
    stub (which returns the unperturbed input) fails this."""
    import jax

    from egom2p_tpu.core.distributed import all_reduce_metrics

    metrics = {"loss": 3.25, "grad_norm": 1.5}
    out = all_reduce_metrics(metrics, force=True)
    assert set(out) == set(metrics)
    np.testing.assert_allclose(out["loss"], 3.25, rtol=1e-6)
    np.testing.assert_allclose(out["grad_norm"], 1.5, rtol=1e-6)

    real_make = jax.make_array_from_process_local_data

    def perturbed(sharding, data, shape):
        data = np.asarray(data) + np.arange(len(data), dtype=np.float32)[:, None]
        return real_make(sharding, data, shape)

    monkeypatch.setattr(jax, "make_array_from_process_local_data", perturbed)
    n_dev = len(jax.devices())
    out2 = all_reduce_metrics(metrics, force=True)
    np.testing.assert_allclose(out2["loss"],
                               3.25 + (n_dev - 1) / 2.0, rtol=1e-6)
