"""Multi-step generation determinism on real TPU hardware.

The CPU-tier determinism test (test_generate.py::
test_generate_deterministic_with_seed) had to drop to a single decoding
step: XLA:CPU's threaded oneDNN reductions are not run-to-run bitwise
deterministic, and with 2+ ROAR steps one tie-flip in step 1 changes the
step-2 conditioning and avalanches.  TPU executions ARE bitwise
deterministic, so the cross-step conditioning handoff — the part the
1-step test cannot see — is asserted exactly here.  Runs in a subprocess
because conftest pins this interpreter to CPU (same pattern as
test_flash_tpu.py).
"""
import os
import subprocess
import sys

import pytest

from tests.test_flash_tpu import _tpu_available, _tpu_reachable

pytestmark = pytest.mark.slow

_CHECK = r"""
import numpy as np
import jax, jax.numpy as jnp
from egom2p_tpu.core.cache import enable_persistent_cache
enable_persistent_cache()
from egom2p_tpu.generate import (GenerationSampler,
                                 build_chained_generation_schedules,
                                 init_empty_target_modality,
                                 init_full_input_modality)
from egom2p_tpu.models.egom2p import create_model
from tests.test_model import MODALITY_INFO

MODS = ("tok_rgb", "tok_depth", "tok_cam", "tok_gaze")
model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                     in_domains=MODS, out_domains=MODS,
                     modality_info=MODALITY_INFO)
L = MODALITY_INFO["tok_rgb"]["max_tokens"]
mod_dict = {"tok_rgb": {"tensor": np.random.default_rng(0).integers(
    0, 96, size=(1, L)).astype(np.int32)}}
init_full_input_modality(mod_dict, MODALITY_INFO, "tok_rgb")
init_empty_target_modality(mod_dict, MODALITY_INFO, "tok_depth", 1, L)
md_init = {m: {k: jnp.asarray(v) for k, v in d.items()}
           for m, d in mod_dict.items()}
params = model.init(jax.random.PRNGKey(0), md_init, 16, 16)
sampler = GenerationSampler(model, params, MODALITY_INFO)

# 3 ROAR steps at sampling temperature 1.0 WITH CFG: every source of
# cross-step state (grown conditioning, RNG threading, device-resident
# token tensor) is exercised; same seed must be bitwise identical on TPU
sched = build_chained_generation_schedules(
    ["tok_rgb"], ["tok_depth"], [L], ["roar"], [3], ["linear"],
    [1.0], ["constant"], [2.0], ["constant"], cfg_grow_conditioning=True)
o1 = sampler.generate(mod_dict, sched, top_p=0.8, seed=11)
o2 = sampler.generate(mod_dict, sched, top_p=0.8, seed=11)
t1 = np.asarray(o1["tok_depth"]["tensor"])
t2 = np.asarray(o2["tok_depth"]["tensor"])
assert np.array_equal(t1, t2), (
    f"multi-step generation not deterministic: {(t1 != t2).sum()} diffs")
o3 = sampler.generate(mod_dict, sched, top_p=0.8, seed=12)
assert not np.array_equal(t1, np.asarray(o3["tok_depth"]["tensor"])), (
    "different seeds must differ at temp 1.0")
print("GEN_TPU_OK")
"""


@pytest.mark.skipif(not _tpu_available(), reason="no TPU backend")
def test_multi_step_generation_deterministic_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("XLA_FLAGS")}
    if not _tpu_reachable(env):
        pytest.skip("TPU backend present but unreachable (tunnel down)")
    proc = subprocess.run(
        [sys.executable, "-c", _CHECK], env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "GEN_TPU_OK" in proc.stdout
