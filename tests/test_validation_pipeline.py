"""Real held-out validation / fixed_eval pipeline (round-1 verdict item 5:
the old "eval" recycled training batches)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tiny_args(tmp_path, extra=()):
    import run_training_egom2p as T
    argv = ["--synthetic_data", "--scaled_modalities",
            "--model", "egom2p_tiny_6e_6d_swiglu_nobias",
            "--num_input_tokens", "24", "--num_target_tokens", "24",
            "--fixed_eval_input_tokens", "16",
            "--fixed_eval_target_tokens", "16",
            "--batch_size", "2", "--accum_steps", "1",
            "--epochs", "1", "--epoch_size", "6",
            "--warmup_epochs", "0", "--eval_freq", "1", "--eval_iters", "2",
            "--save_ckpt_freq", "100",
            "--output_dir", str(tmp_path / "out")] + list(extra)
    return T.get_args(argv)


def test_val_pool_disjoint_from_train_pool(tmp_path):
    """The synthetic held-out pool must share no sample with the train pool."""
    import run_training_egom2p as T
    from egom2p_tpu.core.mesh import make_mesh

    args = _tiny_args(tmp_path)
    mesh = make_mesh()
    train_loader, _ = T.setup_data(args, mesh)
    val_factories, fixed_factories = T.setup_val_data(args, mesh)
    assert "synthetic_val" in val_factories and "synthetic_val" in fixed_factories

    def sample_sigs(batch):
        sigs = set()
        for b in range(next(iter(batch.values()))["tensor"].shape[0]):
            key = tuple(int(x) for m in sorted(batch)
                        for x in np.asarray(batch[m]["tensor"][b])[:8])
            sigs.add(key)
        return sigs

    train_sigs = set()
    it = iter(train_loader)
    for _ in range(8):
        train_sigs |= sample_sigs(next(it))
    val_sigs = set()
    vit = val_factories["synthetic_val"]()
    for _ in range(8):
        val_sigs |= sample_sigs(next(vit))
    assert train_sigs and val_sigs
    assert not (train_sigs & val_sigs), "val stream overlaps train stream"


def test_fixed_eval_batches_identical_across_epochs(tmp_path):
    """fixed_eval factories must reproduce bit-identical batches (pinned
    token budgets + pinned masking seed) on every invocation."""
    import run_training_egom2p as T
    from egom2p_tpu.core.mesh import make_mesh

    args = _tiny_args(tmp_path)
    _, fixed_factories = T.setup_val_data(args, make_mesh())
    f = fixed_factories["synthetic_val"]
    b1 = [next(f()) for _ in range(1)][0]
    b2 = [next(f()) for _ in range(1)][0]
    for m in b1:
        for k in b1[m]:
            np.testing.assert_array_equal(np.asarray(b1[m][k]),
                                          np.asarray(b2[m][k]), err_msg=(m, k))
    # pinned budgets: per-sample input totals never exceed the pinned count
    # (they may undershoot when a modality clamps at max_tokens — the
    # reference's clamp has the same behavior, masking.py:198-200)
    total_in = sum((~np.asarray(b1[m]["input_mask"])).sum(1) for m in b1)
    assert (total_in <= args.fixed_eval_input_tokens).all()
    assert total_in.max() == args.fixed_eval_input_tokens


@pytest.mark.slow
def test_training_logs_heldout_val_metrics(tmp_path):
    """One tiny epoch end-to-end: log.jsonl must contain val_* and
    fixed_eval_* entries sourced from the held-out loaders."""
    import run_training_egom2p as T

    args = _tiny_args(tmp_path)
    T.main(args)
    log = tmp_path / "out" / "log.txt"
    assert log.exists()
    records = [json.loads(l) for l in log.read_text().splitlines()]
    val_keys = {k for r in records for k in r if k.startswith("val_")}
    fixed_keys = {k for r in records for k in r
                  if k.startswith("fixed_eval_")}
    assert any("loss" in k for k in val_keys), records
    assert any("loss" in k for k in fixed_keys), records


def test_tar_val_section_builds_loaders(tmp_path):
    """A data config with a val section over held-out tar shards must build
    per-dataset val + fixed_eval loaders that stream those shards."""
    import io
    import tarfile

    import yaml

    import run_training_egom2p as T
    from egom2p_tpu.core.mesh import make_mesh

    # two tiny aligned tar shards per modality (held-out "val" shards)
    for mod, vocab in (("rgb", 64000), ("cam", 256)):
        d = tmp_path / mod
        d.mkdir()
        rng = np.random.default_rng(hash(mod) % 2**31)
        with tarfile.open(d / "shard-000000.tar", "w") as tf:
            for i in range(6):
                mt = "tok_rgb" if mod == "rgb" else "tok_cam"
                from egom2p_tpu.data.modality_info import MODALITY_INFO
                L = MODALITY_INFO[mt]["max_tokens"]
                buf = io.BytesIO()
                np.savez(buf, rng.integers(0, vocab, L).astype(np.int16))
                data = buf.getvalue()
                info = tarfile.TarInfo(f"sample{i:04d}.npz")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

    cfg = {
        "train": {"datasets": {"tiny": {
            "in_domains": "tok_rgb-tok_cam", "out_domains": "tok_rgb-tok_cam",
            "input_alphas": "1.0", "target_alphas": "1.0",
            "data_path": str(tmp_path) + "/[rgb,cam]/shard-{000000..000000}.tar",
        }}, "weights": [1.0]},
        "val": {"datasets": {"tiny": {
            "data_path": str(tmp_path) + "/[rgb,cam]/shard-{000000..000000}.tar",
        }}},
    }
    cfg_path = tmp_path / "data.yaml"
    cfg_path.write_text(yaml.dump(cfg))

    import run_training_egom2p as T
    args = T.get_args(["--data_config", str(cfg_path),
                       "--num_input_tokens", "64",
                       "--num_target_tokens", "64",
                       "--fixed_eval_input_tokens", "32",
                       "--fixed_eval_target_tokens", "32",
                       "--batch_size", "2",
                       "--output_dir", str(tmp_path / "out")])
    val_f, fixed_f = T.setup_val_data(args, make_mesh())
    assert "tiny" in val_f and "tiny" in fixed_f
    batch = next(val_f["tiny"]())
    assert set(batch) == {"tok_rgb", "tok_cam"}
    fb = next(fixed_f["tiny"]())
    total_in = sum((~np.asarray(fb[m]["input_mask"])).sum(1) for m in fb)
    # tok_cam clamps at 30 tokens; totals land in [30, 32]
    assert (total_in <= 32).all() and (total_in >= 30).all()


@pytest.mark.slow
def test_training_cli_tensor_parallel(tmp_path):
    """--tensor_parallel 2 end-to-end on the CPU mesh: the trainer builds
    the model-axis mesh, registers the shard_map flash mesh, keeps the
    stock GSPMD flash path off, and finishes a tiny epoch with finite
    losses in log.txt."""
    import run_training_egom2p as T
    import egom2p_tpu.ops.flash_attention as fa
    from egom2p_tpu.ops.attention import set_tp_flash_mesh, tp_flash_mesh

    args = _tiny_args(tmp_path, extra=["--tensor_parallel", "2"])
    try:
        T.main(args)
        assert tp_flash_mesh() is not None  # shard_map flash registered
        assert not fa.supports_flash()      # stock GSPMD flash disabled
    finally:
        set_tp_flash_mesh(None)             # don't leak into other tests
        fa.disable_flash(False)
    records = [json.loads(l)
               for l in (tmp_path / "out" / "log.txt").read_text().splitlines()]
    losses = [r["loss"] for r in records if "loss" in r]
    assert losses and all(np.isfinite(l) for l in losses), records
