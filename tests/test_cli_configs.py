"""CLI + shipped-config integration: every YAML parses into its entry point
and the reference's original config files also parse (key compatibility)."""
import glob
import sys

import pytest


def test_main_config_parses():
    import run_training_egom2p as T
    args = T.get_args(["--config", "cfgs/egom2p/main_mod4.yaml"])
    assert args.model == "egom2p_base_12e_12d_swiglu_nobias"
    assert args.num_input_tokens == 2048
    assert args.total_tokens == 500
    assert args.data_config == "cfgs/egom2p/data_mod4.yaml"


def test_vqvae_configs_parse():
    import run_training_vqvae as V
    cam = V.get_args(["--config", "cfgs/vqvae/cam.yaml"])
    assert cam.domain == "cam" and cam.codebook_size == 256
    assert cam.temporal_downsampling == 2
    gaze = V.get_args(["--config", "cfgs/vqvae/gaze.yaml"])
    assert gaze.domain == "gaze" and gaze.loss_fn == "mse_mask"


def test_reference_configs_accepted():
    """The reference's own YAML configs must load without error (unknown keys
    are reported and ignored, CLI-compatible keys become defaults)."""
    import run_training_egom2p as T
    ref = ("/root/reference/cfgs/default/egom2p/models/main/"
           "ego-b_mod4_500b_clariden_2048_camcv_depthdenoise.yaml")
    args = T.get_args(["--config", ref])
    assert args.model == "egom2p_base_12e_12d_swiglu_nobias"
    assert args.num_input_tokens == 2048
    assert args.blr == 0.0001

    import run_training_vqvae as V
    ref = ("/root/reference/cfgs/default/tokenization/vqvae/cam_traj/"
           "Transformer_cam_traj_256_f60_cano_norm_ds2_slr3_opencv.yaml")
    args = V.get_args(["--config", ref])
    assert args.codebook_size == 256
    assert args.temporal_downsampling == 2
    assert args.quantizer_ema_decay == 0.99


def test_data_and_alphas_configs():
    from egom2p_tpu.core.config import load_data_config, setup_sampling_mod_info
    from egom2p_tpu.data.modality_info import MODALITY_INFO
    dc = load_data_config("cfgs/egom2p/data_mod4.yaml")
    ds = dc["train"]["datasets"]["example"]
    mod_info, weights = setup_sampling_mod_info(ds, MODALITY_INFO)
    assert set(mod_info) == {"tok_rgb", "tok_depth", "tok_cam", "tok_gaze"}
    assert weights == [1.0, 1.0, 1.0, 1.0]
    assert mod_info["tok_rgb"]["input_alphas"] == [0.01, 0.1, 1.0, 10.0]

    # the reference's alphas config also loads
    ds2 = dict(ds)
    ds2["alphas_config"] = ("/root/reference/cfgs/default/egom2p/"
                            "alphas_mixture/main/mix_mod4_all2all_uni.yaml")
    mod_info2, w2 = setup_sampling_mod_info(ds2, MODALITY_INFO)
    assert mod_info2["tok_cam"]["target_alphas"] == [0.01, 0.1, 1.0, 10.0]
