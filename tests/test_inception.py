"""Structural tests for the JAX InceptionV3 graph (core/inception_v3.py).

Without network egress the pretrained torchvision weights cannot be
fetched, so these tests validate the graph's channel bookkeeping instead:
random weights with the exact published torchvision inception_v3 state-dict
shapes must flow through every branch concat and produce (B, 2048) pool3
features + (B, 1000) logits.  Any mis-wired branch width fails the conv or
concat immediately.
"""
import numpy as np
import pytest


def _conv_specs():
    """(name, out_ch, in_ch, kh, kw) for every BasicConv2d in torchvision
    inception_v3 (aux head excluded)."""
    specs = [
        ("Conv2d_1a_3x3", 32, 3, 3, 3),
        ("Conv2d_2a_3x3", 32, 32, 3, 3),
        ("Conv2d_2b_3x3", 64, 32, 3, 3),
        ("Conv2d_3b_1x1", 80, 64, 1, 1),
        ("Conv2d_4a_3x3", 192, 80, 3, 3),
    ]

    def inception_a(name, cin, pool):
        return [(f"{name}.branch1x1", 64, cin, 1, 1),
                (f"{name}.branch5x5_1", 48, cin, 1, 1),
                (f"{name}.branch5x5_2", 64, 48, 5, 5),
                (f"{name}.branch3x3dbl_1", 64, cin, 1, 1),
                (f"{name}.branch3x3dbl_2", 96, 64, 3, 3),
                (f"{name}.branch3x3dbl_3", 96, 96, 3, 3),
                (f"{name}.branch_pool", pool, cin, 1, 1)]

    def inception_b(name, cin):
        return [(f"{name}.branch3x3", 384, cin, 3, 3),
                (f"{name}.branch3x3dbl_1", 64, cin, 1, 1),
                (f"{name}.branch3x3dbl_2", 96, 64, 3, 3),
                (f"{name}.branch3x3dbl_3", 96, 96, 3, 3)]

    def inception_c(name, cin, c7):
        return [(f"{name}.branch1x1", 192, cin, 1, 1),
                (f"{name}.branch7x7_1", c7, cin, 1, 1),
                (f"{name}.branch7x7_2", c7, c7, 1, 7),
                (f"{name}.branch7x7_3", 192, c7, 7, 1),
                (f"{name}.branch7x7dbl_1", c7, cin, 1, 1),
                (f"{name}.branch7x7dbl_2", c7, c7, 7, 1),
                (f"{name}.branch7x7dbl_3", c7, c7, 1, 7),
                (f"{name}.branch7x7dbl_4", c7, c7, 7, 1),
                (f"{name}.branch7x7dbl_5", 192, c7, 1, 7),
                (f"{name}.branch_pool", 192, cin, 1, 1)]

    def inception_d(name, cin):
        return [(f"{name}.branch3x3_1", 192, cin, 1, 1),
                (f"{name}.branch3x3_2", 320, 192, 3, 3),
                (f"{name}.branch7x7x3_1", 192, cin, 1, 1),
                (f"{name}.branch7x7x3_2", 192, 192, 1, 7),
                (f"{name}.branch7x7x3_3", 192, 192, 7, 1),
                (f"{name}.branch7x7x3_4", 192, 192, 3, 3)]

    def inception_e(name, cin):
        return [(f"{name}.branch1x1", 320, cin, 1, 1),
                (f"{name}.branch3x3_1", 384, cin, 1, 1),
                (f"{name}.branch3x3_2a", 384, 384, 1, 3),
                (f"{name}.branch3x3_2b", 384, 384, 3, 1),
                (f"{name}.branch3x3dbl_1", 448, cin, 1, 1),
                (f"{name}.branch3x3dbl_2", 384, 448, 3, 3),
                (f"{name}.branch3x3dbl_3a", 384, 384, 1, 3),
                (f"{name}.branch3x3dbl_3b", 384, 384, 3, 1),
                (f"{name}.branch_pool", 192, cin, 1, 1)]

    specs += inception_a("Mixed_5b", 192, 32)   # -> 256
    specs += inception_a("Mixed_5c", 256, 64)   # -> 288
    specs += inception_a("Mixed_5d", 288, 64)   # -> 288
    specs += inception_b("Mixed_6a", 288)       # -> 768
    for name, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160),
                     ("Mixed_6d", 160), ("Mixed_6e", 192)):
        specs += inception_c(name, 768, c7)     # -> 768
    specs += inception_d("Mixed_7a", 768)       # -> 1280
    specs += inception_e("Mixed_7b", 1280)      # -> 2048
    specs += inception_e("Mixed_7c", 2048)      # -> 2048
    return specs


def _random_weights(rng, n_classes=1000):
    w = {}
    for name, o, i, kh, kw in _conv_specs():
        w[f"{name}.conv.weight"] = rng.normal(
            0, 0.05, (o, i, kh, kw)).astype(np.float32)
        w[f"{name}.bn.weight"] = np.ones(o, np.float32)
        w[f"{name}.bn.bias"] = np.zeros(o, np.float32)
        w[f"{name}.bn.running_mean"] = np.zeros(o, np.float32)
        w[f"{name}.bn.running_var"] = np.ones(o, np.float32)
    w["fc.weight"] = rng.normal(0, 0.01, (n_classes, 2048)).astype(np.float32)
    w["fc.bias"] = np.zeros(n_classes, np.float32)
    return w


@pytest.mark.slow
def test_inception_fid_variant():
    """pt_inception-style weights (1008-class fc) select the pytorch-fid
    graph semantics and differ from the torchvision graph."""
    from egom2p_tpu.core.inception_v3 import (detect_variant,
                                              inception_v3_forward)

    rng = np.random.default_rng(2)
    w = _random_weights(rng, n_classes=1008)
    assert detect_variant(w) == "fid"
    imgs = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    feats, logits = inception_v3_forward(imgs, w)
    assert feats.shape == (2, 2048) and logits.shape == (2, 1008)
    # same weights forced through the torchvision semantics give different
    # features (exclude-pad pools + 2x-1 input vs imagenet stats)
    feats_tv, _ = inception_v3_forward(imgs, w, variant="torchvision")
    assert not np.allclose(np.asarray(feats), np.asarray(feats_tv))


@pytest.mark.slow
def test_inception_graph_shapes_and_metrics(tmp_path, monkeypatch):
    from egom2p_tpu.core.inception_v3 import (inception_v3_forward,
                                              make_inception_fns)

    rng = np.random.default_rng(0)
    w = _random_weights(rng)
    imgs = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    feats, logits = inception_v3_forward(imgs, w)
    assert feats.shape == (4, 2048)
    assert logits.shape == (4, 1000)
    assert np.isfinite(np.asarray(feats)).all()

    feature_fn, probs_fn, run = make_inception_fns(w, batch=2)
    f = feature_fn(imgs)
    np.testing.assert_allclose(f, np.asarray(feats), rtol=2e-4, atol=2e-4)
    p = probs_fn(imgs)
    np.testing.assert_allclose(p.sum(1), 1.0, rtol=1e-5)

    # end-to-end through the weight-gated metric makers
    import egom2p_tpu.core.image_metrics as IM
    ckpt = tmp_path / "inception_v3.npz"
    np.savez(ckpt, **w)
    monkeypatch.setattr(IM, "_CKPT_DIR", str(tmp_path))
    fid = IM.make_fid()
    fid.update(imgs, real=True)
    fid.update(np.clip(imgs + rng.normal(0, 0.1, imgs.shape), 0, 1)
               .astype(np.float32), real=False)
    assert np.isfinite(fid.compute())
    assert IM.make_inception_score()(imgs) >= 1.0  # IS lower bound


@pytest.mark.slow
def test_inception_pth_converter(tmp_path):
    import torch

    from egom2p_tpu.core.inception_v3 import convert_inception_pth

    rng = np.random.default_rng(1)
    w = _random_weights(rng)
    sd = {k: torch.from_numpy(v) for k, v in w.items()}
    sd["AuxLogits.fc.weight"] = torch.zeros(1000, 768)  # must be dropped
    sd["Mixed_5b.branch1x1.bn.num_batches_tracked"] = torch.zeros((), dtype=torch.long)
    pth = str(tmp_path / "inception.pth")
    torch.save(sd, pth)
    out = convert_inception_pth(pth, str(tmp_path / "inception_v3.npz"))
    loaded = dict(np.load(out))
    assert "AuxLogits.fc.weight" not in loaded
    assert not any("num_batches" in k for k in loaded)
    np.testing.assert_array_equal(loaded["fc.weight"], w["fc.weight"])
