"""Transform/augmentation zoo tests
(reference: egom2p/data/modality_transforms.py, image_augmenter.py)."""
import json
import random

import numpy as np
import pytest

from egom2p_tpu.data.modality_transforms import (
    CaptionEmbTransform, CaptionTransform, CenterCropImageAugmenter,
    DepthTransform, DetectionTransform, MaskTransform, MetadataTransform,
    NormalTransform, PaddingImageAugmenter, PreTokenizedImageAugmenter,
    RandomCropImageAugmenter, RGBTransform, ScaleJitteringImageAugmenter,
    SemsegTransform, TokTransform, UnifiedDataTransform,
    default_modality_transforms, get_transform_key,
    get_transform_resolution, image_crop_and_resize)


def test_transform_key_and_resolution():
    assert get_transform_key("rgb@448") == "rgb"
    assert get_transform_key("tok_rgb") == "tok_rgb"
    assert get_transform_resolution("rgb@448", 224) == (448, 448)
    assert get_transform_resolution("rgb", 224) == (224, 224)


def test_crop_and_resize_out_of_bounds_pads():
    img = np.full((10, 10, 3), 200, np.uint8)
    out = image_crop_and_resize(img, (-5, -5, 20, 20), (20, 20), "nearest")
    assert out.shape == (20, 20, 3)
    assert out[0, 0, 0] == 0 and out[10, 10, 0] == 200


def test_rgb_transform_pipeline():
    t = RGBTransform(imagenet_default_mean_and_std=True)
    img = np.random.RandomState(0).randint(0, 255, (48, 64, 3), np.uint8)
    pre = t.preprocess(img)
    aug = t.image_augment(pre, (8, 8, 32, 32), True, (48, 64), (16, 16), None)
    out = t.postprocess(aug)
    assert out.shape == (16, 16, 3) and out.dtype == np.float32
    # imagenet normalization: mid-gray maps near zero
    gray = t.postprocess(np.full((4, 4, 3), 124, np.uint8))
    assert abs(float(gray.mean())) < 1.0


def test_depth_standardization():
    d = np.random.RandomState(1).uniform(0, 2 ** 16 - 1, (32, 32)).astype(
        np.float32)
    out = DepthTransform(standardize_depth=True).postprocess(d)
    assert out.shape == (32, 32, 1)
    assert abs(float(out.mean())) < 0.5 and 0.3 < float(out.std()) < 3.0


def test_normal_flip_negates_x():
    t = NormalTransform()
    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 0] = 100
    flipped = t.image_augment(img, (0, 0, 8, 8), True, (8, 8), (8, 8), None)
    assert flipped[0, 0, 0] == 155  # 255 - 100


def test_semseg_nearest_and_shift():
    t = SemsegTransform(shift_idx_by_one=True)
    img = np.array([[0, 1], [2, 3]], np.uint8)
    pre = t.preprocess(img)
    assert pre.min() == 1 and pre.max() == 4
    out = t.postprocess(t.image_augment(pre, (0, 0, 2, 2), False, (2, 2),
                                        (4, 4), None))
    assert out.dtype == np.int64 and set(np.unique(out)) == {1, 2, 3, 4}


def test_mask_min_pool():
    t = MaskTransform(mask_pool_size=2)
    m = np.ones((4, 4), np.float32)
    m[0, 0] = 0.0
    out = t.postprocess(m * 255)
    assert out.dtype == bool
    assert not out[:2, :2].any()      # pool block with a zero goes False
    assert out[2:, 2:].all()


def test_tok_transform_requires_crop_index():
    t = TokTransform()
    v = np.arange(12).reshape(3, 4)  # 3 crop settings
    with pytest.raises(ValueError):
        t.image_augment(v, None, False, None, None, rand_aug_idx=None)
    out = t.image_augment(v, None, False, None, None, rand_aug_idx=2)
    assert np.array_equal(out, v[2])


def test_detection_transform_crop_flip_string():
    t = DetectionTransform(det_threshold=0.5, coord_bins=1000,
                           bbox_order="dist_to_orig")
    sample = {"instances": [
        {"boxes": [0.25, 0.25, 0.75, 0.75], "class_name": "cat", "score": 0.9},
        {"boxes": [0.0, 0.0, 0.1, 0.1], "class_name": "dog", "score": 0.3},
    ]}
    bboxes = t.preprocess(sample)
    assert len(bboxes) == 1  # dog under threshold
    # identity crop, no flip
    aug = t.image_augment(bboxes, (0, 0, 100, 100), False, (100, 100),
                          (100, 100))
    s = t.postprocess(aug)
    assert s.startswith("v0=250 v1=250 v2=749 v3=749 cat") or "cat" in s
    # flip mirrors x
    aug_f = t.image_augment(bboxes, (0, 0, 100, 100), True, (100, 100),
                            (100, 100))
    (x0, y0, x1, y1, cls, score) = aug_f[0]
    assert abs(x0 - 0.25) < 1e-9 and abs(x1 - 0.75) < 1e-9  # symmetric box
    # crop removing the box drops it
    assert t.image_augment(bboxes, (90, 90, 10, 10), False, (100, 100),
                           (10, 10)) == []


def test_caption_transforms(tmp_path):
    t = CaptionTransform(aligned_captions=True)
    p = tmp_path / "cap.json"
    p.write_text(json.dumps(["first", "second", "third"]))
    caps = t.load(str(p))
    assert t.image_augment(caps, None, False, None, None,
                           rand_aug_idx=1) == "second"
    e = CaptionEmbTransform()
    np.savez(tmp_path / "emb.npz", emb=np.ones((2, 5, 8), np.float32),
             mask_valid=np.array([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]]))
    v = e.load(str(tmp_path / "emb.npz"))
    out = e.postprocess(e.image_augment(v, None, False, None, None,
                                        rand_aug_idx=0))
    assert out["tensor"].shape == (3, 8)


def test_metadata_transform():
    t = MetadataTransform(shuffle=False)
    s = t.postprocess(t.preprocess({"num_objects": 12, "is_indoor": True}))
    assert "num_objects=12" in s and "is_indoor=1" in s


def test_augmenters_geometry():
    random.seed(0)
    np.random.seed(0)
    img = np.zeros((100, 80, 3), np.uint8)
    md = {"rgb": img}
    for aug in (RandomCropImageAugmenter(target_size=32, main_domain="rgb"),
                ScaleJitteringImageAugmenter(target_size=32,
                                             main_domain="rgb")):
        crop, flip, orig, tgt, idx = aug(md, None)
        assert orig == (100, 80) and tgt == (32, 32) and idx is None
        top, left, h, w = crop
        assert h > 0 and w > 0
    crop, _, _, _, _ = CenterCropImageAugmenter(32, main_domain="rgb")(md)
    assert crop == ((100 - 80) // 2, 0, 80, 80)
    crop, _, _, _, _ = PaddingImageAugmenter(32, main_domain="rgb")(md, None)
    assert crop == (0, 0, 100, 100)
    settings = np.array([[0, 0, 50, 50, 0], [10, 10, 40, 40, 1]])
    crop, flip, _, _, idx = PreTokenizedImageAugmenter(
        32, no_aug=False, main_domain="tok_rgb")({"tok_rgb": None}, settings)
    assert idx in (0, 1) and crop == tuple(settings[idx][:4])


def test_unified_data_transform_end_to_end():
    """Aligned rgb + tok + caption sample through the full 4-stage pipeline
    with a pre-tokenized augmenter (the reference training layout)."""
    random.seed(1)
    np.random.seed(1)
    transforms = default_modality_transforms()
    augmenter = PreTokenizedImageAugmenter(target_size=32, no_aug=False,
                                           main_domain="rgb")
    udt = UnifiedDataTransform(transforms, augmenter)
    sample = {
        "rgb": np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8),
        "tok_rgb": np.arange(2 * 16).reshape(2, 16),
        "caption": ["cap for crop0", "cap for crop1"],
        "crop_settings": np.array([[0, 0, 64, 64, 0], [8, 8, 48, 48, 1]]),
    }
    out = udt(dict(sample))
    assert out["rgb"].shape == (32, 32, 3) and out["rgb"].dtype == np.float32
    assert out["tok_rgb"].shape == (16,)
    idx = 0 if out["caption"].endswith("crop0") else 1
    assert np.array_equal(out["tok_rgb"], sample["tok_rgb"][idx])
    # augment=False reproduces the reference's shipped tensor-only path
    plain = UnifiedDataTransform(transforms, augmenter, augment=False)(
        {"tok_rgb": np.ones(4)})
    assert np.array_equal(plain["tok_rgb"], np.ones(4))
