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
        {"boxes": [0.1, 0.2, 0.5, 0.6], "class_name": "cat", "score": 0.9},
        {"boxes": [0.0, 0.0, 0.1, 0.1], "class_name": "dog", "score": 0.3},
    ]}
    bboxes = t.preprocess(sample)
    assert len(bboxes) == 1  # dog under threshold
    # identity crop, no flip: exact coord binning (round(x * (bins - 1)))
    aug = t.image_augment(bboxes, (0, 0, 100, 100), False, (100, 100),
                          (100, 100))
    s = t.postprocess(aug)
    assert s.startswith("v0=100 v1=200 v2=500 v3=599 cat"), s
    # flip mirrors x (asymmetric box so a no-op flip fails the assert)
    aug_f = t.image_augment(bboxes, (0, 0, 100, 100), True, (100, 100),
                            (100, 100))
    (x0, y0, x1, y1, cls, score) = aug_f[0]
    assert abs(x0 - 0.5) < 1e-9 and abs(x1 - 0.9) < 1e-9
    assert abs(y0 - 0.2) < 1e-9 and abs(y1 - 0.6) < 1e-9  # y untouched
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


# --------------------------- SAM / pose / palette transforms (round-3 port)
def test_sam_instance_transform_pipeline():
    from egom2p_tpu.data.modality_transforms import SAMInstanceTransform

    t = SAMInstanceTransform(mask_size=16, max_instance_n=4,
                             bbox_area_threshold=0.0005)
    # one big square + one tiny square (dropped by the area threshold)
    big = {"points": np.array([[[40, 40]], [[160, 40]], [[160, 160]],
                               [[40, 160]]], dtype=np.int32)}
    tiny = {"points": np.array([[[10, 10]], [[11, 10]], [[11, 11]],
                                [[10, 11]]], dtype=np.int32)}
    sample = t.preprocess(np.array([big, tiny], dtype=object))
    assert len(sample) == 2
    out = t.image_augment(sample, crop_coords=(20, 20, 180, 180), flip=False,
                          orig_size=(224, 224), target_size=(64, 64))
    assert len(out) == 1  # tiny one dropped
    post = t.postprocess(out)
    assert post["instance"].shape == (4, 16, 16)
    assert post["valid"].tolist() == [True, False, False, False]
    assert post["instance"][0].sum() > 16  # filled polygon, not empty
    y0, x0, y1, x1 = post["bbox"][0]
    assert y1 > y0 and x1 > x0


def test_sam_instance_clip_against_crop_border():
    """A polygon sticking out of the crop is clipped to the crop rectangle."""
    from egom2p_tpu.data.modality_transforms import _clip_polygon

    square = np.array([[-10, 10], [50, 10], [50, 50], [-10, 50]], np.float64)
    clipped = _clip_polygon(square, (0, 0, 40, 40))
    assert clipped is not None
    assert clipped[:, 0].min() >= 0 and clipped[:, 0].max() <= 40
    assert clipped[:, 1].min() >= 10 and clipped[:, 1].max() <= 40
    # fully outside -> dropped
    assert _clip_polygon(square + 1000, (0, 0, 40, 40)) is None


def test_human_pose_transform_string():
    from egom2p_tpu.data.modality_transforms import HumanPoseTransform

    t = HumanPoseTransform(coord_bins=1000)
    sample = {
        "bbox_xyxy": [[10.0, 20.0, 100.0, 200.0]],
        "pred_smpl_params": {
            "global_orient": [np.eye(3).reshape(1, 3, 3).tolist()[0]],
            "betas": [list(np.linspace(-1, 1, 10))],
        },
        "pose_tokenized": [np.array([5, 600, 100, 700, 1, 2, 3, 4])],
        "pred_cam": [[0.5, -0.5, 10.0]],
    }
    inst = t.preprocess(sample)
    inst = t.image_augment(inst, crop_coords=(0, 0, 224, 224), flip=False,
                           orig_size=(224, 224), target_size=(224, 224))
    s = t.postprocess(inst)
    assert s.startswith("human ")
    for kw in ("global", "pose", "shape", "camera", "v0=", "v1="):
        assert kw in s
    # pose token 600 >= 512 encodes as v1=88
    assert "v1=88" in s
    # only_pose mode returns the raw 207-vector
    tp = HumanPoseTransform(only_pose=True)
    assert tp.preprocess({}).shape == (207,)


def test_human_pose_crop_drops_outside_bbox():
    from egom2p_tpu.data.modality_transforms import HumanPoseTransform

    t = HumanPoseTransform()
    sample = {
        "bbox_xyxy": [[300.0, 300.0, 400.0, 400.0]],
        "pred_smpl_params": {"global_orient": [np.eye(3).tolist()],
                             "betas": [[0.0] * 10]},
        "pose_tokenized": [np.zeros(8)],
        "pred_cam": [[0.0, 0.0, 1.0]],
    }
    inst = t.preprocess(sample)
    out = t.image_augment(inst, crop_coords=(0, 0, 200, 200), flip=False,
                          orig_size=(448, 448), target_size=(224, 224))
    assert out == "none"
    assert t.postprocess(out) == "none"


def test_color_palette_transform():
    from egom2p_tpu.data.modality_transforms import ColorPaletteTransform

    t = ColorPaletteTransform()
    sample = [{str(k): np.arange(3 * k).reshape(k, 3).tolist()
               for k in range(1, 8)}]
    vals = t.preprocess(sample)
    assert len(vals) % 3 == 0
    s = t.postprocess(vals)
    toks = s.split()
    assert toks[0] == f"v1={len(vals) // 3}"
    assert all(tk.startswith("v0=") for tk in toks[1:])


def test_sam_instance_tok_transform_string():
    from egom2p_tpu.data.modality_transforms import SAMInstanceTokTransform

    t = SAMInstanceTokTransform(image_size=64, points_per_side=2,
                                point_order="grid")
    # reference npy layout: array of per-augmentation dicts, each holding
    # per-instance rows (points list, (n_inst, n_tok) token_ids,
    # (n_inst, 4) bbox)
    # each instance's entry holds its polygon at [0] (cv2-contour layout
    # the reference unpacks via `coords[0]`)
    aug = {
        "points": [np.array([[[0, 0]], [[64, 0]], [[64, 64]], [[0, 64]]],
                            dtype=np.float32)[None]],
        "token_ids": np.array([[3, 700]]),
        "bbox": np.array([[0.0, 0.0, 64.0, 64.0]]),
    }
    sample = t.preprocess(np.array([aug], dtype=object))
    sample = t.image_augment(sample, crop_coords=(0, 0, 64, 64), flip=False,
                             orig_size=(64, 64), target_size=(64, 64),
                             rand_aug_idx=0)
    assert isinstance(sample, dict)  # one selected augmentation
    s = t.postprocess(sample)
    assert "point" in s and "polygon" in s
    assert "v0=3" in s        # token < 512
    assert "v1=188" in s      # 700 - 512


def test_default_transforms_include_legacy_modalities():
    from egom2p_tpu.data.modality_transforms import default_modality_transforms

    m = default_modality_transforms()
    for k in ("human_poses", "color_palette", "sam_instance"):
        assert k in m
