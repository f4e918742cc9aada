"""RandAugment + RandomErasing for raw-pixel modalities, numpy/PIL native.

TPU-framework equivalent of the reference's timm-derived augmentation zoo
(reference: egom2p/data/rand_augment.py:42-530,
egom2p/data/random_erasing.py:27-175,
egom2p/utils/timm/{auto_augment,transforms_factory,random_erasing}.py).
In the reference these run inside `VideoMAE._aug_frame`
(egom2p/data/video_dataset.py:330-392, pdb-guarded) and the timm
transforms factory for raw-pixel image modalities; the active
pre-tokenized path never calls them, but the ~25 legacy 4M modalities
would on raw-pixel training.  This port keeps the exact op set, magnitude
->argument mappings, and config-string grammar ('rand-m9-n3-mstd0.5-inc1')
so reference training configs reproduce, while following this repo's data
conventions: numpy arrays (HWC uint8 frames, THWC video), an explicit
`np.random.Generator` instead of the global `random` state, and no torch.

Host-side preprocessing only — augmentation happens on CPU workers before
tokens reach the device, so none of this traces into XLA.
"""
from __future__ import annotations

import math
import re
from typing import List, Optional, Sequence, Union

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

_MAX_LEVEL = 10.0
_FILL = (128, 128, 128)

# PIL resampling enums moved under Image.Resampling in Pillow>=9.1
_BILINEAR = getattr(getattr(Image, "Resampling", Image), "BILINEAR")
_BICUBIC = getattr(getattr(Image, "Resampling", Image), "BICUBIC")
_AFFINE = getattr(getattr(Image, "Transform", Image), "AFFINE")
_RANDOM_INTERPOLATION = (_BILINEAR, _BICUBIC)

_HPARAMS_DEFAULT = {"translate_const": 250, "img_mean": _FILL}


# ------------------------------------------------------------------- pixel ops
# Each op: (PIL.Image, *level_args, fillcolor=, resample=) -> PIL.Image
# (reference: rand_augment.py:64-193, same PIL calls and argument ranges)

def shear_x(img, factor, fillcolor=_FILL, resample=_BILINEAR):
    return img.transform(img.size, _AFFINE, (1, factor, 0, 0, 1, 0),
                         resample=resample, fillcolor=fillcolor)


def shear_y(img, factor, fillcolor=_FILL, resample=_BILINEAR):
    return img.transform(img.size, _AFFINE, (1, 0, 0, factor, 1, 0),
                         resample=resample, fillcolor=fillcolor)


def translate_x_rel(img, pct, fillcolor=_FILL, resample=_BILINEAR):
    pixels = pct * img.size[0]
    return img.transform(img.size, _AFFINE, (1, 0, pixels, 0, 1, 0),
                         resample=resample, fillcolor=fillcolor)


def translate_y_rel(img, pct, fillcolor=_FILL, resample=_BILINEAR):
    pixels = pct * img.size[1]
    return img.transform(img.size, _AFFINE, (1, 0, 0, 0, 1, pixels),
                         resample=resample, fillcolor=fillcolor)


def translate_x_abs(img, pixels, fillcolor=_FILL, resample=_BILINEAR):
    return img.transform(img.size, _AFFINE, (1, 0, pixels, 0, 1, 0),
                         resample=resample, fillcolor=fillcolor)


def translate_y_abs(img, pixels, fillcolor=_FILL, resample=_BILINEAR):
    return img.transform(img.size, _AFFINE, (1, 0, 0, 0, 1, pixels),
                         resample=resample, fillcolor=fillcolor)


def rotate(img, degrees, fillcolor=_FILL, resample=_BILINEAR):
    return img.rotate(degrees, resample=resample, fillcolor=fillcolor)


def auto_contrast(img, **__):
    return ImageOps.autocontrast(img)


def invert(img, **__):
    return ImageOps.invert(img)


def equalize(img, **__):
    return ImageOps.equalize(img)


def solarize(img, thresh, **__):
    return ImageOps.solarize(img, thresh)


def solarize_add(img, add, thresh=128, **__):
    # (reference: rand_augment.py:158-170) additive solarize below `thresh`
    lut = [min(255, i + add) if i < thresh else i for i in range(256)]
    if img.mode in ("L", "RGB"):
        return img.point(lut * 3 if img.mode == "RGB" else lut)
    return img


def posterize(img, bits_to_keep, **__):
    if bits_to_keep >= 8:
        return img
    return ImageOps.posterize(img, bits_to_keep)


def contrast(img, factor, **__):
    return ImageEnhance.Contrast(img).enhance(factor)


def color(img, factor, **__):
    return ImageEnhance.Color(img).enhance(factor)


def brightness(img, factor, **__):
    return ImageEnhance.Brightness(img).enhance(factor)


def sharpness(img, factor, **__):
    return ImageEnhance.Sharpness(img).enhance(factor)


# ------------------------------------------------- magnitude -> argument maps
# (reference: rand_augment.py:195-278, identical ranges)

def _randomly_negate(v, rng):
    return -v if rng.random() > 0.5 else v


def _rotate_level(level, _hp, rng):
    return (_randomly_negate((level / _MAX_LEVEL) * 30.0, rng),)


def _enhance_level(level, _hp, rng):
    return ((level / _MAX_LEVEL) * 1.8 + 0.1,)


def _enhance_increasing_level(level, _hp, rng):
    return (1.0 + _randomly_negate((level / _MAX_LEVEL) * 0.9, rng),)


def _shear_level(level, _hp, rng):
    return (_randomly_negate((level / _MAX_LEVEL) * 0.3, rng),)


def _translate_abs_level(level, hp, rng):
    return (_randomly_negate(
        (level / _MAX_LEVEL) * float(hp["translate_const"]), rng),)


def _translate_rel_level(level, hp, rng):
    pct = hp.get("translate_pct", 0.45)
    return (_randomly_negate((level / _MAX_LEVEL) * pct, rng),)


def _posterize_level(level, _hp, rng):
    return (int((level / _MAX_LEVEL) * 4),)


def _posterize_increasing_level(level, hp, rng):
    return (4 - _posterize_level(level, hp, rng)[0],)


def _posterize_original_level(level, _hp, rng):
    return (int((level / _MAX_LEVEL) * 4) + 4,)


def _solarize_level(level, _hp, rng):
    return (int((level / _MAX_LEVEL) * 256),)


def _solarize_increasing_level(level, hp, rng):
    return (256 - _solarize_level(level, hp, rng)[0],)


def _solarize_add_level(level, _hp, rng):
    return (int((level / _MAX_LEVEL) * 110),)


LEVEL_TO_ARG = {
    "AutoContrast": None, "Equalize": None, "Invert": None,
    "Rotate": _rotate_level,
    "Posterize": _posterize_level,
    "PosterizeIncreasing": _posterize_increasing_level,
    "PosterizeOriginal": _posterize_original_level,
    "Solarize": _solarize_level,
    "SolarizeIncreasing": _solarize_increasing_level,
    "SolarizeAdd": _solarize_add_level,
    "Color": _enhance_level, "ColorIncreasing": _enhance_increasing_level,
    "Contrast": _enhance_level,
    "ContrastIncreasing": _enhance_increasing_level,
    "Brightness": _enhance_level,
    "BrightnessIncreasing": _enhance_increasing_level,
    "Sharpness": _enhance_level,
    "SharpnessIncreasing": _enhance_increasing_level,
    "ShearX": _shear_level, "ShearY": _shear_level,
    "TranslateX": _translate_abs_level, "TranslateY": _translate_abs_level,
    "TranslateXRel": _translate_rel_level,
    "TranslateYRel": _translate_rel_level,
}

NAME_TO_OP = {
    "AutoContrast": auto_contrast, "Equalize": equalize, "Invert": invert,
    "Rotate": rotate,
    "Posterize": posterize, "PosterizeIncreasing": posterize,
    "PosterizeOriginal": posterize,
    "Solarize": solarize, "SolarizeIncreasing": solarize,
    "SolarizeAdd": solarize_add,
    "Color": color, "ColorIncreasing": color,
    "Contrast": contrast, "ContrastIncreasing": contrast,
    "Brightness": brightness, "BrightnessIncreasing": brightness,
    "Sharpness": sharpness, "SharpnessIncreasing": sharpness,
    "ShearX": shear_x, "ShearY": shear_y,
    "TranslateX": translate_x_abs, "TranslateY": translate_y_abs,
    "TranslateXRel": translate_x_rel, "TranslateYRel": translate_y_rel,
}

_RAND_TRANSFORMS = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize", "Solarize",
    "SolarizeAdd", "Color", "Contrast", "Brightness", "Sharpness", "ShearX",
    "ShearY", "TranslateXRel", "TranslateYRel"]

_RAND_INCREASING_TRANSFORMS = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "PosterizeIncreasing",
    "SolarizeIncreasing", "SolarizeAdd", "ColorIncreasing",
    "ContrastIncreasing", "BrightnessIncreasing", "SharpnessIncreasing",
    "ShearX", "ShearY", "TranslateXRel", "TranslateYRel"]

# (reference: rand_augment.py:425-441)
_RAND_CHOICE_WEIGHTS_0 = {
    "Rotate": 0.3, "ShearX": 0.2, "ShearY": 0.2, "TranslateXRel": 0.1,
    "TranslateYRel": 0.1, "Color": 0.025, "Sharpness": 0.025,
    "AutoContrast": 0.025, "Solarize": 0.005, "SolarizeAdd": 0.005,
    "Contrast": 0.005, "Brightness": 0.005, "Equalize": 0.005,
    "Posterize": 0, "Invert": 0}


def _to_pil(frame) -> Image.Image:
    if isinstance(frame, Image.Image):
        return frame
    return Image.fromarray(np.ascontiguousarray(frame))


class AugmentOp:
    """One named op at a magnitude, applied with probability `prob` to a
    frame or a frame list — video frames share ONE parameter draw per call
    so the clip stays temporally consistent, like the reference's list path
    (reference: rand_augment.py:337-382)."""

    def __init__(self, name: str, prob: float = 0.5, magnitude: float = 10,
                 hparams: Optional[dict] = None):
        hparams = hparams or _HPARAMS_DEFAULT
        self.name = name
        self.aug_fn = NAME_TO_OP[name]
        self.level_fn = LEVEL_TO_ARG[name]
        self.prob = prob
        self.magnitude = magnitude
        self.hparams = dict(hparams)
        self.fillcolor = tuple(
            int(c) for c in hparams.get("img_mean", _FILL))
        self.resample = hparams.get("interpolation", _RANDOM_INTERPOLATION)
        self.magnitude_std = self.hparams.get("magnitude_std", 0)

    def __call__(self, frames, rng: np.random.Generator):
        if self.prob < 1.0 and rng.random() > self.prob:
            return frames
        magnitude = self.magnitude
        if self.magnitude_std and self.magnitude_std > 0:
            magnitude = rng.normal(magnitude, self.magnitude_std)
        magnitude = min(_MAX_LEVEL, max(0.0, magnitude))
        args = (self.level_fn(magnitude, self.hparams, rng)
                if self.level_fn is not None else ())
        resample = self.resample
        if isinstance(resample, (list, tuple)):
            resample = resample[rng.integers(len(resample))]
        kw = dict(fillcolor=self.fillcolor, resample=resample)
        if isinstance(frames, (list, tuple)):
            return [self.aug_fn(_to_pil(f), *args, **kw) for f in frames]
        return self.aug_fn(_to_pil(frames), *args, **kw)


class RandAugment:
    """Pick `num_layers` ops per call and apply them in sequence
    (reference: rand_augment.py:462-478).  Accepts an HWC uint8 array, a
    THWC uint8 video, or a list of frames; returns the same container type
    with uint8 numpy frames."""

    def __init__(self, ops: Sequence[AugmentOp], num_layers: int = 2,
                 choice_weights=None,
                 rng: Optional[np.random.Generator] = None):
        self.ops = list(ops)
        self.num_layers = num_layers
        self.choice_weights = choice_weights
        self.rng = rng or np.random.default_rng()

    def __call__(self, frames, rng: Optional[np.random.Generator] = None):
        rng = rng or self.rng
        video = isinstance(frames, np.ndarray) and frames.ndim == 4
        work: Union[list, np.ndarray] = (
            [f for f in frames] if video else frames)
        chosen = rng.choice(
            len(self.ops), self.num_layers,
            replace=self.choice_weights is None, p=self.choice_weights)
        for i in chosen:
            work = self.ops[int(i)](work, rng)
        if isinstance(work, list):
            out = [np.asarray(f, dtype=np.uint8) for f in work]
            return np.stack(out, 0) if video else out
        return np.asarray(work, dtype=np.uint8)


def rand_augment_ops(magnitude: float = 10, hparams: Optional[dict] = None,
                     transforms: Optional[Sequence[str]] = None):
    hparams = hparams or _HPARAMS_DEFAULT
    transforms = transforms or _RAND_TRANSFORMS
    return [AugmentOp(name, prob=0.5, magnitude=magnitude, hparams=hparams)
            for name in transforms]


def rand_augment_transform(config_str: str, hparams: Optional[dict] = None,
                           rng: Optional[np.random.Generator] = None
                           ) -> RandAugment:
    """Build RandAugment from a timm config string, e.g. 'rand-m9-n3-mstd0.5'
    or 'rand-m7-inc1' (reference: rand_augment.py:481-530; grammar:
    m=magnitude, n=num layers, w=weight index, mstd=magnitude noise std,
    inc=use severity-increasing op variants)."""
    hparams = dict(hparams or _HPARAMS_DEFAULT)
    magnitude = _MAX_LEVEL
    num_layers = 2
    weight_idx = None
    transforms = _RAND_TRANSFORMS
    config = config_str.split("-")
    if config[0] != "rand":
        raise ValueError(f"unsupported augment spec: {config_str}")
    for c in config[1:]:
        cs = re.split(r"(\d.*)", c)
        if len(cs) < 2:
            continue
        key, val = cs[:2]
        if key == "mstd":
            hparams.setdefault("magnitude_std", float(val))
        elif key == "inc":
            if bool(int(val)):
                transforms = _RAND_INCREASING_TRANSFORMS
        elif key == "m":
            magnitude = int(val)
        elif key == "n":
            num_layers = int(val)
        elif key == "w":
            weight_idx = int(val)
        else:
            raise ValueError(f"unknown RandAugment key {key!r}")
    ops = rand_augment_ops(magnitude=magnitude, hparams=hparams,
                           transforms=transforms)
    choice_weights = None
    if weight_idx is not None:
        if weight_idx != 0:
            raise ValueError("only weight set 0 exists")
        probs = np.array([_RAND_CHOICE_WEIGHTS_0[k] for k in transforms],
                         dtype=np.float64)
        choice_weights = probs / probs.sum()
    return RandAugment(ops, num_layers, choice_weights=choice_weights,
                       rng=rng)


# ----------------------------------------------------------- random erasing
class RandomErasing:
    """Erase random rectangles from a normalized image or video
    (reference: random_erasing.py:27-175; 'Random Erasing Data
    Augmentation', Zhong et al.).

    Operates on channels-LAST float arrays — (H, W, C) images or
    (T, H, W, C) video, this repo's layout — after mean/std normalization.
    Modes: 'const' zeros, 'rand' per-channel normal color, 'pixel'
    per-pixel normal noise.  For video, `cube=True` (reference default)
    erases the SAME region in every frame."""

    def __init__(self, probability: float = 0.5, min_area: float = 0.02,
                 max_area: float = 1 / 3, min_aspect: float = 0.3,
                 max_aspect: Optional[float] = None, mode: str = "const",
                 min_count: int = 1, max_count: Optional[int] = None,
                 num_splits: int = 0, cube: bool = True,
                 rng: Optional[np.random.Generator] = None):
        self.probability = probability
        self.min_area = min_area
        self.max_area = max_area
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect_ratio = (math.log(min_aspect), math.log(max_aspect))
        self.min_count = min_count
        self.max_count = max_count or min_count
        self.num_splits = num_splits
        self.cube = cube
        mode = (mode or "const").lower()
        if mode not in ("const", "rand", "pixel"):
            raise ValueError(f"unknown erase mode {mode!r}")
        self.mode = mode
        self.rng = rng or np.random.default_rng()

    def _fill(self, h: int, w: int, c: int, rng) -> np.ndarray:
        if self.mode == "pixel":
            return rng.normal(size=(h, w, c)).astype(np.float32)
        if self.mode == "rand":
            return np.broadcast_to(
                rng.normal(size=(1, 1, c)).astype(np.float32), (h, w, c))
        return np.zeros((h, w, c), np.float32)

    def _boxes(self, img_h: int, img_w: int, rng) -> List[tuple]:
        if rng.random() > self.probability:
            return []
        area = img_h * img_w
        count = (self.min_count if self.min_count == self.max_count
                 else int(rng.integers(self.min_count, self.max_count + 1)))
        boxes = []
        for _ in range(count):
            for _ in range(10):
                target = rng.uniform(self.min_area, self.max_area) * area / count
                aspect = math.exp(rng.uniform(*self.log_aspect_ratio))
                h = int(round(math.sqrt(target * aspect)))
                w = int(round(math.sqrt(target / aspect)))
                if w < img_w and h < img_h:
                    top = int(rng.integers(0, img_h - h + 1))
                    left = int(rng.integers(0, img_w - w + 1))
                    boxes.append((top, left, h, w))
                    break
        return boxes

    def __call__(self, x: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng or self.rng
        x = np.array(x, dtype=np.float32, copy=True)
        if x.ndim == 3:  # (H, W, C)
            for top, left, h, w in self._boxes(x.shape[0], x.shape[1], rng):
                x[top:top + h, left:left + w] = self._fill(h, w, x.shape[-1],
                                                           rng)
            return x
        if x.ndim != 4:
            raise ValueError(f"expected (H,W,C) or (T,H,W,C), got {x.shape}")
        t, img_h, img_w, c = x.shape
        start = t // self.num_splits if self.num_splits > 1 else 0
        if self.cube:
            for top, left, h, w in self._boxes(img_h, img_w, rng):
                fill = self._fill(h, w, c, rng)
                x[start:, top:top + h, left:left + w] = fill
        else:
            for i in range(start, t):
                for top, left, h, w in self._boxes(img_h, img_w, rng):
                    x[i, top:top + h, left:left + w] = self._fill(h, w, c,
                                                                  rng)
        return x


def create_random_augment(input_size, auto_augment: Optional[str] = None,
                          interpolation: str = "bilinear",
                          rng: Optional[np.random.Generator] = None
                          ) -> Optional[RandAugment]:
    """Video-clip RandAugment factory
    (reference: video_transforms.py:656-693): translate_const scales with
    the crop size; fill color is the ImageNet mean."""
    if not auto_augment:
        return None
    if not auto_augment.startswith("rand"):
        raise NotImplementedError(
            f"augment scheme {auto_augment!r}: only RandAugment ('rand-...') "
            "is supported; the reference's autoaugment/augmix variants are "
            "unused in every shipped config")
    if isinstance(input_size, (tuple, list)):
        size = min(input_size)
    else:
        size = int(input_size)
    hparams = {"translate_const": int(size * 0.45),
               "img_mean": tuple(int(255 * m)
                                 for m in (0.485, 0.456, 0.406)),
               "interpolation": (_BICUBIC if interpolation == "bicubic"
                                 else _RANDOM_INTERPOLATION
                                 if interpolation == "random" else _BILINEAR)}
    return rand_augment_transform(auto_augment, hparams, rng=rng)
