"""Sky / dynamic mask extraction with SegFormer (cityscapes semantics).

Counterpart of the reference's datasets/tools/extract_masks.py:91-155: runs
SegFormer-b5 (cityscapes fine-tuned) over every processed image and writes
`sky_masks/{name}.png` (class 10 = sky) and optionally semantic dynamic
masks. The checkpoint is an external download
("nvidia/segformer-b5-finetuned-cityscapes-1024-1024"); when transformers
or the weights are unavailable this module degrades to a clear error rather
than silently skipping — the trainer itself runs without sky masks (the
sky-opacity BCE is simply dropped by the loss when masks are absent).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

CITYSCAPES_SKY = 10
# cityscapes train ids considered dynamic (person, rider, car, truck, bus,
# train, motorcycle, bicycle) — extract_masks.py:118-127
CITYSCAPES_DYNAMIC = (11, 12, 13, 14, 15, 16, 17, 18)
DEFAULT_CHECKPOINT = "nvidia/segformer-b5-finetuned-cityscapes-1024-1024"


def load_segmenter(checkpoint: str = DEFAULT_CHECKPOINT,
                   local_only: bool = True):
    """(model, processor) or raises with an actionable message."""
    try:
        from transformers import (AutoImageProcessor,
                                  SegformerForSemanticSegmentation)
    except ImportError as e:
        raise RuntimeError(
            "mask extraction needs `transformers` (pip install transformers)"
        ) from e
    try:
        proc = AutoImageProcessor.from_pretrained(
            checkpoint, local_files_only=local_only)
        model = SegformerForSemanticSegmentation.from_pretrained(
            checkpoint, local_files_only=local_only)
    except Exception as e:
        raise RuntimeError(
            f"SegFormer checkpoint '{checkpoint}' not available locally; "
            "download it once with network access (local_only=False) or "
            "pass --checkpoint pointing at a local copy") from e
    model.eval()
    return model, proc


def segment_image(model, proc, image: np.ndarray) -> np.ndarray:
    """uint8 (H, W, 3) -> (H, W) int32 cityscapes train-id map."""
    import torch

    inputs = proc(images=image, return_tensors="pt")
    with torch.no_grad():
        logits = model(**inputs).logits
    up = torch.nn.functional.interpolate(
        logits, size=image.shape[:2], mode="bilinear", align_corners=False)
    return up.argmax(1)[0].numpy().astype(np.int32)


def extract_scene_masks(scene_dir: str,
                        checkpoint: str = DEFAULT_CHECKPOINT,
                        write_dynamic: bool = False,
                        model_proc: Optional[tuple] = None) -> int:
    """Write sky_masks/ (and optionally seg_dynamic_masks/) for every image
    in a processed scene dir. Returns the number of images processed."""
    from PIL import Image

    model, proc = model_proc or load_segmenter(checkpoint)
    img_dir = os.path.join(scene_dir, "images")
    sky_dir = os.path.join(scene_dir, "sky_masks")
    os.makedirs(sky_dir, exist_ok=True)
    dyn_dir = os.path.join(scene_dir, "seg_dynamic_masks")
    if write_dynamic:
        os.makedirs(dyn_dir, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(img_dir)):
        stem = os.path.splitext(name)[0]
        img = np.asarray(Image.open(os.path.join(img_dir, name)).convert(
            "RGB"))
        seg = segment_image(model, proc, img)
        sky = (seg == CITYSCAPES_SKY).astype(np.uint8) * 255
        Image.fromarray(sky).save(os.path.join(sky_dir, f"{stem}.png"))
        if write_dynamic:
            dyn = np.isin(seg, CITYSCAPES_DYNAMIC).astype(np.uint8) * 255
            Image.fromarray(dyn).save(os.path.join(dyn_dir, f"{stem}.png"))
        count += 1
    return count
