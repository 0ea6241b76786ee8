"""Vision eval pipeline — the counterpart of image_classifiers/datasets.py +
engine.py's evaluate loop (reference flow: build ImageNet val loader, prune
with one calibration batch, report top-1; main.py:338-341).

Dataset access mirrors ptq/data.py's policy: try HF datasets (imagenet-1k
needs auth + network), else a deterministic synthetic stand-in so every code
path stays testable offline.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def synthetic_batches(num_classes: int, image_size: int, n: int = 64,
                      batch: int = 16, seed: int = 0
                      ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Class-conditional Gaussian blobs: each class has a fixed mean image,
    so a real model can score above chance and pruning deltas are visible."""
    rng = np.random.RandomState(seed)
    protos = rng.randn(num_classes, image_size, image_size, 3).astype(
        np.float32)
    for i in range(0, n, batch):
        b = min(batch, n - i)
        labels = rng.randint(0, num_classes, size=b)
        imgs = protos[labels] + 0.5 * rng.randn(b, image_size, image_size,
                                                3).astype(np.float32)
        yield imgs, labels


def imagenet_val_batches(image_size: int, batch: int = 64,
                         max_samples: Optional[int] = None):
    """HF imagenet-1k validation split -> normalized NHWC batches; None if
    the dataset is unavailable (offline)."""
    try:
        from datasets import load_dataset
        ds = load_dataset("imagenet-1k", split="validation",
                          streaming=True)
    except Exception:
        return None

    def gen():
        imgs, labels = [], []
        seen = 0
        for ex in ds:
            im = np.asarray(ex["image"].convert("RGB").resize(
                (image_size, image_size)), np.float32) / 255.0
            imgs.append((im - IMAGENET_MEAN) / IMAGENET_STD)
            labels.append(ex["label"])
            seen += 1
            if len(imgs) == batch:
                yield np.stack(imgs), np.asarray(labels)
                imgs, labels = [], []
            if max_samples is not None and seen >= max_samples:
                break
        if imgs:
            yield np.stack(imgs), np.asarray(labels)

    return gen()


def evaluate(forward: Callable, params, cfg, batches) -> dict:
    """Top-1/top-5 accuracy over an iterator of (images NHWC, labels)
    (image_classifiers/engine.py evaluate: acc1/acc5 meters)."""
    fwd = jax.jit(lambda p, x: forward(p, x, cfg))
    top1 = top5 = n = 0
    for imgs, labels in batches:
        logits = np.asarray(fwd(params, jnp.asarray(imgs)))
        rank = np.argsort(-logits, axis=-1)
        top1 += int((rank[:, 0] == labels).sum())
        top5 += int((rank[:, :5] == labels[:, None]).any(axis=1).sum())
        n += len(labels)
    return {"acc1": top1 / max(n, 1), "acc5": top5 / max(n, 1), "n": n}
