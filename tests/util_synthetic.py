"""Synthetic tiny dataset helpers for integration tests (SURVEY.md §4:
'tiny synthetic dataset -> augment -> train 2 steps -> checkpoint ->
resume -> eval, on CPU backend')."""

from pathlib import Path

import numpy as np


def make_subject_tree(root: Path, *, subjects=2, per_class=3, size=32,
                      seed=0, fmt="png"):
    """Create root/<subject>/{live,spoof}/<n>.png with class-dependent
    brightness so models can actually learn."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    paths = []
    for s in range(subjects):
        for cls, bright in (("live", 0.75), ("spoof", 0.25)):
            d = root / f"subj{s}" / cls
            d.mkdir(parents=True, exist_ok=True)
            for i in range(per_class):
                arr = np.clip(
                    rng.normal(bright, 0.15, (size, size, 3)), 0, 1)
                f = d / f"{s}{i}.{fmt}"
                Image.fromarray((arr * 255).astype(np.uint8)).save(f)
                paths.append(f)
    return paths


def make_flat_tree(root: Path, *, per_class=6, size=32, seed=0, fmt="jpg"):
    """Create root/{live,spoof}/<n>.jpg (augmented-store layout)."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    for cls, bright in (("live", 0.75), ("spoof", 0.25)):
        d = root / cls
        d.mkdir(parents=True, exist_ok=True)
        for i in range(per_class):
            arr = np.clip(rng.normal(bright, 0.15, (size, size, 3)), 0, 1)
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                d / f"img{i}.{fmt}")
    return root
