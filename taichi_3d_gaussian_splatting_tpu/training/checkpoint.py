"""Full training-state checkpoint/resume.

The reference's only checkpoint is the scene parquet (optimizer state,
iteration counter and controller accumulators are NOT saved — SURVEY.md §5
"there is no true resume"). This module adds real resume on top of the
parquet interchange: the complete TrainState pytree (scene + both optax
states + controller accumulators) plus host metadata (iteration, RNG key,
key-cap bucket, best PSNR) round-trips through a directory of .npy leaves
+ a JSON manifest.

Leaves are saved by flattened index against the pytree structure the
trainer rebuilds from its config, which keeps the format independent of
optax's internal state classes.
"""
from __future__ import annotations

import json
import os
from typing import Any, Tuple

import numpy as np

import jax


def save_checkpoint(path: str, state: Any, metadata: dict) -> None:
    """Write state leaves + metadata under `path`, atomically.

    Leaves are written to `<path>.tmp` and swapped in with renames: a
    crash mid-save must never corrupt the previous checkpoint (leaf count
    and shapes are static across saves, so a half-overwritten directory
    would pass every load-time check and silently restore a MIXED state).
    """
    import shutil

    base = path.rstrip("/")
    tmp, old = base + ".tmp", base + ".old"
    for d in (tmp, old):
        if os.path.exists(d):
            shutil.rmtree(d)
    os.makedirs(tmp)
    leaves = jax.tree.leaves(state)
    for i, leaf in enumerate(leaves):
        np.save(os.path.join(tmp, f"leaf_{i:04d}.npy"), np.asarray(leaf))
    manifest = dict(metadata)
    manifest["num_leaves"] = len(leaves)
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    if os.path.exists(base):
        os.rename(base, old)
    os.rename(tmp, base)
    if os.path.exists(old):
        shutil.rmtree(old)


def load_checkpoint(path: str, template: Any) -> Tuple[Any, dict]:
    """Restore a state pytree with `template`'s structure, plus metadata.

    Validation raises ValueError (not assert: data checks must survive
    python -O) and covers leaf count, shape, and dtype."""
    base = path.rstrip("/")
    if not os.path.exists(base) and os.path.exists(base + ".old"):
        # crash between the two swap renames: the previous checkpoint
        # survives under .old
        base = base + ".old"
    with open(os.path.join(base, "manifest.json")) as f:
        metadata = json.load(f)
    leaves, treedef = jax.tree.flatten(template)
    if metadata["num_leaves"] != len(leaves):
        raise ValueError(
            f"checkpoint has {metadata['num_leaves']} leaves, "
            f"template needs {len(leaves)} — config/scene shape mismatch"
        )
    import jax.numpy as jnp

    restored = [
        jnp.asarray(np.load(os.path.join(base, f"leaf_{i:04d}.npy")))
        for i in range(len(leaves))
    ]
    for i, (got, want) in enumerate(zip(restored, leaves)):
        want_arr = jnp.asarray(want)
        if got.shape != want_arr.shape:
            raise ValueError(
                f"leaf {i} shape mismatch: checkpoint {got.shape} vs "
                f"template {want_arr.shape}"
            )
        if got.dtype != want_arr.dtype:
            raise ValueError(
                f"leaf {i} dtype mismatch: checkpoint {got.dtype} vs "
                f"template {want_arr.dtype}"
            )
    return jax.tree.unflatten(treedef, restored), metadata
