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
    """Write state leaves + metadata under `path` (created/overwritten)."""
    os.makedirs(path, exist_ok=True)
    leaves = jax.tree.leaves(state)
    for i, leaf in enumerate(leaves):
        np.save(os.path.join(path, f"leaf_{i:04d}.npy"), np.asarray(leaf))
    manifest = dict(metadata)
    manifest["num_leaves"] = len(leaves)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def load_checkpoint(path: str, template: Any) -> Tuple[Any, dict]:
    """Restore a state pytree with `template`'s structure, plus metadata."""
    with open(os.path.join(path, "manifest.json")) as f:
        metadata = json.load(f)
    leaves, treedef = jax.tree.flatten(template)
    assert metadata["num_leaves"] == len(leaves), (
        f"checkpoint has {metadata['num_leaves']} leaves, "
        f"template needs {len(leaves)} — config/scene shape mismatch"
    )
    import jax.numpy as jnp

    restored = [
        jnp.asarray(np.load(os.path.join(path, f"leaf_{i:04d}.npy")))
        for i in range(len(leaves))
    ]
    for got, want in zip(restored, leaves):
        assert got.shape == jnp.shape(want), (
            f"leaf shape mismatch: checkpoint {got.shape} vs "
            f"template {jnp.shape(want)}"
        )
    return jax.tree.unflatten(treedef, restored), metadata
