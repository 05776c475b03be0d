"""Scene model robustness: init edge cases, interchange format guards.

Regressions for NaN-poisoning inputs the reference tolerates by luck:
pure-black point colors, tiny point clouds (cKDTree inf fill), sky-sphere
injection on an already-trained parquet, and malformed PLY headers.
"""
import numpy as np
import jax.numpy as jnp
import pandas as pd
import pytest

from taichi_3d_gaussian_splatting_tpu.models import scene as scene_lib
from taichi_3d_gaussian_splatting_tpu.models.scene import (
    FEATURE_COLUMNS, SceneConfig,
)


def write_raw_parquet(path, n=32, seed=0, black=False):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3))
    rgb = np.zeros((n, 3)) if black else rng.uniform(0, 255, (n, 3))
    pd.DataFrame({
        "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
        "r": rgb[:, 0], "g": rgb[:, 1], "b": rgb[:, 2],
    }).to_parquet(path)


class TestSceneInit:
    def test_black_colors_give_finite_features(self, tmp_path):
        p = tmp_path / "pc.parquet"
        write_raw_parquet(p, black=True)
        sc = scene_lib.from_parquet(str(p))
        assert np.isfinite(np.asarray(sc.features)).all()

    def test_tiny_point_cloud(self, tmp_path):
        """cKDTree fills absent neighbors (n < 4) with inf distances."""
        p = tmp_path / "pc.parquet"
        write_raw_parquet(p, n=2)
        sc = scene_lib.from_parquet(str(p))
        assert np.isfinite(np.asarray(sc.features)).all()

    def test_add_sphere_on_trained_parquet(self, tmp_path):
        """Sphere rows appended to a trained parquet carry no feature
        columns — they must get fresh init, not NaN valid rows."""
        raw = tmp_path / "raw.parquet"
        write_raw_parquet(raw)
        sc = scene_lib.from_parquet(str(raw))
        trained = tmp_path / "trained.parquet"
        scene_lib.to_parquet(sc, str(trained))
        sc2 = scene_lib.from_parquet(
            str(trained),
            SceneConfig(add_sphere=True, num_points_sphere=64),
        )
        assert sc2.capacity == sc.capacity + 64
        assert np.isfinite(np.asarray(sc2.features)).all()

    def test_parquet_ply_roundtrip(self, tmp_path):
        raw = tmp_path / "raw.parquet"
        write_raw_parquet(raw)
        sc = scene_lib.from_parquet(str(raw))
        ply = tmp_path / "s.ply"
        scene_lib.to_ply(sc, str(ply))
        sc2 = scene_lib.from_ply(str(ply))
        np.testing.assert_allclose(np.asarray(sc2.xyz), np.asarray(sc.xyz),
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sc2.features), np.asarray(sc.features), atol=1e-6)

    def test_from_ply_rejects_non_float_property(self, tmp_path):
        p = tmp_path / "bad.ply"
        header = "\n".join([
            "ply", "format binary_little_endian 1.0",
            "element vertex 1",
            "property float x", "property float y", "property float z",
            "property uchar red",
            "end_header", "",
        ])
        with open(p, "wb") as f:
            f.write(header.encode("ascii"))
            f.write(np.zeros(3, "<f4").tobytes() + b"\x00")
        with pytest.raises(ValueError, match="non-float"):
            scene_lib.from_ply(str(p))
