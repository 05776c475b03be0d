"""Camera metadata dataclasses.

Behavioral reference: taichi_3d_gaussian_splatting/Camera.py:6-40.
Camera frame: x right, y down, z forward (Camera.py:17,
docs/RawDataFormat.md:100). Arrays are numpy here (host side); they cross
into jnp at the trainer boundary.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np


@dataclass
class CameraInfo:
    camera_intrinsics: np.ndarray  # (3, 3)
    camera_height: int
    camera_width: int
    camera_id: int

    def downsample(self, factor: float, multiple: int) -> "CameraInfo":
        """Scaled intrinsics + dimensions cropped to a multiple (trainer's
        progressive-resolution path, GaussianPointTrainer.py:102-121)."""
        if factor == 1:
            return self
        h = int(self.camera_height / factor)
        w = int(self.camera_width / factor)
        h -= h % multiple
        w -= w % multiple
        k = self.camera_intrinsics.copy()
        k[0, :] *= w / self.camera_width
        k[1, :] *= h / self.camera_height
        return CameraInfo(k, h, w, self.camera_id)


@dataclass
class CameraView:
    """Reference Camera.py:14-22."""

    camera_view_id: int
    T_pointcloud_camera: np.ndarray  # (4, 4) camera->pointcloud frame
    camera_id: int
    image_id: int
    timestamp: Optional[int] = None


class CameraDatabase:
    """Reference Camera.py:25-40."""

    def __init__(self):
        self.camera_info_dict: Dict[int, CameraInfo] = {}
        self.camera_view_dict: Dict[int, CameraView] = {}

    def add_camera_info(self, camera_info: CameraInfo) -> None:
        self.camera_info_dict[camera_info.camera_id] = camera_info

    def get_camera_info(self, camera_id: int) -> CameraInfo:
        return self.camera_info_dict[camera_id]

    def add_camera_view(self, camera_view: CameraView) -> None:
        self.camera_view_dict[camera_view.camera_view_id] = camera_view

    def get_camera_view_and_info(
        self, camera_view_id: int
    ) -> Tuple[CameraView, CameraInfo]:
        view = self.camera_view_dict[camera_view_id]
        return view, self.camera_info_dict[view.camera_id]
