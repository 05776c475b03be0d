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

    # NOTE: progressive-resolution downsampling lives in
    # data/dataset.py::downsample_item (box-average + tile crop, K scaled
    # by exactly 1/factor — cropping bottom/right rows does not change
    # focal length, so the crop must NOT be folded into the K scale).


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
