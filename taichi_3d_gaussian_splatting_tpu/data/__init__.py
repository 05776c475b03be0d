from taichi_3d_gaussian_splatting_tpu.data.camera import (  # noqa: F401
    CameraDatabase,
    CameraInfo,
    CameraView,
)
from taichi_3d_gaussian_splatting_tpu.data.dataset import (  # noqa: F401
    DatasetItem,
    ImagePoseDataset,
    PrefetchLoader,
    downsample_item,
)
