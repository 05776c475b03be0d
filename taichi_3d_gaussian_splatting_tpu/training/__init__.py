from taichi_3d_gaussian_splatting_tpu.training.config import (  # noqa: F401
    TrainConfig,
    load_config,
    save_template,
)
from taichi_3d_gaussian_splatting_tpu.training.loss import (  # noqa: F401
    LossConfig,
    compute_loss,
    psnr,
    ssim,
)
from taichi_3d_gaussian_splatting_tpu.training.trainer import (  # noqa: F401
    GaussianPointCloudTrainer,
)
