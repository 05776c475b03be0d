"""Training CLI. Reference: gaussian_point_train.py:5-20."""
from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser("Train a Gaussian Point Cloud Scene")
    parser.add_argument("--train_config", type=str, required=True)
    parser.add_argument("--gen_template_only", action="store_true",
                        default=False)
    args = parser.parse_args()

    from taichi_3d_gaussian_splatting_tpu.training.config import (
        load_config, save_template,
    )

    if args.gen_template_only:
        save_template(args.train_config)
        return
    config = load_config(args.train_config)
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        GaussianPointCloudTrainer,
    )

    trainer = GaussianPointCloudTrainer(config)
    trainer.train()


if __name__ == "__main__":
    main()
