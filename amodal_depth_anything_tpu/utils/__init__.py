from . import (alignment, config, depth_transform, image, logging_util,
               loss, lr_schedule, metrics, multi_res_noise, profiling,
               seeding, slurm_util, stats)

__all__ = ["alignment", "config", "depth_transform", "image", "logging_util",
           "loss", "lr_schedule", "metrics", "multi_res_noise", "profiling",
           "seeding", "slurm_util", "stats"]
