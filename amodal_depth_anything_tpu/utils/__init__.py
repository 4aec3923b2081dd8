from . import (alignment, config, depth_transform, image, logging_util,
               loss, lr_schedule, metrics, seeding)

__all__ = ["alignment", "config", "depth_transform", "image", "logging_util",
           "loss", "lr_schedule", "metrics", "seeding"]
