from qbmx.train.loop import train_model
from qbmx.train.sweep import SeedParallelDQBM

__all__ = ["train_model", "SeedParallelDQBM"]
