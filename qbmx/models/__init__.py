from qbmx.models.dqbm import DiscQBM, DQBMParams
from qbmx.models.rbm import ClassificationRBM, RBMParams

__all__ = ["DiscQBM", "DQBMParams", "ClassificationRBM", "RBMParams"]
