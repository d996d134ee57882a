from .fx_encoder import FXencoder
from .tcn import MixFXcloner, TCNModel, TCNBlock
from .blocks import BatchNorm1d, Conv1dLayer, FiLM, ResConvBlock

__all__ = [
    "FXencoder",
    "MixFXcloner",
    "TCNModel",
    "TCNBlock",
    "BatchNorm1d",
    "Conv1dLayer",
    "FiLM",
    "ResConvBlock",
]
