from .chain import AugmentationChain, Stage
from .factory import (
    DEFAULT_APPLY_PROB,
    DEFAULT_REVERB_PROB,
    create_effects_augmentation_chain,
    create_inst_effects_augmentation_chain,
    make_instrument_manipulators,
)
from .processors import (
    AlgorithmicReverb,
    Compressor,
    ConvolutionalReverb,
    Distortion,
    Equaliser,
    Gain,
    Haas,
    MidSideImager,
    Monauralize,
    Panner,
    SwapChannels,
    rms_normalize,
)

__all__ = [
    "AugmentationChain",
    "Stage",
    "create_effects_augmentation_chain",
    "create_inst_effects_augmentation_chain",
    "make_instrument_manipulators",
    "DEFAULT_APPLY_PROB",
    "DEFAULT_REVERB_PROB",
    "AlgorithmicReverb",
    "Compressor",
    "ConvolutionalReverb",
    "Distortion",
    "Equaliser",
    "Gain",
    "Haas",
    "MidSideImager",
    "Monauralize",
    "Panner",
    "SwapChannels",
    "rms_normalize",
]
