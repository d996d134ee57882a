from .pipeline import MixingStyleTransfer, StyleTransferEngine, separate_with_demucs
from .seqpar import convert_seq_parallel, make_seq_parallel_converter

__all__ = [
    "MixingStyleTransfer",
    "StyleTransferEngine",
    "separate_with_demucs",
    "convert_seq_parallel",
    "make_seq_parallel_converter",
]
