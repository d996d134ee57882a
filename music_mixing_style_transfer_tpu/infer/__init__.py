from .pipeline import MixingStyleTransfer, StyleTransferEngine, separate_with_demucs

__all__ = ["MixingStyleTransfer", "StyleTransferEngine", "separate_with_demucs"]
