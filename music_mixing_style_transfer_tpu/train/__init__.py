from .checkpoint import CheckpointManager
from .contrastive import (
    fsdp_specs,
    init_contrastive,
    make_contrastive_train_step,
    make_fsdp_contrastive_step,
    make_sharded_contrastive_step,
    shard_train_state,
)
from .converter import (
    init_converter,
    make_converter_train_step,
    make_sharded_converter_step,
)
from .fused import (
    FusedContrastivePipeline,
    make_fused_contrastive_step,
    make_fused_converter_step,
    make_sharded_fused_contrastive_step,
    make_sharded_fused_converter_step,
)
from .state import TrainState, create_train_state, make_optimizer

__all__ = [
    "CheckpointManager",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "init_contrastive",
    "make_contrastive_train_step",
    "make_fsdp_contrastive_step",
    "fsdp_specs",
    "shard_train_state",
    "make_sharded_contrastive_step",
    "init_converter",
    "make_converter_train_step",
    "make_sharded_converter_step",
    "FusedContrastivePipeline",
    "make_fused_contrastive_step",
    "make_fused_converter_step",
    "make_sharded_fused_contrastive_step",
    "make_sharded_fused_converter_step",
]
