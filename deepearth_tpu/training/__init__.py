"""Training layer: masking, losses, metrics, trainer."""

from .losses import (
    LossWeights,
    clip_contrastive_loss,
    deepearth_loss,
    species_contrastive_loss,
)
from .masking import mae_patch_mask, mlm_token_mask, sample_masks
from .metrics import (
    MetricAccumulator,
    coordinate_error_meters,
    format_epoch_line,
    time_error_hours,
)
from .recipes import (
    create_vision_decoder_finetune_state,
    frozen_optimizer,
    make_autoencoder_step,
    make_bidirectional_step,
)
from .trainer import (
    TrainState,
    partial_load_params,
    Trainer,
    create_optimizer,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "partial_load_params",
    "create_vision_decoder_finetune_state",
    "frozen_optimizer",
    "make_autoencoder_step",
    "make_bidirectional_step",
    "LossWeights",
    "clip_contrastive_loss",
    "deepearth_loss",
    "species_contrastive_loss",
    "mae_patch_mask",
    "mlm_token_mask",
    "sample_masks",
    "MetricAccumulator",
    "coordinate_error_meters",
    "format_epoch_line",
    "time_error_hours",
    "TrainState",
    "Trainer",
    "create_optimizer",
    "make_eval_step",
    "make_train_step",
]
