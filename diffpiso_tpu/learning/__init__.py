from diffpiso_tpu.learning.losses import (
    l2_field_loss,
    multistep_averaging_loss,
    spectral_energy_loss,
    strain_rate_loss,
)
from diffpiso_tpu.learning.data import (
    SequenceDataset,
    create_base_dir,
    data_path_assembler,
    resample_centered,
    resample_staggered_tensor,
)
from diffpiso_tpu.learning.reader import BatchReader, SceneDataset
from diffpiso_tpu.learning.training import (
    TrainingConfig,
    load_params,
    make_loss_fn,
    make_rollout_fn,
    make_batched_train_step,
    make_train_step,
    stack_samples,
    rollout_targets_from_tensor,
    save_params,
    training_run,
)

__all__ = [
    "l2_field_loss",
    "multistep_averaging_loss",
    "spectral_energy_loss",
    "strain_rate_loss",
    "SequenceDataset",
    "create_base_dir",
    "data_path_assembler",
    "resample_centered",
    "resample_staggered_tensor",
    "BatchReader",
    "SceneDataset",
    "TrainingConfig",
    "load_params",
    "make_loss_fn",
    "make_rollout_fn",
    "make_batched_train_step",
    "make_train_step",
    "stack_samples",
    "rollout_targets_from_tensor",
    "save_params",
    "training_run",
]
