from animate_anything_tpu.train.trainer import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_optimizer,
    make_lora_train_step,
    make_train_step,
    trainable_label_tree,
)

__all__ = [
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_lora_train_step",
    "make_train_step",
    "trainable_label_tree",
]
