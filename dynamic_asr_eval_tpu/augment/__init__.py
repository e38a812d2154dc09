from dynamic_asr_eval_tpu.augment.spec_augment import (
    spec_augment,
    cutout,
    frame_shuffle,
    replace_with_frame,
    add_random_noise,
    apply_augmentation_pipeline,
)

__all__ = [
    "spec_augment",
    "cutout",
    "frame_shuffle",
    "replace_with_frame",
    "add_random_noise",
    "apply_augmentation_pipeline",
]
