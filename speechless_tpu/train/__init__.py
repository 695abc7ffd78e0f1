from .checkpoint import (load_opt_state, load_params, load_params_with_character_remap,
                         model_file_name, save_checkpoint)
from .trainer import (Batch, TrainState, WavBatch, init_train_state, loss_fn,
                      make_eval_step, make_lr_schedule, make_multi_step,
                      make_multi_wav_step, make_optimizer,
                      make_train_step, make_wav_train_step,
                      make_device_epoch_step)

__all__ = ["Batch", "TrainState", "make_optimizer", "init_train_state", "loss_fn",
           "make_train_step", "make_wav_train_step", "WavBatch", "make_eval_step",
           "make_multi_step", "make_multi_wav_step", "make_device_epoch_step",
           "make_lr_schedule",
           "save_checkpoint", "load_params",
           "load_opt_state", "load_params_with_character_remap", "model_file_name"]
