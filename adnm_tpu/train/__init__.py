from adnm_tpu.train.presets import get_preset, TrainPreset
from adnm_tpu.train.loop import Trainer, TrainState
