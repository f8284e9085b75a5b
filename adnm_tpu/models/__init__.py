from adnm_tpu.models.registry import create_model, MODEL_NAMES
