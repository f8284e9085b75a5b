from adnm_tpu.losses.rainfall import (
    rainfall_loss,
    en_rainfall_loss,
    rain_loss,
    weighted_mse_mae,
    get_loss,
)
