from adnm_tpu.ops.ssd import (
    linear_attn_dual,
    ssd_chunked_scan,
    ssd_naive_scan,
    ssd_state_update,
)
