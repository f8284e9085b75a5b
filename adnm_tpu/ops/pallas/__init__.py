from adnm_tpu.ops.pallas.ssd_scan import ssd_chunked_scan_pallas
from adnm_tpu.ops.pallas.fused_norm import gated_rms_norm_pallas, rms_norm_pallas
