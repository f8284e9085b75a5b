from adnm_tpu.mixers.attention import StandardAttention, MLA, generate_mla_config
from adnm_tpu.mixers.ssd_mixer import ADNSSDMixer
from adnm_tpu.mixers.vssd import VSSDMixer
