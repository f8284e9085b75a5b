from adnm_tpu.utils.profiling import profile_trace, step_timer, estimate_flops
from adnm_tpu.utils.logging import MetricsLogger
from adnm_tpu.utils.debug import enable_nan_debugging
from adnm_tpu.utils.cache import enable_compile_cache
