from adnm_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    provision_cpu_devices,
    replicated,
)
