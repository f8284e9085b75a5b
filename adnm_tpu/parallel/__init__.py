from adnm_tpu.parallel.mesh import (
    assert_training_mesh,
    batch_sharding,
    make_mesh,
    provision_cpu_devices,
    replicated,
)
from adnm_tpu.parallel.multihost import (
    finish_multihost,
    host_barrier,
    init_multihost,
    is_multiprocess_mesh,
)
