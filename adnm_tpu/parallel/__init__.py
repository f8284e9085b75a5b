from adnm_tpu.parallel.mesh import (
    assert_training_mesh,
    batch_sharding,
    make_mesh,
    provision_cpu_devices,
    replicated,
)
