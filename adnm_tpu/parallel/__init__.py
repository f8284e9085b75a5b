from adnm_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
