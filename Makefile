.PHONY: test bench smoke dryrun entry warm

# Fresh-container cache warm: run FIRST each round, in the background
# (the gitignored .jax_cache does not survive container recreation, and
# the driver's end-of-round dryrun + bench must find a warm cache to fit
# its timeout). Serialized: this host has ONE core.
warm:
	ADNM_DRYRUN_BUDGET_S=3000 python -u \
	    -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
	$(MAKE) entry
	python bench.py

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

# end-to-end smoke on synthetic data (no shanghai.h5 required)
smoke:
	python -m adnm_tpu.cli.train --model ADNMUnet --synthetic --img-size 64 \
	    --synthetic-len 16 --batch-size 2 --epochs 2 --root runs

# multi-chip dry run on a virtual 8-device CPU mesh
dryrun:
	env -u PYTHONPATH JAX_PLATFORMS=cpu \
	    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

entry:
	python -c "import jax, __graft_entry__ as g; fn, a = g.entry(); \
	    print(jax.jit(fn)(*a).shape)"
