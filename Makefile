.PHONY: test bench smoke dryrun entry warm warm-locked

SHELL := /bin/bash

# Fresh-container cache warm: run FIRST each round, in the background
# (the gitignored .jax_cache does not survive container recreation, and
# the driver's end-of-round dryrun + bench must find a warm cache to fit
# its timeout). Three steps: (1) the multichip-dryrun CPU cache, (2) the
# driver's entry() TPU graph, (3) bench.py's TPU graphs. Guarded by an
# flock so a second warm (or any caller of this target) fails fast
# instead of thrashing the single core; fails LOUDLY if the dryrun did
# not complete all 3 variants (the driver's end-of-round record must
# show 3/3).
warm:
	@flock -n .warm.lock $(MAKE) warm-locked || \
	    { echo "warm: FAILED (either .warm.lock is held by another" \
	           "compile-heavy run on this 1-core host, or a warm step" \
	           "failed — see above)"; exit 1; }

warm-locked:
	set -o pipefail; ADNM_DRYRUN_BUDGET_S=3000 python -u \
	    -c "import __graft_entry__ as g; g.dryrun_multichip(8)" \
	    2>&1 | tee /tmp/adnm_warm_dryrun.log
	@grep -q "3/3 variants OK" /tmp/adnm_warm_dryrun.log || \
	    { echo "warm: dryrun completed but NOT all 3 variants ran" \
	           "(see /tmp/adnm_warm_dryrun.log)"; exit 1; }
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
