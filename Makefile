# Developer entry points. CPU work must disable the axon TPU hook
# (see CLAUDE.md); only one TPU process may run at a time.
CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test bench dryrun native profile clean

test:
	$(CPU_ENV) python -m pytest tests/ -q

dryrun:
	PALLAS_AXON_POOL_IPS= python __graft_entry__.py

bench:
	python bench.py

profile:
	python tools/tpu_profile.py

native:
	sh native/build.sh

clean:
	rm -rf results samples .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +

tune:
	python tools/tpu_tune.py

bench-suite:
	python tools/bench_suite.py

pipeline-profile:
	python tools/pipeline_profile.py --train-dir $(TRAIN_DIR)
