# Example launchers — mirrors the reference Makefile targets (Makefile:1-11)

N_ITERS ?= 1000

# gpx is run from the source tree (no install step) — put it on the path
# for every target so `make ...` works from a clean shell.
export PYTHONPATH := $(CURDIR):$(PYTHONPATH)

simulated:
	python examples/simulated_gp.py simulate
	python examples/simulated_gp.py fit
	python examples/simulated_gp.py parameters $(N_ITERS)

hmc_simulated:
	python examples/simulated_gp.py hmc $(N_ITERS)

posterior_predictive:
	python examples/simulated_gp.py posterior-predictive $(N_ITERS)

fit_temp_gp:
	python examples/temperature.py $(N_ITERS)

krig_temperature:
	python examples/temperature_kriging.py

fit_temp_dlm:
	python examples/temperature_dlm.py $(N_ITERS)

forecast_temperature_dlm:
	python examples/temperature_dlm.py $(N_ITERS) --forecast 48

fit_dlm_gp:
	python examples/dlm_gp.py $(N_ITERS)

icm_temperature:
	python examples/temperature_icm.py $(N_ITERS)

mnist:
	python examples/mnist_classify.py

large_n:
	python examples/large_n.py dense
	python examples/large_n.py iterative
	python examples/large_n.py svgp

# regenerate the checked-in golden figures (docs/figures/*.png) on CPU
figures:
	python scripts/make_figures.py

# render docs/*.md into the static microsite under site/ (the reference
# publishes the same deliverable via scripts/publishMicrosite.sh)
site:
	python scripts/build_site.py

test:
	python -m pytest tests/ -q

# compiled-mode Pallas regression tests on the real chip (skips off-TPU)
test-tpu:
	python -m pytest tests_tpu/ -q

bench:
	python bench.py

# chip microbenchmarks behind the PERF.md tables (long compiles; background)
bench-roofline:
	python benchmarks/roofline.py

bench-samplers:
	python benchmarks/sampler_scale.py --sampler hmc --n 4096 --l 5
	python benchmarks/sampler_scale.py --sampler hmc --n 16384 --l 3 --n-samples 6
	python benchmarks/sampler_scale.py --sampler nuts --n 4096
	python benchmarks/sampler_scale.py --sampler nuts --n 16384 --n-samples 6 --eps 0.01

bench-multioutput:
	python benchmarks/multioutput_scale.py --n 4096 --t 4 --dense-check
	python benchmarks/multioutput_scale.py --n 16384 --t 8

bench-grid:
	python benchmarks/grid_scale.py --n1 4096 --n2 64 --grad

bench-svgp:
	python benchmarks/svgp_scale.py

# north-star-scale accuracy-qualified sampler artifact (PERF.md round 5;
# ~1h on chip — run in background)
bench-ess-16k:
	python benchmarks/sampler_scale.py --sampler hmc --ess --n 16384 \
		--n-chains 4 --n-samples 256 --warmup 256 --l 8 \
		--map hybrid-adam --gradients hybrid --chunk-iters 32

.PHONY: simulated hmc_simulated posterior_predictive fit_temp_gp \
	krig_temperature fit_temp_dlm forecast_temperature_dlm fit_dlm_gp \
	icm_temperature mnist large_n figures site test test-tpu bench bench-roofline \
	bench-samplers bench-multioutput bench-grid bench-svgp bench-ess-16k
