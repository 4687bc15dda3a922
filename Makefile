# Developer entry points (the reference Makefile's test_unit /
# test_regression / typecheck / coverage role, reference Makefile:204-364,
# minus docker/k8s which are out of scope here).

.PHONY: test test_single test_quick test_regression typecheck bench dryrun long_run docs_check

test:            ## full suite, per-batch pytest processes (~60 min; the
	## single-process whole-suite run segfaults XLA's CPU backend_compile
	## ~60% through on this 1-core host — docs/testing.md has the analysis)
	python scripts/run_suite.py

test_single:     ## legacy single-process run (NOT the gate: XLA CPU
	## backend_compile segfaults after a few hundred compiles; kept for
	## debugging single files)
	python -m pytest tests/ -q

test_quick:      ## skip the jit-heavy dycore/runtime suites
	python -m pytest tests/ -q --ignore=tests/test_dycore.py \
	  --ignore=tests/test_runtime.py --ignore=tests/test_segmented_run.py \
	  --ignore=tests/test_nonhydro.py

test_regression: ## golden/regression-marked tests only
	python -m pytest tests/ -q -m regression

typecheck:       ## static analysis: AST checker (undefined names, call arity, dup defs) + import smoke
	python tools/staticcheck.py fv3net_tpu __graft_entry__.py bench.py tools
	python -c "import compileall, sys; sys.exit(0 if compileall.compile_dir('fv3net_tpu', quiet=1) else 1)"
	python -c "import fv3net_tpu, fv3net_tpu.fit, fv3net_tpu.runtime, fv3net_tpu.dycore, fv3net_tpu.diagnostics, fv3net_tpu.pipelines, fv3net_tpu.workflows"

lint:            ## typecheck plus unused-import detection
	python tools/staticcheck.py --strict fv3net_tpu __graft_entry__.py bench.py tools

bench:           ## headline benchmark (one JSON line; runs on the TPU)
	python bench.py

dryrun:          ## multi-chip sharding compile check on 8 virtual devices
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun OK')"

long_run:        ## 2-day stability soak at C12
	python scripts/long_run.py 2 12 12

docs_check:      ## docs pages reference only files that exist
	python scripts/check_docs_links.py
