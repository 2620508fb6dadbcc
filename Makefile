# Make targets mirroring the reference's Makefile tiers (SURVEY.md section 4).
CHAIN_ID ?= 534352
export CHAIN_ID

.PHONY: test test-ccc test-mock-prove test-chunk-prove test-batch-prove \
        test-bundle-prove test-e2e-prove test-slow native bench fmt clean release

native:
	$(MAKE) -C scroll_prover_tpu/native

# fast unit tier (reference `make test`)
test:
	python -m pytest tests/ -q -x

# capacity-checker tier (reference test-ccc)
test-ccc:
	python -m pytest tests/test_witness_ccc.py -q

# MockProver constraint tier (reference test-mock-prove)
test-mock-prove:
	python -m pytest tests/test_super_circuit.py -q

# real-proving tiers (slow; mirror chunk/batch/bundle/e2e test targets).
# The chunk ladder's verifier-circuit layers prove at k~20: run these on
# the TPU (they are CPU-hostile by design — reference real-prove tiers are
# similarly "not in CI; need SRS files + hours of CPU", SURVEY.md section 4)
test-chunk-prove:
	SPT_E2E=1 python -m pytest tests/test_aggregation.py::test_full_ladder_e2e -q

test-batch-prove:
	SPT_E2E=1 python -m pytest tests/test_aggregation.py::test_full_ladder_e2e -q -k e2e

test-bundle-prove:
	SPT_E2E=1 python -m pytest tests/test_aggregation.py -q -k "e2e or bundle_partitions"

test-e2e-prove: test-bundle-prove

# slow verification tiers that do run on CPU
test-slow:
	python -m pytest tests/ -q -m slow

bench:
	python bench.py

# golden release artifacts (reference release.sh flow)
release:
	python scripts/make_release.py

clean:
	$(MAKE) -C scroll_prover_tpu/native clean
	rm -rf .jax_cache .pytest_cache outputs
