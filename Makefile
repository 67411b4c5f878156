# Dev conveniences (parity with the reference Makefile's tensorboard helper).
LOGDIR ?= runs

.PHONY: test test-all bench train board fixtures

# Fast suite: every correctness gate; excludes the `slow`-marked Pallas
# interpret-mode / long-sequence / end-to-end-duplicate tests. <10 min on a
# multicore host (xdist); ~13 min single-core. First run pays XLA compiles;
# a persistent compile cache (conftest) makes re-runs cheaper.
test:
	python -m pytest tests/ -q -m "not slow" -n auto --dist loadfile

# Full suite including slow tests (CI / pre-release; ~1 h on CPU).
test-all:
	python -m pytest tests/ -q

bench:
	python bench.py

train:
	python -m kvae_tpu.train.loop --config configs/kvae_ball.yaml

# tensorboard on the most recent run (reference Makefile:12-22)
board:
	tensorboard --logdir $(shell ls -td $(LOGDIR)/*/ | head -1)

fixtures:
	python tools/gen_reference_fixtures.py
	python tools/gen_torch_parity_fixture.py
	python tests/test_stability.py regen
