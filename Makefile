# Dev conveniences (parity with the reference Makefile's tensorboard helper).
LOGDIR ?= runs

.PHONY: test test-all bench train board fixtures

# Fast suite (<10 min): every correctness gate; excludes the `slow`-marked
# Pallas interpret-mode / long-sequence tests.
test:
	python -m pytest tests/ -q -m "not slow"

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
