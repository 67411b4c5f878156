# Dev conveniences (parity with the reference Makefile's tensorboard helper).
LOGDIR ?= runs

.PHONY: test bench train board fixtures

test:
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
