from kvae_tpu.train.state import TrainState, create_train_state  # noqa: F401
