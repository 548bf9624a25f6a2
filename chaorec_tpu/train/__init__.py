from chaorec_tpu.train.loop import EarlyStopping, Trainer, train_and_evaluate  # noqa: F401
