from chaorec_tpu.data.loading import RecDataset, data_load, DATASET_STATS  # noqa: F401
from chaorec_tpu.data.sampling import sample_negatives, make_epoch_batches  # noqa: F401
