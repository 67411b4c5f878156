from kvae_tpu.data.bouncing_ball import generate_bouncing_ball  # noqa: F401
from kvae_tpu.data.loader import DataLoader, build_dataloaders  # noqa: F401
from kvae_tpu.data.masks import (  # noqa: F401
    make_training_mask,
    mask_impute_planning,
    mask_impute_random,
)
from kvae_tpu.data.npz_dataset import NPZVideoDataset  # noqa: F401
