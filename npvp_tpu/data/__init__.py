from npvp_tpu.data.loader import BatchLoader, DataModule
from npvp_tpu.data.smmnist import StochasticMovingMNIST
from npvp_tpu.data.transforms import DATASET_STATS, build_transforms
