from socialways_tpu.data.scale import Scale
from socialways_tpu.data.parsers import (
    BIWIParser,
    SDDParser,
    SeyfriedParser,
    TrajnetParser,
)
from socialways_tpu.data.windowing import create_dataset
from socialways_tpu.data.forecast import forecast_windows
from socialways_tpu.data.toy import create_toy_samples, make_toy_npz_arrays
from socialways_tpu.data.dataset import TrajectoryDataset, load_npz_dataset

__all__ = [
    "Scale",
    "BIWIParser",
    "SDDParser",
    "SeyfriedParser",
    "TrajnetParser",
    "create_dataset",
    "forecast_windows",
    "create_toy_samples",
    "make_toy_npz_arrays",
    "TrajectoryDataset",
    "load_npz_dataset",
]
