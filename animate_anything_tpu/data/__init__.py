from animate_anything_tpu.data.datasets import (
    CachedDataset,
    FolderDataset,
    ImageDataset,
    SingleVideoDataset,
    VideoBlipDataset,
    VideoJsonDataset,
    extend_datasets,
    get_train_dataset,
)
from animate_anything_tpu.data.loader import DataLoader, device_prefetch
from animate_anything_tpu.data.bucketing import sensible_buckets

__all__ = [
    "CachedDataset",
    "FolderDataset",
    "ImageDataset",
    "SingleVideoDataset",
    "VideoBlipDataset",
    "VideoJsonDataset",
    "extend_datasets",
    "get_train_dataset",
    "DataLoader",
    "device_prefetch",
    "sensible_buckets",
]
