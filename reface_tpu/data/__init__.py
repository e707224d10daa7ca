from reface_tpu.data.celeba import CelebAHQConfig, CelebAHQDataset
from reface_tpu.data.ffhq import FFHQConfig, FFHQDataset
from reface_tpu.data.test_bench import TestBenchConfig, TestBenchDataset
from reface_tpu.data.loader import PrefetchLoader, collate

__all__ = [
    "CelebAHQConfig",
    "CelebAHQDataset",
    "FFHQConfig",
    "FFHQDataset",
    "TestBenchConfig",
    "TestBenchDataset",
    "PrefetchLoader",
    "collate",
]
