"""Data layer: numpy/PIL datasets, deterministic distributed sampler, threaded
prefetching loader. Host-side only — device placement + sharding happen in the
training loop (jit in_shardings over the data mesh axis).

Mirrors /root/reference/data/__init__.py's `create_dataset`/`create_dataloader`
string-dispatch API.
"""
from ucdir_tpu.data.loader import create_dataset, create_dataloader, DataLoader
from ucdir_tpu.data.sampler import EnlargedSampler
from ucdir_tpu.data.datasets import (PairDataset, LRHRDataset, SingleDataset,
                                     ImagenetSRDataset, ImagenetJPGDataset,
                                     ImagenetColorDataset)
