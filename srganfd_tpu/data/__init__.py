"""Host-side data pipeline: image datasets, batch assembly, prefetch."""

from srganfd_tpu.data.datasets import (  # noqa: F401
    TrainValidImageDataset,
    TestImageDataset,
    DegeneratedImageDataset,
    PairedImageDataset,
    BatchLoader,
)
