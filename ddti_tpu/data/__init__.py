from .augment import AugmentConfig, augment_batch, eval_preprocess, mixup  # noqa: F401
from .dataset import (  # noqa: F401
    DeviceDataSource,
    HostBatchIterator,
    MedicalDataset,
    decode_to_store,
    decode_to_store_files,
    synthetic_source,
)
from .synthetic import generate_ddti_like, write_synthetic_dataset  # noqa: F401
