from .split import (
    create_split,
    get_or_create_split,
    create_paired_split_for_vae,
    get_3d_only_split,
    verify_split_consistency,
    load_split,
    save_split,
)
from .dataset import (
    MicroFlowDataset,
    MicroFlowDatasetVAE,
    MicroFlowDatasetVAEPaired,
    DatasetTransform,
    BlindDataset,
    get_loader,
)
