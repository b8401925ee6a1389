from climb_tpu.data.visionlanguage.datasets import (
    VQADataset,
    NLVR2Dataset,
    SnliVEDataset,
    VCRDataset,
    build_vl_datasets,
)

__all__ = [
    "VQADataset",
    "NLVR2Dataset",
    "SnliVEDataset",
    "VCRDataset",
    "build_vl_datasets",
]
