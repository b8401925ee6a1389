from climb_tpu.data.language.text_processors import (
    DataProcessor,
    HellaSwagProcessor,
    PIQAProcessor,
    CommonsenseQAProcessor,
    COSMOSQAProcessor,
    IMDBProcessor,
    GLUEProcessor,
    PROCESSOR_MAP,
    split_train_dev,
)
from climb_tpu.data.language.text_dataset import LanguageDataset, build_language_dataset

__all__ = [
    "DataProcessor",
    "HellaSwagProcessor",
    "PIQAProcessor",
    "CommonsenseQAProcessor",
    "COSMOSQAProcessor",
    "IMDBProcessor",
    "GLUEProcessor",
    "PROCESSOR_MAP",
    "split_train_dev",
    "LanguageDataset",
    "build_language_dataset",
]
