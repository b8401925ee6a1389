from climb_tpu.utils.seed import set_seed
from climb_tpu.utils.vqa_utils import get_score, target_vector, create_vqa_labels
from climb_tpu.utils.word_utils import normalize_word
from climb_tpu.utils.image_utils import resize_image
from climb_tpu.utils.wandb import wandb_logger

__all__ = [
    "set_seed",
    "get_score",
    "target_vector",
    "create_vqa_labels",
    "normalize_word",
    "resize_image",
    "wandb_logger",
]
