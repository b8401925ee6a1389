"""Model registry: string-keyed, resolved at runtime.

Parity: reference ``src/configs/model_configs.py`` (same keys and values). The
reference embeds live classes/functions in these dicts (``from modeling.vilt
import *`` at ``model_configs.py:1``) creating a configs->modeling import
cycle; here every entry is a string resolved through the registries in
``climb_tpu.models``.
"""

ALLOWED_CL_ENCODERS = ["vilt", "viltbert"]

vilt_config = {
    "encoder_dim": 768,
    "visual_input_type": "pil-image",
    "encoder_class": "vilt",
    "batch2inputs_converter": "vilt_single",
    "encoder_name": "ViLT",
}

vilt_lang_seq_config = {
    "encoder_dim": 768,
    "visual_input_type": "pil-image",
    "encoder_class": "vilt",
    "classifier_class": "vilt_seq_classification",
    "batch2inputs_converter": "vilt_seq",
}

vilt_lang_mc_config = {
    "encoder_dim": 768,
    "visual_input_type": "pil-image",
    "encoder_class": "vilt",
    "classifier_class": "vilt_multiple_choice",
    "batch2inputs_converter": "vilt_mc",
}

vilt_vision_cls_config = {
    "encoder_dim": 768,
    "visual_input_type": "pil-image",
    "encoder_class": "vilt",
    "classifier_class": "vilt_image_classification",
    "batch2inputs_converter": "vilt_single",
}

viltbert_config = {
    "encoder_dim": 768,
    "visual_input_type": "pil-image",
    "encoder_class": "viltbert",
    "batch2inputs_converter": "vilt_single",
    "encoder_name": "ViLT-BERT",
}

viltbert_lang_seq_config = {
    "encoder_dim": 768,
    "visual_input_type": "pil-image",
    "encoder_class": "viltbert",
    "classifier_class": "viltbert_seq_classification",
    "batch2inputs_converter": "vilt_seq",
}

viltbert_lang_mc_config = {
    "encoder_dim": 768,
    "visual_input_type": "pil-image",
    "encoder_class": "viltbert",
    "classifier_class": "viltbert_multiple_choice",
    "batch2inputs_converter": "vilt_mc",
}

model_configs = {
    "vilt": vilt_config,
    "vilt-v-cls": vilt_vision_cls_config,
    "vilt-l-seq": vilt_lang_seq_config,
    "vilt-l-mc": vilt_lang_mc_config,
    "viltbert": viltbert_config,
    "viltbert-l-seq": viltbert_lang_seq_config,
    "viltbert-l-mc": viltbert_lang_mc_config,
}
