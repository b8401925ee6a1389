"""User-facing input processor: raw (texts, images) -> model batch.

Parity: the reference's ``ViltEncoderWrapper.process_inputs``
(src/modeling/vilt.py:83-96 — ViltProcessor called inside every forward) and
the ``convert_*_to_vilt_input_dict`` batch converters (vilt.py:548-567).
Here processing is explicit and ahead-of-time: call once per batch on the
host (or let the datasets do it AOT); the returned dict feeds the jitted
forward directly.

The converter registry resolves the string keys in
``climb_tpu.configs.model_configs`` (``batch2inputs_converter``).
"""

from typing import List, Optional, Sequence, Tuple

import numpy as np

from climb_tpu.data.image_pipeline import process_image
from climb_tpu.data.tokenization import load_tokenizer


class ViltInputProcessor:
    """Tokenize + canvas-process raw inputs into the fixed-shape batch schema."""

    def __init__(
        self,
        tokenizer=None,
        max_text_len: int = 40,
        canvas_hw: Tuple[int, int] = (384, 640),
        patch_size: int = 32,
    ):
        self.tokenizer = tokenizer or load_tokenizer()
        self.max_text_len = max_text_len
        self.canvas_hw = canvas_hw
        self.patch_size = patch_size

    def process_images(self, images: Sequence) -> Tuple[np.ndarray, np.ndarray]:
        canvases, phws = [], []
        for img in images:
            c, phw = process_image(img, self.canvas_hw, self.patch_size)
            canvases.append(c)
            phws.append(phw)
        return np.stack(canvases), np.asarray(phws, np.int32)

    def __call__(
        self,
        texts: Sequence[str],
        images: Sequence,
        text_pairs: Optional[Sequence[str]] = None,
    ) -> dict:
        """Single-image batch: texts[i] (+optional pair) with images[i].

        `images` may also be a list of [imgA, imgB] pairs (NLVR2 schema) —
        detected by list/tuple elements.
        """
        ids, mask, types = self.tokenizer.batch_encode(texts, self.max_text_len, text_pairs)
        batch = {"input_ids": ids, "text_mask": mask, "token_type_ids": types}
        if images is not None and len(images):
            if isinstance(images[0], (list, tuple)):  # image pairs
                flat, phws = [], []
                for pair in images:
                    cs, ps = self.process_images(pair)
                    flat.append(cs)
                    phws.append(ps)
                batch["pixel_values"] = np.stack(flat)
                batch["patch_hw"] = np.stack(phws)
            else:
                pv, phw = self.process_images(images)
                batch["pixel_values"] = pv
                batch["patch_hw"] = phw
        return batch

    def multi_choice(self, choice_texts: List[List[str]], images: Sequence) -> dict:
        """Multi-choice batch: choice_texts[i] = the texts for sample i."""
        nc = len(choice_texts[0])
        encs = [
            [self.tokenizer.encode(t, self.max_text_len) for t in sample]
            for sample in choice_texts
        ]
        ids = np.stack([[e[0] for e in s] for s in encs])
        mask = np.stack([[e[1] for e in s] for s in encs])
        types = np.stack([[e[2] for e in s] for s in encs])
        batch = {"input_ids": ids, "text_mask": mask, "token_type_ids": types}
        if images is not None and len(images):
            pv, phw = self.process_images(images)
            batch["pixel_values"] = pv
            batch["patch_hw"] = phw
        return batch


# --- batch converters (reference vilt.py:548-567 equivalents) ---------------

def convert_batch_single(processor: ViltInputProcessor, batch: dict) -> dict:
    """raw_texts + images -> model inputs (convert_batch_to_vilt_input_dict)."""
    return processor(batch["raw_texts"], batch["images"])


def convert_batch_seq(processor: ViltInputProcessor, batch, mean_image) -> dict:
    """(texts, labels) + shared mean image (convert_seq_batch_to_vilt_input_dict):
    the single processed canvas broadcasts across the batch in the model."""
    texts = list(batch[0])
    out = processor(texts, None)
    pv, phw = processor.process_images([mean_image])
    out["pixel_values"] = pv
    out["patch_hw"] = phw
    return out


def convert_batch_mc(processor: ViltInputProcessor, batch, mean_image) -> dict:
    """(texts_a, texts_b_choices, labels) + mean image
    (convert_mc_batch_to_vilt_input_dict): pair-encode text_a with each
    choice."""
    texts_a, texts_b = batch[0], batch[1]
    choice_texts = [[(a, b) for b in blist] for a, blist in zip(texts_a, texts_b)]
    encs = [
        [processor.tokenizer.encode(a, processor.max_text_len, text_pair=b) for a, b in sample]
        for sample in choice_texts
    ]
    ids = np.stack([[e[0] for e in s] for s in encs])
    mask = np.stack([[e[1] for e in s] for s in encs])
    types = np.stack([[e[2] for e in s] for s in encs])
    pv, phw = processor.process_images([mean_image])
    return {
        "input_ids": ids, "text_mask": mask, "token_type_ids": types,
        "pixel_values": pv, "patch_hw": phw,
    }


CONVERTER_REGISTRY = {
    "vilt_single": convert_batch_single,
    "vilt_seq": convert_batch_seq,
    "vilt_mc": convert_batch_mc,
}


def get_batch_converter(key: str):
    return CONVERTER_REGISTRY[key]
