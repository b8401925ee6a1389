"""Unit tests for pure utility functions (scores, normalization, resize math)."""

import numpy as np

from climb_tpu.utils.image_utils import compute_resized_dims
from climb_tpu.utils.vqa_utils import get_score, target_vector
from climb_tpu.utils.word_utils import normalize_word


def test_get_score_schedule():
    assert get_score(0) == 0.0
    assert get_score(1) == 0.3
    assert get_score(2) == 0.6
    assert get_score(3) == 0.9
    assert get_score(4) == 1.0
    assert get_score(10) == 1.0


def test_target_vector():
    t = target_vector(10, [2, 5], [0.3, 1.0])
    assert t.shape == (10,)
    assert t[2] == np.float32(0.3)
    assert t[5] == 1.0
    assert t.sum() == np.float32(1.3)
    assert target_vector(4, [], []).sum() == 0.0


def test_normalize_word():
    assert normalize_word("The cat") == "cat"
    assert normalize_word("two") == "2"
    assert normalize_word("dont") == "don't"
    assert normalize_word("yes!") == "yes"
    assert normalize_word("1,000") == "1000"
    assert normalize_word("a one") == "1"


def test_resize_dims_landscape():
    # 800x600 into (384, 640) canvas: w>=640 -> h' = 600*640/800 = 480 > 384
    # -> resize by height: (800*384/600, 384) = (512, 384)
    assert compute_resized_dims(800, 600, 640, 384) == (512, 384)
    # wide: 1280x400 -> h' = 400*640/1280 = 200 <= 384 -> (640, 200)
    assert compute_resized_dims(1280, 400, 640, 384) == (640, 200)
    # small landscape stays
    assert compute_resized_dims(300, 200, 640, 384) == (300, 200)


def test_resize_dims_portrait():
    # Portrait uses a transposed (384 wide, 640 tall) target per the
    # reference; 600x800 -> width-limited to (384, 800*384/600) = (384, 512).
    w, h = compute_resized_dims(600, 800, 640, 384)
    assert (w, h) == (384, 512)


def test_cpu_gets_no_persistent_compilation_cache():
    """CPU processes must NOT persist XLA compilation-cache entries: XLA:CPU
    entries are AOT machine code and go stale when the executing CPU stops
    matching the compiling one — observed to abort inside pxla __call__ even
    WITHIN one boot (cloud VMs migrate across physical hosts), defeating
    per-microarch and per-boot namespacing. TPU programs (the expensive
    tunnel compiles) keep the persistent cache."""
    import jax

    from climb_tpu.cli.common import enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        # conftest forces the CPU platform via jax.config, so the persistent
        # cache must be disabled regardless of the requested directory.
        enable_compilation_cache("/tmp/climb_cache_ns_test")
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
