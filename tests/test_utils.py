"""Utility tests: box drawing, memory stats, profiling helpers."""

import numpy as np

from dinov2_od_tpu.utils.logging import draw_boxes
from dinov2_od_tpu.utils.memory import format_memory_stats, memory_stats
from dinov2_od_tpu.utils.profiling import StepTimer, annotate


def test_draw_boxes_marks_edges():
    img = np.zeros((100, 100, 3), np.float32)
    out = draw_boxes(img, np.array([[0.5, 0.5, 0.4, 0.4]]), color=(1, 0, 0))
    # Box spans x,y in [30, 70]; edges are red, center untouched.
    assert out[30, 50, 0] == 1.0  # top edge
    assert out[70, 50, 0] == 1.0  # bottom edge
    assert out[50, 30, 0] == 1.0  # left edge
    assert out[50, 70, 0] == 1.0  # right edge
    assert out[50, 50, 0] == 0.0  # interior untouched
    assert img[30, 50, 0] == 0.0  # input not mutated


def test_draw_boxes_respects_validity_and_clipping():
    img = np.zeros((50, 50, 3), np.float32)
    boxes = np.array([[0.5, 0.5, 0.2, 0.2], [0.0, 0.0, 2.0, 2.0]])
    out = draw_boxes(img, boxes, valid=np.array([False, True]))
    # First box skipped; second clipped to image bounds without error.
    assert out[24, 24, 0] == 0.0
    assert np.isfinite(out).all()


def test_memory_stats_shape():
    stats = memory_stats()
    assert isinstance(stats, dict)
    s = format_memory_stats()
    assert isinstance(s, str)


def test_step_timer():
    t = StepTimer(window=4)
    assert t.tick() is None
    for _ in range(5):
        dt = t.tick()
        assert dt >= 0
    assert t.mean_sec > 0
    assert t.images_per_sec(8) > 0


def test_annotate_context():
    with annotate("test_region"):
        x = sum(range(10))
    assert x == 45


def test_compilation_cache_writes_entries(tmp_path):
    import jax
    import jax.numpy as jnp

    from dinov2_od_tpu.utils.compile_cache import enable_compilation_cache

    cache_dir = str(tmp_path / "xla_cache")
    enable_compilation_cache(cache_dir)
    try:
        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T) * 3.21

        f(jnp.ones((32, 16), jnp.float32)).block_until_ready()
        import os

        entries = os.listdir(cache_dir)
        assert any("jit_f" in e for e in entries), entries
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
