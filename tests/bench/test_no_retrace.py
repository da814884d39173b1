"""Benchmark smoke (SURVEY.md §4): the pipeline must run compiled — one
trace per shape bucket, no per-frame retraces — without asserting absolute
throughput numbers in CI."""

import numpy as np

from vidmat.api import MattingSession
from vidmat.io.fixtures import synthetic_frames_only


def test_session_step_compiles_once():
    sess = MattingSession(64, 80)
    for f in synthetic_frames_only(64, 80, 6):
        sess.step(f)
    # jax caches one executable per (shape, dtype) signature; a growing
    # cache across same-shape frames means per-frame retracing.
    assert sess._stepper._step._cache_size() == 1


def test_pipeline_compiles_once_per_bucket():
    from vidmat.pipeline.video import VideoPipeline

    pipe = VideoPipeline(downsample_ratio=1.0)
    pipe.run(list(synthetic_frames_only(64, 80, 5)))
    # within a run there must be exactly one compilation — probed via a
    # fresh session on identical shapes.
    sess = MattingSession(64, 80)
    a1 = [sess.step(f)[0] for f in synthetic_frames_only(64, 80, 3)]
    n_compiles = sess._stepper._step._cache_size()
    a2 = [sess.step(f)[0] for f in synthetic_frames_only(64, 80, 3)]
    assert sess._stepper._step._cache_size() == n_compiles == 1
    assert len(a1) == len(a2) == 3


def test_pipeline_run_reuses_compiled_step_across_calls():
    """A second run() on the same shape bucket must perform ZERO new
    compilations (VERDICT r1 item 8: the step cache keys on
    (bucket, ratio, need_fgr))."""
    from vidmat.pipeline.video import VideoPipeline

    pipe = VideoPipeline(downsample_ratio=1.0)
    pipe.run(list(synthetic_frames_only(64, 80, 3)))
    (step1, _, _), = pipe._step_cache.values()
    n1 = step1._cache_size()
    out = pipe.run(list(synthetic_frames_only(64, 80, 3, seed=7)))
    # same step object, same executable cache size: nothing retraced,
    # and the recurrent state was rebuilt (fresh video, not a carry-over).
    assert len(pipe._step_cache) == 1
    (step2, _, _), = pipe._step_cache.values()
    assert step2 is step1
    assert step2._cache_size() == n1 == 1
    assert out["frames"] == 3
