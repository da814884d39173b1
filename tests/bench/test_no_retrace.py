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
    # second run, same bucket: the driver builds a fresh jitted step per
    # run() today (documented), but within a run there must be exactly one
    # compilation — probed via a fresh session on identical shapes.
    sess = MattingSession(64, 80)
    a1 = [sess.step(f)[0] for f in synthetic_frames_only(64, 80, 3)]
    n_compiles = sess._stepper._step._cache_size()
    a2 = [sess.step(f)[0] for f in synthetic_frames_only(64, 80, 3)]
    assert sess._stepper._step._cache_size() == n_compiles == 1
    assert len(a1) == len(a2) == 3
