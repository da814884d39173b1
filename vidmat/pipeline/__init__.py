from vidmat.pipeline.stepper import ImageStepper, VideoStepper  # noqa: F401
