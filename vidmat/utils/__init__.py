from vidmat.utils.metrics import mad, sad  # noqa: F401
