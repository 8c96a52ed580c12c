"""Training runtime: trainer, checkpoints, summaries."""

from ddsp_piano_tpu.training import checkpoints  # noqa: F401
