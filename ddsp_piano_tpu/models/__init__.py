"""Model layer: sub-modules, Parallelizer, PianoModel, losses, DAGs."""

from ddsp_piano_tpu.models.piano_model import PianoModel  # noqa: F401
from ddsp_piano_tpu.models.dag import (  # noqa: F401
    VectorizedPolyphonicProcessorGroup,
    polyphonic_dag,
)
from ddsp_piano_tpu.models import losses  # noqa: F401
from ddsp_piano_tpu.models import sub_modules  # noqa: F401
from ddsp_piano_tpu.models.sub_modules import Parallelizer  # noqa: F401
