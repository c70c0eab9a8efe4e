"""The pipeline: pull-model element chain, reservoirs, orchestration.

Parity map (SURVEY.md §2.1): elements.py + control.py implement the
element set of OpenHome/Media/Pipeline/; reservoirs.py the bounded
buffers; starvation.py StarvationRamper+FlywheelRamper; supply.py ISupply;
codec_controller.py the codec recognition/decode loop; filler.py the
producer side; animator.py the render boundary; manager.py assembly and
the PipelineManager facade.
"""

from .animator import AnimatorBasic, AnimatorBatch, RenderBatcher
from .manager import (Pipeline, PipelineInitParams, PipelineManager,
                      PipelineState, SupportElements)

__all__ = ["AnimatorBasic", "AnimatorBatch", "RenderBatcher", "Pipeline",
           "PipelineInitParams", "PipelineManager", "PipelineState",
           "SupportElements"]
