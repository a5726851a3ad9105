from .timing import TicToc, StageTimer, trace_annotation, profiler_trace
from .median import StreamingMedian

__all__ = ["TicToc", "StageTimer", "trace_annotation", "profiler_trace", "StreamingMedian"]
