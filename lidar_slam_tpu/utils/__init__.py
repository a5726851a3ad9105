from .timing import TicToc, StageTimer, trace_annotation, profiler_trace
from .median import StreamingMedian
from .compile_cache import enable_persistent_cache

__all__ = [
    "TicToc",
    "StageTimer",
    "trace_annotation",
    "profiler_trace",
    "StreamingMedian",
    "enable_persistent_cache",
]
